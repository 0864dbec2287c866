"""Streaming TTS engine: slot-batched continuous AR decode on TPU.

Capability parity: replaces the reference's ``HelloSippyRTPipe`` +
``InfernTTSWorker`` pair (``HelloSippyTTSRT/HelloSippyRTPipe.py:81-259``,
``Cluster/InfernTTSWorker.py:83-92``): batched autoregressive mel decode with
per-session termination inside a live batch, postnet + vocoder + chunk
smoother per emission, per-session sample-offset dispatch and ``None`` EOS.

TPU-first design (SURVEY.md section 7):

- **Slots, not queues.**  A fixed ``[B]``-slot state pytree lives on device;
  sessions join by writing their encoder K/V + speaker embedding into a free
  slot (one jitted ``join`` call) and leave by flag -- the running decode jit
  never re-compiles.  This implements the batch-merge the reference left
  unfinished (dead re-pad code, ``HelloSippyRTPipe.py:122-135``).
- **Fixed emission schedule.**  Chunks of 8/16/32 mel frames (each frame =
  16 ms at 16 kHz) follow the reference's adaptive first-chunk schedule
  (``HelloSippyRT.py:67-69``: emit 8, 8, 16, then wider) with one compiled
  program per chunk size -- low first-frame latency, high steady-state
  throughput.
- **One host<->device transfer per tick** per direction: all slots' audio
  comes back in a single ``[B, samples]`` array.
"""

from __future__ import annotations

import dataclasses
import threading
import time
from functools import partial
from typing import Any, Callable, Dict, List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import amendnet as amd
from ..audio import griffinlim as gl
from ..models import hifigan as hfg
from ..models import speecht5 as st5
from ..utils.logging import get_logger
from ..utils.metrics import metrics

log = get_logger("serving.tts")


@dataclasses.dataclass(frozen=True)
class TTSEngineConfig:
    batch_slots: int = 8  # reference TTS batch, Cluster/InfernTTSWorker.py:57
    max_text_tokens: int = 96  # reference splits text to <=128 chars
    max_steps: int = 512  # decoder steps (x reduction_factor mel frames)
    pre_frames: int = 4  # vocoder left-context carry-over (HelloSippyRTPipe.py:230)
    chunk_schedule: Sequence[int] = (8, 8, 16, 32)  # mel frames per emission
    min_steps: int = 4  # no stop before this many decoder steps
    stop_threshold: float = 0.5
    sample_rate: int = 16000
    dtype: Any = jnp.float32
    # async harvest: a dedicated thread fetches + delivers each tick's audio
    # the moment the device finishes it, instead of at the NEXT step's
    # dispatch (the sync one-tick pipeline) -- cuts TTFB by ~one tick while
    # keeping up to ``max_inflight_ticks`` dispatches queued on the device
    async_harvest: bool = False
    max_inflight_ticks: int = 2
    # Pallas fused decoder-step kernel (ops/tts_step.py): one grid step per
    # layer, weights DMA'd once into reused VMEM, cache chunk-streamed with
    # dead chunks skipped.  None = auto (on when running on TPU); the XLA
    # path is the oracle and serves everywhere else.
    fused_step: Optional[bool] = None
    # Per-utterance output loudness normalization (0 = off).  Random-weights
    # plumbing stand-ins synthesize ~3e-5 peak amplitude -- BELOW the G.711
    # mu-law quantization floor (half-step ~1.2e-4), so a PCMU leg carries
    # their reply as exact digital silence (round-5 e2e regression: the
    # codec-negotiation fix moved the fakes from G722, whose ADPCM dithers
    # tiny signals to nonzero codes, onto PCMU).  When >0, the dispatch
    # locks a per-say gain on the first energetic chunk that brings its RMS
    # to this target.  Trained/real checkpoints produce real speech levels
    # and leave this off.
    output_norm_rms: float = 0.0


class TTSState(NamedTuple):
    """Device-resident slot-batched decode state (a donated pytree)."""

    cache: st5.DecoderCache
    enc_mask: jnp.ndarray  # [B, S] bool
    spk: jnp.ndarray  # [B, spk_dim]
    prev_mel: jnp.ndarray  # [B, 1, M] last emitted mel frame (AR input)
    pos: jnp.ndarray  # [B] int32 decoder step per slot
    stopped: jnp.ndarray  # [B] bool stop-token fired
    active: jnp.ndarray  # [B] bool slot occupied
    mel_ctx: jnp.ndarray  # [B, pre_frames, M] raw-mel vocoder context


class _Session:
    __slots__ = ("sid", "slot", "callback", "frames_sent", "chunks_recv",
                 "max_frames", "t_start", "t_first", "cancelled", "paused")

    def __init__(self, sid, slot, callback, max_frames):
        self.sid = sid
        self.slot = slot
        self.callback = callback
        self.frames_sent = 0
        self.chunks_recv = 0
        self.max_frames = max_frames
        self.t_start = time.monotonic()
        self.t_first: Optional[float] = None
        self.cancelled = False
        self.paused = False  # flow control: skip decode while egress is full


class TTSEngine:
    """Host-side scheduler around the jitted decode/vocode programs.

    Not thread-safe by itself; drive from one thread (see
    ``serving.tts_worker``) or an asyncio loop.
    """

    def __init__(self, params: Dict[str, Any], cfg: st5.SpeechT5Config,
                 voc_params: Dict[str, Any], voc_cfg: hfg.HifiGanConfig,
                 ecfg: TTSEngineConfig = TTSEngineConfig(),
                 amd_params: Optional[Dict[str, Any]] = None,
                 rng_seed: int = 0):
        self.cfg = cfg
        self.ecfg = ecfg
        self.voc_cfg = voc_cfg
        self.params = params
        self.voc_params = voc_params
        acfg = amd.AmendNetConfig(
            num_mels=cfg.num_mel_bins,
            frame_size=voc_cfg.total_upsample,
            pre_frames=ecfg.pre_frames // 2,
            post_frames=0,
        )
        self.amd_cfg = acfg
        if amd_params is not None:  # match the engine's activation dtype
            amd_params = jax.tree_util.tree_map(
                lambda x: x.astype(ecfg.dtype), amd_params)
        self.amd_params = amd_params
        B = ecfg.batch_slots
        # serializes engine-state mutation; held by the DRIVER thread for
        # whole ticks.  Submitter-facing paths must never wait on it: a
        # saturated engine holds it near-continuously (threading locks are
        # unfair), which starved actor mailboxes for minutes in the round-4
        # ramp (ltbench level 8: tts_session_say asks timing out behind a
        # busy driver).  Submissions go through ``_sub_lock`` only.
        self._lock = threading.RLock()
        self.state = self._init_state()
        self.sessions: List[Optional[_Session]] = [None] * B
        self._seed = np.uint32(rng_seed)
        self._next_sid = 0
        self._inflight = None  # (audio, valid, stopped) device refs + n_frames
        self._last_dispatch_t: Optional[float] = None
        from collections import deque

        self._sub_lock = threading.Lock()  # guards _pending + _next_sid only
        self._pending = deque()  # sessions waiting for a free slot
        self._async = ecfg.async_harvest
        if self._async:
            import queue as _q

            self._hq: "_q.Queue" = _q.Queue()
            self._sem = threading.Semaphore(ecfg.max_inflight_ticks)
            self._inflight_n = 0
            self._idle_cv = threading.Condition()
            self._hthread = threading.Thread(
                target=self._harvest_loop, daemon=True, name="tts-harvest")
            self._hthread.start()

        # -- compiled programs ------------------------------------------------
        # params flow as jit arguments (closure-captured arrays are baked
        # into executables as constants)
        # batched joins: one dispatch encodes up to 8 texts and writes all
        # their slots -- at production call churn (tens of utterance starts
        # per second) per-join dispatches would otherwise serialize with
        # decode ticks and dominate TTFB on dispatch-latency-bound backends
        self._join_fns = {
            m: jax.jit(partial(self._join_many, m=m), donate_argnums=(1,))
            for m in (1, 2, 4, 8)
        }
        self._leave_fn = jax.jit(self._leave, donate_argnums=(0,))
        # one fused jit per chunk size: AR decode + postnet + vocoder +
        # context carry -- a single device dispatch and a single
        # device->host fetch per tick (the per-call tunnel/PCIe latency
        # dominates otherwise)
        # fused-kernel weights are packed ONCE here: packing inside the
        # jitted step would re-run ~25 MB of concat/transpose/cast every
        # lax.scan iteration (XLA does not hoist it out of the while-loop)
        self._fused_w = None
        if self._use_fused_step():
            from ..ops.tts_step import pack_fused_weights

            self._fused_w = jax.jit(
                lambda p: pack_fused_weights(p, cfg))(params)
        self._step_fns = {
            n: jax.jit(partial(self._step_fused, n_frames=n), donate_argnums=(2,))
            for n in sorted(set(ecfg.chunk_schedule))
        }

    # -- state management -----------------------------------------------------

    def _init_state(self) -> TTSState:
        cfg, ecfg = self.cfg, self.ecfg
        B, M = ecfg.batch_slots, cfg.num_mel_bins
        if self._use_fused_step():
            # time-minor [L,B,H,Dh,Tpad] layout: the only KV layout the
            # Pallas kernel can chunk-DMA (see ops/tts_step.py docstring)
            from ..ops.tts_step import tm_init_cache

            cache = tm_init_cache(cfg, B, ecfg.max_steps,
                                  ecfg.max_text_tokens, dtype=ecfg.dtype)
        else:
            cache = st5.init_cache(cfg, B, ecfg.max_steps,
                                   ecfg.max_text_tokens, dtype=ecfg.dtype)
        return TTSState(
            cache=cache,
            enc_mask=jnp.zeros((B, ecfg.max_text_tokens), bool),
            spk=jnp.zeros((B, cfg.speaker_embedding_dim), ecfg.dtype),
            prev_mel=jnp.zeros((B, 1, M), ecfg.dtype),
            pos=jnp.zeros((B,), jnp.int32),
            stopped=jnp.zeros((B,), bool),
            active=jnp.zeros((B,), bool),
            mel_ctx=jnp.zeros((B, ecfg.pre_frames, M), ecfg.dtype),
        )

    def _join_many(self, params, state: TTSState, slots, input_ids, attn_mask,
                   spk, *, m: int):
        """Encode ``m`` sessions' texts in ONE batch and write their slots.

        slots ``[m]`` int32, input_ids/attn_mask ``[m, S]``, spk ``[m, D]``.
        Padding entries duplicate a real entry (same slot) -- the duplicate
        write is idempotent, so bucketed m keeps shapes static.
        """
        cfg = self.cfg
        spk = spk.astype(self.ecfg.dtype)
        enc = st5.encode_text(params, cfg, input_ids, attn_mask)  # [m,S,D]
        enc = enc.astype(self.ecfg.dtype)
        from ..models import layers as L

        def ckv(_, lp):
            k, v = L.precompute_cross_kv(lp["cross_attn"], enc,
                                         n_heads=cfg.decoder_attention_heads)
            return None, (k, v)

        _, (ck, cv) = jax.lax.scan(ckv, None, params["dec_layers"])
        # ck/cv: [L,m,H,S,Dh]
        if self._use_fused_step():  # time-minor cache: [L,m,H,Dh,Spad]
            S_pad = state.cache.cross_k.shape[4]
            ck = jnp.transpose(ck, (0, 1, 2, 4, 3))
            cv = jnp.transpose(cv, (0, 1, 2, 4, 3))
            pad = S_pad - ck.shape[4]
            if pad:
                ck = jnp.pad(ck, ((0, 0),) * 4 + ((0, pad),))
                cv = jnp.pad(cv, ((0, 0),) * 4 + ((0, pad),))
        zeros_k = jnp.zeros_like(state.cache.self_k[:, 0])
        M = self.cfg.num_mel_bins
        dt = self.ecfg.dtype
        for i in range(m):  # unrolled (m <= 8): slot writes, one per entry
            slot = slots[i]
            cache = state.cache
            dyn = jax.lax.dynamic_update_index_in_dim
            cache = cache._replace(
                cross_k=dyn(cache.cross_k, ck[:, i], slot, 1),
                cross_v=dyn(cache.cross_v, cv[:, i], slot, 1),
                self_k=dyn(cache.self_k, zeros_k, slot, 1),
                self_v=dyn(cache.self_v, zeros_k, slot, 1),
            )
            upd = lambda buf, val: dyn(buf, val, slot, 0)
            state = state._replace(
                cache=cache,
                enc_mask=upd(state.enc_mask, attn_mask[i].astype(bool)),
                spk=upd(state.spk, spk[i]),
                prev_mel=upd(state.prev_mel, jnp.zeros((1, M), dt)),
                pos=upd(state.pos, jnp.int32(0)),
                stopped=upd(state.stopped, False),
                active=upd(state.active, True),
                mel_ctx=upd(state.mel_ctx,
                            jnp.zeros((self.ecfg.pre_frames, M), dt)),
            )
        return state

    def _leave(self, state: TTSState, slot):
        upd = lambda buf, val: jax.lax.dynamic_update_index_in_dim(buf, val, slot, 0)
        return state._replace(active=upd(state.active, False),
                              stopped=upd(state.stopped, False))

    # -- decode ---------------------------------------------------------------

    def _use_fused_step(self) -> bool:
        q = self.params["dec_layers"]["self_attn"]["q"]
        if "w" not in q and "w_q" not in q:
            return False  # decoder layout the kernel doesn't know
        if self.ecfg.fused_step is not None:
            return self.ecfg.fused_step
        # default ON on TPU: the packed-QKV kernel with in-kernel cache
        # writes measured 1.75 ms/AR-step at B=24 full dims vs 6.7 ms for
        # the XLA oracle (3.8x device throughput; ops/tts_step.py).  On
        # CPU the kernel only runs in (slow) interpret mode -- keep the
        # XLA oracle there unless explicitly requested (tests opt in).
        try:
            return jax.devices()[0].platform == "tpu"
        except RuntimeError:
            return False

    def _decode_chunk(self, params, fused_w, state: TTSState, rng, paused, *,
                      n_frames: int):
        """Run ``n_frames // r`` AR steps for all slots (jitted, donated).

        ``paused``: [B] bool -- flow-controlled slots keep their AR state
        (prev_mel, pos, mel_ctx) frozen and emit no valid frames this tick;
        cache writes at their (unadvanced) pos are overwritten by the real
        step on resume, so pausing is state-transparent.
        """
        cfg, ecfg = self.cfg, self.ecfg
        r = cfg.reduction_factor
        n_steps = n_frames // r

        def step(carry, _):
            state, rng = carry
            rng, sub = jax.random.split(rng)
            x = st5.decoder_prenet(
                params, cfg, state.prev_mel, state.spk,
                step_offset=state.pos, dropout_rng=sub,
            )
            if self._use_fused_step():
                from ..ops.tts_step import fused_decode_step

                h, cache = fused_decode_step(params, cfg, x, state.cache,
                                             state.pos,
                                             enc_mask=state.enc_mask,
                                             time_minor=True,
                                             packed=fused_w)
            else:
                h, cache = st5.decode_step(params, cfg, x, state.cache,
                                           state.pos,
                                           enc_mask=state.enc_mask)
            mel, logits = st5.feat_and_prob(params, cfg, h)  # [B,r,M],[B,r]
            run = jnp.logical_and(state.active, jnp.logical_not(state.stopped))
            run = jnp.logical_and(run, jnp.logical_not(paused))
            stop_now = jnp.any(jax.nn.sigmoid(logits) > ecfg.stop_threshold, axis=-1)
            stop_now = jnp.logical_and(stop_now, state.pos >= ecfg.min_steps)
            stop_now = jnp.logical_and(stop_now, run)  # paused logits are stale
            stopped = jnp.logical_or(state.stopped, stop_now)
            new_pos = jnp.where(run, state.pos + 1, state.pos)
            state = state._replace(
                cache=cache,
                prev_mel=jnp.where(run[:, None, None], mel[:, -1:, :],
                                   state.prev_mel),
                pos=new_pos,
                stopped=stopped,
            )
            return (state, rng), (mel, run)

        (state, _), (mels, run_flags) = jax.lax.scan(
            step, (state, rng), None, length=n_steps
        )
        # mels: [n_steps, B, r, M] -> [B, n_frames, M]; run_flags: [n_steps, B]
        mels = mels.transpose(1, 0, 2, 3).reshape(-1, n_frames, cfg.num_mel_bins)
        frame_valid = jnp.repeat(run_flags.T, r, axis=1)  # [B, n_frames]
        return state, mels, frame_valid

    def _step_fused(self, params, fused_w, state: TTSState, seed, paused, *,
                    n_frames: int):
        """Fused tick: decode chunk + vocode + state carry (jitted, donated).

        ``seed``: host uint32 scalar; the PRNG key derives inside the program
        so a tick costs exactly ONE dispatch (per-call tunnel/PCIe latency
        dominates the 20 ms compute otherwise)."""
        rng = jax.random.PRNGKey(seed)
        state, mels, frame_valid = self._decode_chunk(params, fused_w, state,
                                                      rng, paused,
                                                      n_frames=n_frames)
        audio, new_ctx = self._vocode(params, state.mel_ctx, mels,
                                      n_frames=n_frames)
        ran_any = jnp.any(frame_valid, axis=1)  # paused/idle slots keep ctx
        new_ctx = jnp.where(ran_any[:, None, None], new_ctx, state.mel_ctx)
        state = state._replace(mel_ctx=new_ctx)
        # NOTE: do not return state.stopped here -- it would alias the donated
        # state buffer and die when the next tick is dispatched before this
        # tick's harvest (the one-tick pipeline).  Session end is derived
        # host-side from frame_valid instead.
        return state, audio, frame_valid

    def _vocode(self, params, state_mel_ctx, mels, *, n_frames: int):
        """Postnet + vocoder + smoother over chunk with left context (jitted)."""
        cfg, ecfg = self.cfg, self.ecfg
        pre = ecfg.pre_frames
        full = jnp.concatenate([state_mel_ctx, mels], axis=1)  # [B, pre+C, M]
        refined = st5.postnet(params, cfg, full)
        if isinstance(self.voc_cfg, gl.GriffinLimConfig):
            audio = gl.apply(self.voc_params, self.voc_cfg, refined)
        else:
            audio = hfg.apply(self.voc_params, self.voc_cfg, refined)
        fs = self.voc_cfg.total_upsample
        if self.amd_params is not None:
            acfg = dataclasses.replace(
                self.amd_cfg, chunk_frames=n_frames,
                pre_frames=pre, post_frames=0,
            )
            chunk_audio = amd.apply(self.amd_params, acfg, refined, audio)
        else:
            chunk_audio = audio[:, pre * fs :]
        new_ctx = full[:, -pre:, :]
        return chunk_audio, new_ctx

    # -- public API -----------------------------------------------------------

    def warmup(self) -> None:
        """Compile every join bucket + decode/vocode chunk size up front."""
        for m in (1, 2, 4, 8):
            if m > self.ecfg.batch_slots:
                break
            done = []
            for _ in range(m):
                self.start_session(
                    np.zeros(4, np.int32),
                    np.zeros(self.cfg.speaker_embedding_dim, np.float32),
                    lambda a: done.append(a is None),
                    max_frames=sum(self.ecfg.chunk_schedule),
                )
            while self.step():
                pass

    def close(self) -> None:
        """Stop the async harvest thread (no-op in sync mode)."""
        if self._async:
            self._hq.put(None)
            self._hthread.join(timeout=2.0)

    def free_slots(self) -> List[int]:
        return [i for i, s in enumerate(self.sessions) if s is None]

    def start_session(self, input_ids: np.ndarray, speaker_emb: np.ndarray,
                      callback: Callable[[Optional[np.ndarray]], None],
                      max_frames: Optional[int] = None) -> int:
        """Join a session into a free slot.  Returns session id.

        ``callback(audio_chunk | None)``: float32 mono at ``sample_rate``;
        ``None`` marks end-of-stream (reference EOS protocol,
        ``HelloSippyRTPipe.py:252-255``).

        Joins are deferred to the next ``step()`` and batched (up to 8
        encodes per dispatch) -- at call-churn rates per-join dispatches
        would serialize with decode ticks and dominate TTFB.

        Never touches the engine-state lock: callers (actor mailboxes, and
        say-chain callbacks running on the driver thread itself) must not
        queue behind a busy driver.
        """
        with self._sub_lock:
            sid = self._next_sid
            self._next_sid += 1
            self._pending.append((sid, input_ids, speaker_emb, callback,
                                  max_frames, time.monotonic()))
            return sid

    def _flush_joins_locked(self) -> None:
        """Join as many queued sessions as free slots allow, in one
        bucketed-batch dispatch (padding duplicates the last entry)."""
        free = self.free_slots()
        with self._sub_lock:
            n = min(len(self._pending), len(free), 8)
            if n == 0:
                return
            entries = [self._pending.popleft() for _ in range(n)]
        S = self.ecfg.max_text_tokens
        # per-item isolation (reference OOM->per-item retry,
        # Cluster/InfernSTTWorker.py:66-72): a poisoned request (bad
        # ids/speaker shape) gets EOS alone instead of crashing the step
        # and killing every concurrent session
        ok_entries = []
        for entry in entries:
            sid, input_ids, speaker_emb, callback, max_frames, t_enq = entry
            try:
                ia = np.asarray(input_ids, np.int32).reshape(-1)[: 1 << 20]
                sa = np.asarray(speaker_emb, np.float32).reshape(-1)
                if sa.shape[0] != self.cfg.speaker_embedding_dim:
                    raise ValueError(
                        f"speaker dim {sa.shape[0]} != "
                        f"{self.cfg.speaker_embedding_dim}")
                ok_entries.append((sid, ia, sa, callback, max_frames, t_enq))
            except Exception:
                log.exception("tts join: quarantining poisoned session "
                              "sid=%s", sid)
                metrics.inc("tts.poisoned_sessions")
                try:
                    callback(None)
                except Exception:
                    log.exception("tts poison EOS callback failed")
        entries = ok_entries
        n = len(entries)
        if n == 0:
            return
        m = 1
        while m < n:
            m *= 2
        ids = np.zeros((m, S), np.int32)
        mask = np.zeros((m, S), np.int32)
        spk = np.zeros((m, self.cfg.speaker_embedding_dim), np.float32)
        slots = np.zeros((m,), np.int32)
        now = time.monotonic()
        for i in range(m):
            sid, input_ids, speaker_emb, callback, max_frames, t_enq = \
                entries[min(i, n - 1)]  # padding duplicates the last entry
            k = min(len(input_ids), S)
            ids[i, :k] = input_ids[:k]
            mask[i, :k] = 1
            spk[i] = speaker_emb
            slots[i] = free[min(i, n - 1)]
        self.state = self._join_fns[m](
            self.params, self.state, jnp.asarray(slots), jnp.asarray(ids),
            jnp.asarray(mask), jnp.asarray(spk))
        for i in range(n):
            sid, input_ids, speaker_emb, callback, max_frames, t_enq = entries[i]
            metrics.observe("tts.queue_wait", now - t_enq)
            self.sessions[free[i]] = _Session(
                sid, free[i], callback,
                max_frames or (self.ecfg.max_steps * self.cfg.reduction_factor))

    def abort_all(self, reason: str = "engine failure") -> None:
        """Supervision hook: flush EOS to every live and queued session and
        reset engine state so the next call starts clean.  Callers are never
        stranded (SURVEY section 5.3 -- the reference has no restart path;
        a dead worker silently strands its sessions)."""
        with self._lock:
            victims = [s for s in self.sessions if s is not None]
            with self._sub_lock:
                pend = list(self._pending)
                self._pending.clear()
            self.sessions = [None] * self.ecfg.batch_slots
            self._inflight = None
            self._last_dispatch_t = None
            self.state = self._init_state()
        log.warning("tts engine abort (%s): EOS to %d live + %d queued",
                    reason, len(victims), len(pend))
        for s in victims:
            try:
                s.callback(None)
            except Exception:
                log.exception("tts abort EOS callback failed (sid=%s)", s.sid)
        for item in pend:
            try:
                item[3](None)
            except Exception:
                log.exception("tts abort EOS callback failed (queued sid=%s)",
                              item[0])

    def cancel_session(self, sid: int) -> None:
        """Barge-in: stop generating for this session (slot mask, no recompile;
        reference does this with a Python flag, ``Cluster/TTSSession.py:62-68``).

        Lock-free flag set on the live path (a single attribute store; the
        worst race is one extra tick of audio the harvest then drops), so a
        busy driver can never block a barge-in."""
        for s in list(self.sessions):
            if s is not None and s.sid == sid:
                s.cancelled = True
                return
        with self._sub_lock:
            for item in list(self._pending):
                if item[0] == sid:
                    self._pending.remove(item)
                    item[3](None)  # EOS to the queued session's callback
                    return

    def pause_session(self, sid: int) -> None:
        """Flow control: skip this session's decode until resumed (its slot
        state freezes; used when the downstream egress buffer is full).
        Note ``step()`` keeps returning True while paused sessions exist --
        drivers that spin ``while step()`` must resume or cancel them."""
        self._set_paused(sid, True)

    def resume_session(self, sid: int) -> None:
        self._set_paused(sid, False)

    def _set_paused(self, sid: int, value: bool) -> None:
        # lock-free flag flip (same rationale as cancel_session): flow
        # control must not queue behind the driver it is throttling
        for s in list(self.sessions):
            if s is not None and s.sid == sid:
                s.paused = value
                return

    @property
    def n_active(self) -> int:
        return sum(1 for s in self.sessions if s is not None)

    def step(self) -> bool:
        """Run one emission for all live sessions; dispatch audio chunks.

        Returns True if any session is still active.
        """
        if not self._async:
            with self._lock:
                return self._step_locked()
        # async mode: bounded dispatch pipeline + harvest thread.  Acquire
        # the inflight budget OUTSIDE the lock (the harvest thread needs the
        # lock to release it).
        acquired = self._sem.acquire(timeout=1.0)
        if not acquired:
            # pipeline full for a whole second (slow fetch): do NOT dispatch
            # past the inflight budget; in-flight ticks imply pending work
            return True
        item = None
        try:
            with self._lock:
                item = self._dispatch_locked()
        finally:
            if item is None:
                self._sem.release()
        if item is None:
            # nothing runnable: wait for in-flight ticks to drain so EOS
            # callbacks land before we report idle
            with self._idle_cv:
                self._idle_cv.wait_for(lambda: self._inflight_n == 0,
                                       timeout=1.0)
            with self._lock:
                return self.n_active > 0 or len(self._pending) > 0
        with self._idle_cv:
            self._inflight_n += 1
        self._hq.put(item)
        return True

    def _harvest_loop(self) -> None:
        while True:
            item = self._hq.get()
            if item is None:
                return
            bufs, n_frames, snapshot, paused = item
            try:
                bufs_np = jax.device_get(bufs)  # blocking fetch, lock-free
                with self._lock:
                    self._harvest(bufs_np, n_frames, snapshot, paused)
            except Exception:
                log.exception("tts harvest failed")
            self._sem.release()
            with self._idle_cv:
                self._inflight_n -= 1
                self._idle_cv.notify_all()

    def _step_locked(self) -> bool:
        item = self._dispatch_locked()
        if item is None:
            # drain the pipelined tick so the last sessions complete
            if self._inflight is not None:
                self._harvest(*self._inflight)
                self._inflight = None
            return self.n_active > 0 or len(self._pending) > 0
        # one-tick software pipeline: dispatch tick N, then harvest tick N-1
        # while the device computes -- the blocking fetch hides under this
        # tick's compute, so steady-state step time ~= device time
        prev = self._inflight
        self._inflight = item
        if prev is not None:
            self._harvest(*prev)
        return True

    def _dispatch_locked(self):
        """Dispatch one tick; returns (bufs, n_frames, snapshot, paused) or
        None when no session is runnable."""
        self._flush_joins_locked()
        runnable = [s for s in self.sessions if s is not None and not s.paused]
        if not runnable:
            return None
        # pick chunk size from the schedule position of the *youngest*
        # running session (keeps first-frame latency low when a new session
        # joins; reference adaptive oschedule, HelloSippyRT.py:67-69)
        sched = self.ecfg.chunk_schedule
        youngest = min(s.chunks_recv for s in runnable)
        n_frames = sched[min(youngest, len(sched) - 1)]

        paused = np.array([s is not None and s.paused for s in self.sessions])
        self._seed = np.uint32(self._seed + 1)
        self.state, audio, frame_valid = self._step_fns[n_frames](
            self.params, self._fused_w, self.state, self._seed,
            jnp.asarray(paused))
        # tick cadence: inter-dispatch interval ~= device step time when the
        # pipeline is saturated (dispatch itself returns immediately)
        now = time.monotonic()
        if self._last_dispatch_t is not None:
            metrics.observe("tts.tick_s", now - self._last_dispatch_t)
        self._last_dispatch_t = now
        return ((audio, frame_valid), n_frames, list(self.sessions), paused)

    def _harvest(self, bufs, n_frames, snapshot, paused_at_dispatch=None) -> None:
        """Deliver one tick's results to the sessions that were live at its
        dispatch (slots may have been re-assigned since)."""
        audio_np, valid_np = jax.device_get(bufs)
        audio_np = np.asarray(audio_np, np.float32)
        fs = self.voc_cfg.total_upsample
        for slot, sess in enumerate(snapshot):
            if sess is None or self.sessions[slot] is not sess:
                continue
            if paused_at_dispatch is not None and paused_at_dispatch[slot] \
                    and not sess.cancelled:
                continue  # flow-controlled: no frames, not an EOS
            if sess.cancelled:
                sess.callback(None)
                self.sessions[slot] = None
                self.state = self._leave_fn(self.state, jnp.int32(slot))
                continue
            nvalid = min(int(valid_np[slot].sum()),
                         sess.max_frames - sess.frames_sent)
            sess.chunks_recv += 1
            if nvalid > 0:
                if sess.t_first is None:
                    sess.t_first = time.monotonic()
                    metrics.observe("tts.ttfb", sess.t_first - sess.t_start)
                sess.callback(audio_np[slot, : nvalid * fs])
                sess.frames_sent += nvalid
                metrics.inc("tts.audio_samples", nvalid * fs)
            over = sess.frames_sent >= sess.max_frames
            raw_valid = int(valid_np[slot].sum())
            # stop fired mid-chunk (or slot idle): the run flags are monotone,
            # so a partially-valid chunk means the stop token hit this tick
            if raw_valid < n_frames or over:
                metrics.observe("tts.session_s", time.monotonic() - sess.t_start)
                sess.callback(None)
                self.sessions[slot] = None
                self.state = self._leave_fn(self.state, jnp.int32(slot))
        # queued sessions join in a batched dispatch at the next step
        metrics.set("tts.active_slots", self.n_active)
