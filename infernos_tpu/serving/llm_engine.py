"""LLM serving engine: continuous-batched decode with sentence streaming.

Capability parity: replaces the reference's ``InfernLLMWorker`` +
``ResultsStreamer`` (``Cluster/InfernLLMWorker.py``): chat-template prompts
(``:103-119``), streamed generation with **sentence-boundary flush** on
``. ? ! \\n`` with a minimum length (``:15-61``) so downstream TTS starts
speaking mid-generation, and warm-up support
(``Cluster/InfernLLMActor.py:30-40``).

TPU-first design: instead of lockstep ``generate()`` over a padded batch,
decode is slot-batched with per-slot positions (continuous batching): new
requests prefill in a bucketed program and join the running decode batch;
finished slots free immediately.  For the 14B model the engine accepts
TP-sharded params (``models.qwen.param_shardings``) -- the decode-step jit
runs SPMD over the ``tp`` axis with XLA-inserted all-reduces on ICI.
"""

from __future__ import annotations

import dataclasses
import threading
import time
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import qwen
from ..utils.logging import get_logger
from ..utils.metrics import metrics

log = get_logger("serving.llm")

SENTENCE_CHARS = ".?!\n"  # reference flush set, InfernLLMWorker.py:17
MIN_SENTENCE_CHARS = 10


@dataclasses.dataclass(frozen=True)
class LLMEngineConfig:
    batch_slots: int = 8  # reference batch, Cluster/InfernLLMWorker.py
    prompt_buckets: Sequence[int] = (128, 256, 512, 1024)
    max_total_tokens: int = 2048
    max_new_tokens: int = 1024
    dtype: Any = jnp.float32
    # decode steps per device dispatch (lax.scan over the in-device AR
    # loop): amortizes host dispatch latency K-fold; sentence streaming
    # granularity becomes K tokens, invisible behind the >=10-char flush
    steps_per_dispatch: int = 4
    # speculative decode (n-gram self-drafting / prompt-lookup): each
    # dispatch verifies spec_k-1 drafted tokens in ONE pass
    # (qwen.verify_steps) and emits 1..spec_k tokens.  Decode is
    # weight-bandwidth bound, so accepted tokens are nearly free; with no
    # usable draft the engine still advances one token per dispatch.
    # Replaces steps_per_dispatch when enabled.
    spec_decode: bool = False
    spec_k: int = 8          # tokens per verify pass (draft = spec_k - 1)
    # lax.scan unroll for the decode layer loop; 0 = full unroll
    # (static weight slices, no slice-copy -- PERF.md round 4)
    decode_unroll: int = 1
    spec_ngram: int = 3      # longest suffix n-gram to match for drafting
    # decode dispatches kept in flight before the oldest is harvested.
    # 1 = classic one-step software pipeline (harvest N-1 after
    # dispatching N).  Deeper pipelines hide the host->device fetch RTT
    # (large over the axon tunnel) at the cost of EOS detection lagging
    # max_inflight*K tokens (bounded junk decode on finished slots; the
    # cache scatter clamps, harvest caps emission -- outputs unchanged).
    # Ignored in spec mode, which must harvest before drafting.
    max_inflight: int = 1


@dataclasses.dataclass
class LLMRequest:
    """One generation request over a full chat context."""

    prompt_ids: np.ndarray  # already-templated token ids
    sentence_cb: Callable[[str, bool], None]  # (text, is_final)
    max_new_tokens: Optional[int] = None
    stime: float = dataclasses.field(default_factory=time.monotonic)


class _SentenceStreamer:
    """Incremental detokenize + flush on sentence boundaries (>= min chars)."""

    def __init__(self, detokenize: Callable[[List[int]], str],
                 cb: Callable[[str, bool], None]):
        self.detok = detokenize
        self.cb = cb
        self.tokens: List[int] = []
        self.flushed_chars = 0

    def push(self, tok: int) -> None:
        self.tokens.append(tok)
        text = self.detok(self.tokens)
        pending = text[self.flushed_chars:]
        cut = -1
        for i in range(len(pending) - 1, -1, -1):
            if pending[i] in SENTENCE_CHARS and i + 1 >= MIN_SENTENCE_CHARS:
                cut = i
                break
        if cut >= 0:
            out = pending[: cut + 1].strip()
            if out:
                self.cb(out, False)
            self.flushed_chars += cut + 1

    def finish(self) -> None:
        text = self.detok(self.tokens)
        rest = text[self.flushed_chars:].strip()
        self.cb(rest, True)


class _Slot:
    __slots__ = ("req", "streamer", "new_tokens", "prompt_len")

    def __init__(self, req, streamer, prompt_len):
        self.req = req
        self.streamer = streamer
        self.new_tokens = 0
        self.prompt_len = prompt_len


class LLMEngine:
    def __init__(self, params: Dict[str, Any], cfg: qwen.QwenConfig,
                 ecfg: LLMEngineConfig = LLMEngineConfig(),
                 detokenize: Optional[Callable[[List[int]], str]] = None,
                 eos_ids: Optional[Sequence[int]] = None,
                 mesh=None):
        """``mesh``: a ``jax.sharding.Mesh`` with a ``tp`` axis for tensor
        parallelism (the 14B model over a v5e-4's ICI).  ``params`` must
        already be placed with ``qwen.param_shardings``; the engine shards
        its KV cache over the kv-head axis (``qwen.cache_shardings``) so
        decode attention is fully local per chip, with XLA inserting one
        all-reduce per attention/MLP block."""
        self.params = params
        self.cfg = cfg
        self.ecfg = ecfg
        self.detokenize = detokenize or (lambda toks: " ".join(map(str, toks)) + " ")
        self.eos_ids = set(eos_ids or [cfg.eos_token_id])
        B = ecfg.batch_slots
        self.cache = qwen.init_cache(cfg, B, ecfg.max_total_tokens, dtype=ecfg.dtype)
        if mesh is not None:
            from jax.sharding import NamedSharding

            cs = qwen.cache_shardings(cfg)
            self.cache = qwen.QwenCache(
                jax.device_put(self.cache.k, NamedSharding(mesh, cs.k)),
                jax.device_put(self.cache.v, NamedSharding(mesh, cs.v)),
            )
        self.pos = jnp.zeros((B,), jnp.int32)
        self.cur_tok = jnp.zeros((B,), jnp.int32)
        self.done = jnp.ones((B,), bool)
        self.slots: List[Optional[_Slot]] = [None] * B
        # engine-state lock: held by the DRIVER thread for whole steps.
        # Submitter paths must never wait on it (unfair locks starve actor
        # mailboxes behind a saturated driver -- round-4 ramp wedge); they
        # go through _sub_lock only.
        self._lock = threading.RLock()
        from collections import deque

        # pipelined (bufs, slot-snapshot) pairs not yet harvested, oldest
        # first; at most ecfg.max_inflight entries after each step()
        self._inflight = deque()
        self._sub_lock = threading.Lock()  # guards _pending only
        self._pending = deque()  # requests waiting to join (driver flushes)

        # params flow as jit ARGUMENTS (not closure captures): captured
        # concrete arrays are baked into each executable as constants --
        # fatal at 14B scale -- and explicit args keep TP shardings visible
        self._prefill_fns = {
            n: jax.jit(partial(self._prefill_bucket, n_tokens=n))
            for n in ecfg.prompt_buckets
        }
        self._join_fn = jax.jit(self._join, donate_argnums=(1,))
        self._step_fn = jax.jit(self._step, donate_argnums=(1,))
        self._verify_fn = jax.jit(self._verify, donate_argnums=(1,))

    # -- jitted programs ------------------------------------------------------

    def _prefill_bucket(self, params, tokens, prompt_len, *, n_tokens: int):
        logits, ks, vs = qwen.prefill(params, self.cfg, tokens)
        # argmax reduces on device: the host fetches one scalar, not a
        # [vocab]-sized logits row
        first_tok = jnp.argmax(logits[0, prompt_len - 1]).astype(jnp.int32)
        return first_tok, ks.astype(self.ecfg.dtype), vs.astype(self.ecfg.dtype)

    def _join(self, params, cache, pos, cur_tok, done, slot, ks, vs, prompt_len, first_tok):
        P = ks.shape[3]
        pad = self.ecfg.max_total_tokens - P
        sk = jnp.pad(ks[:, 0], ((0, 0), (0, 0), (0, pad), (0, 0)))
        sv = jnp.pad(vs[:, 0], ((0, 0), (0, 0), (0, pad), (0, 0)))
        cache = qwen.QwenCache(
            jax.lax.dynamic_update_index_in_dim(cache.k, sk, slot, 1),
            jax.lax.dynamic_update_index_in_dim(cache.v, sv, slot, 1),
        )
        pos = jax.lax.dynamic_update_index_in_dim(pos, prompt_len, slot, 0)
        cur_tok = jax.lax.dynamic_update_index_in_dim(cur_tok, first_tok, slot, 0)
        done = jax.lax.dynamic_update_index_in_dim(done, False, slot, 0)
        return cache, pos, cur_tok, done

    def _step(self, params, cache, pos, cur_tok, done):
        """K greedy steps in one dispatch; returns per-step tokens [B, K]."""
        eos = jnp.asarray(sorted(self.eos_ids), jnp.int32)
        K = self.ecfg.steps_per_dispatch
        Tmax = cache.k.shape[3]
        pos0 = pos
        ring_k, ring_v = qwen.init_ring(self.cfg, pos.shape[0], K,
                                        cache.k.dtype)

        def one(carry, step_i):
            ring_k, ring_v, pos, cur_tok, done = carry
            # big cache loop-invariant; new K/V go to the ring (uniform
            # index -> in-place) and merge once after the scan, avoiding
            # the per-step full-cache scatter copy (qwen.decode_step_ring)
            logits, ring_k, ring_v = qwen.decode_step_ring(
                params, self.cfg, cur_tok, cache, ring_k, ring_v, pos0,
                pos, step_i,
                unroll=self.ecfg.decode_unroll or self.cfg.num_layers)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            # freeze a slot in-device once it emits EOS inside this window
            # (host-side finish still owns slot lifecycle)
            is_eos = jnp.any(nxt[:, None] == eos[None, :], axis=-1)
            new_done = jnp.logical_or(done, is_eos)
            wpos = jnp.where(done, Tmax, pos)  # done-at-entry: drop column
            pos = jnp.where(done, pos, pos + 1)
            cur_tok = jnp.where(new_done, cur_tok, nxt)
            return (ring_k, ring_v, pos, cur_tok, new_done), (nxt, wpos)

        (ring_k, ring_v, pos, cur_tok, _), (nxts, wposs) = jax.lax.scan(
            one, (ring_k, ring_v, pos, cur_tok, done), jnp.arange(K))
        cache = qwen.merge_ring(cache, ring_k, ring_v, wposs.T)
        return cache, pos, cur_tok, nxts.T

    def _verify(self, params, cache, pos, cur_tok, done, draft):
        """One speculative verify dispatch: draft [B, K-1] candidate
        continuations after cur_tok.  Returns (cache, pos, cur_tok,
        pred [B, K], n_emit [B]): ``pred[i, :n_emit[i]]`` are this slot's
        newly decoded tokens (accepted draft prefix + one correction)."""
        B = cur_tok.shape[0]
        tokens_in = jnp.concatenate([cur_tok[:, None], draft], axis=1)
        logits, cache = qwen.verify_steps(params, self.cfg, tokens_in,
                                          cache, pos)
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, K]
        matches = (pred[:, :-1] == draft).astype(jnp.int32)
        a = jnp.cumprod(matches, axis=1).sum(axis=1)  # leading matches
        n_emit = jnp.where(done, 0, a + 1)
        pos = pos + n_emit
        new_cur = pred[jnp.arange(B), a]
        cur_tok = jnp.where(done, cur_tok, new_cur)
        return cache, pos, cur_tok, pred, n_emit

    # -- speculative drafting -------------------------------------------------

    def _ngram_draft(self, s) -> np.ndarray:
        """Prompt-lookup drafting over the slot's OWN generated tokens: the
        longest (<= spec_ngram) suffix that re-occurred earlier predicts the
        tokens that followed it; falls back to repeating the last token."""
        K1 = self.ecfg.spec_k - 1
        hist = s.streamer.tokens
        draft = np.zeros(K1, np.int32)
        if not hist:
            return draft
        draft[:] = hist[-1]
        for n in range(min(self.ecfg.spec_ngram, len(hist) - 1), 0, -1):
            suffix = hist[-n:]
            for idx in range(len(hist) - n - 1, -1, -1):
                if hist[idx:idx + n] == suffix:
                    cont = hist[idx + n: idx + n + K1]
                    if cont:
                        draft[: len(cont)] = cont
                        return draft
                    break
            else:
                continue
            break
        return draft

    # -- public API -----------------------------------------------------------

    def free_slots(self) -> List[int]:
        return [i for i, s in enumerate(self.slots) if s is None]

    @property
    def n_active(self) -> int:
        return sum(1 for s in self.slots if s is not None)

    def warmup(self) -> None:
        """Compile all bucket programs + the step (reference warm-up trick,
        ``Cluster/InfernLLMActor.py:30-40``)."""
        for n in self.ecfg.prompt_buckets:
            self._prefill_fns[n](self.params, jnp.zeros((1, n), jnp.int32),
                                 jnp.int32(1))
        # the step donates the cache: reassign state (all slots are done, so
        # pos/cur_tok stay put)
        if self.ecfg.spec_decode:
            (self.cache, self.pos, self.cur_tok, _, _) = self._verify_fn(
                self.params, self.cache, self.pos, self.cur_tok, self.done,
                jnp.zeros((self.ecfg.batch_slots, self.ecfg.spec_k - 1),
                          jnp.int32))
        else:
            (self.cache, self.pos, self.cur_tok, _) = self._step_fn(
                self.params, self.cache, self.pos, self.cur_tok, self.done)
        # force a host round-trip: on remote-compile backends (axon) the
        # first EXECUTION of a cache-loaded executable can stall for
        # minutes on server-side program load, and block_until_ready on
        # the outputs does NOT flush it -- a small fetch does.  Absorb it
        # here so the first live request never pays it (measured: 72-422 s
        # landing inside the first submit without this).
        _ = jax.device_get(self.pos)

    def abort_all(self, reason: str = "engine failure") -> None:
        """Supervision hook: flush a final (possibly partial) result to every
        live and queued request and reset slot state, so callers waiting on
        a final sentence are never stranded."""
        with self._lock:
            victims = [s for s in self.slots if s is not None]
            with self._sub_lock:
                pend = list(self._pending)
                self._pending.clear()
            self.slots = [None] * self.ecfg.batch_slots
            self._inflight.clear()
            self.done = jnp.ones_like(self.done)
        log.warning("llm engine abort (%s): flushing %d live + %d queued",
                    reason, len(victims), len(pend))
        for s in victims:
            try:
                s.streamer.finish()  # emits whatever was generated, final=True
            except Exception:
                log.exception("llm abort flush failed")
        for req in pend:
            try:
                req.sentence_cb("", True)
            except Exception:
                log.exception("llm abort flush failed (queued)")

    def submit(self, req: LLMRequest) -> int:
        """Queue one request; the DRIVER thread prefills + joins it at its
        next step.  Returns -1 (queued).  Never touches the engine-state
        lock: prefill is a device dispatch plus a blocking fetch, and doing
        it on the caller's thread behind an unfair lock starves actor
        mailboxes whenever the driver is saturated (round-4 ramp wedge)."""
        with self._sub_lock:
            self._pending.append(req)
        return -1

    def _flush_pending_locked(self, max_joins: int = 4) -> None:
        """Join queued requests into free slots (driver thread, under _lock);
        capped per step so prefills interleave with decode dispatches."""
        joined = 0
        while joined < max_joins and self.free_slots():
            with self._sub_lock:
                if not self._pending:
                    return
                req = self._pending.popleft()
            # per-item isolation: a poisoned request finishes alone (empty
            # stream) instead of crashing the step for every slot
            # (reference per-item retry, Cluster/InfernSTTWorker.py:66-72)
            try:
                self._submit_locked(req)
                joined += 1
            except Exception:
                log.exception("llm: quarantining poisoned queued request")
                metrics.inc("llm.poisoned_requests")
                try:
                    _SentenceStreamer(self.detokenize, req.sentence_cb).finish()
                except Exception:
                    log.exception("llm poison EOS callback failed")

    def _submit_locked(self, req: LLMRequest) -> int:
        free = self.free_slots()
        slot = free[0]
        ids = np.asarray(req.prompt_ids, np.int32)
        bucket = next((b for b in self.ecfg.prompt_buckets if len(ids) <= b),
                      self.ecfg.prompt_buckets[-1])
        ids = ids[-bucket:]
        plen = len(ids)
        padded = np.zeros((1, bucket), np.int32)
        padded[0, :plen] = ids
        first_tok_d, ks, vs = self._prefill_fns[bucket](
            self.params, jnp.asarray(padded), jnp.int32(plen))
        first_tok = int(jax.device_get(first_tok_d))
        (self.cache, self.pos, self.cur_tok, self.done) = self._join_fn(
            self.params, self.cache, self.pos, self.cur_tok, self.done,
            jnp.int32(slot), ks, vs, jnp.int32(plen), jnp.int32(first_tok))
        streamer = _SentenceStreamer(self.detokenize, req.sentence_cb)
        s = _Slot(req, streamer, plen)
        self.slots[slot] = s
        if first_tok in self.eos_ids:
            self._finish(slot, s)
        else:
            streamer.push(first_tok)
            s.new_tokens = 1
        return slot

    def step(self) -> bool:
        with self._lock:
            return self._step_locked()

    def _step_locked(self) -> bool:
        self._flush_pending_locked()
        if self.n_active == 0:
            if self._inflight:
                self._harvest(*self._inflight.popleft())
                # keep the driver hot while trailing in-flight dispatches
                # remain, or their harvests become poll-gated (~100 ms tail
                # each, ADVICE r4)
                return (self.n_active > 0 or bool(self._inflight)
                        or bool(self._pending))
            return bool(self._pending)
        if self.ecfg.spec_decode:
            # harvest the in-flight dispatches FIRST: drafts built from
            # streamer tokens that lag the device by one dispatch never
            # end at the device's actual cur_tok, so acceptance collapses
            # to ~0 (ADVICE r3).  Spec mode trades the one-step pipeline
            # overlap for drafts anchored at the true suffix.
            while self._inflight:
                self._harvest(*self._inflight.popleft())
            if self.n_active == 0:
                return bool(self._pending)
            draft = np.zeros((self.ecfg.batch_slots, self.ecfg.spec_k - 1),
                             np.int32)
            for i, s in enumerate(self.slots):
                if s is not None:
                    draft[i] = self._ngram_draft(s)
            (self.cache, self.pos, self.cur_tok, pred, n_emit) = \
                self._verify_fn(self.params, self.cache, self.pos,
                                self.cur_tok, self.done, jnp.asarray(draft))
            bufs = (pred, n_emit)
        else:
            (self.cache, self.pos, self.cur_tok, nxt) = self._step_fn(
                self.params, self.cache, self.pos, self.cur_tok, self.done)
            bufs = nxt
        # software pipeline: dispatch N, harvest N-max_inflight while the
        # device computes (AR feedback is in-device; the fetch is
        # bookkeeping only).  Depth 1 = the classic one-step overlap.
        self._inflight.append((bufs, list(self.slots)))
        while len(self._inflight) > max(1, self.ecfg.max_inflight):
            self._harvest(*self._inflight.popleft())
        return True

    def _harvest(self, bufs, snapshot) -> None:
        if self.ecfg.spec_decode:
            pred_np, nemit_np = jax.device_get(bufs)  # [B, K], [B]
        else:
            pred_np = jax.device_get(bufs)  # [B, K]
            nemit_np = None
        K = pred_np.shape[1]
        for i, s in enumerate(snapshot):
            if s is None or self.slots[i] is not s:
                continue
            limit = s.req.max_new_tokens or self.ecfg.max_new_tokens
            budget = self.ecfg.max_total_tokens - s.prompt_len - 1
            cap = min(limit, budget)
            n_take = K if nemit_np is None else int(nemit_np[i])
            if nemit_np is not None:
                metrics.observe("llm.spec_emit", float(n_take))
            fin = False
            for k in range(n_take):
                tok = int(pred_np[i, k])
                if tok in self.eos_ids or s.new_tokens >= cap:
                    fin = True
                    break
                s.streamer.push(tok)
                s.new_tokens += 1
            if fin:
                self._finish(i, s)
        # EOS detection is host-side only, so device ``done`` is exactly
        # slot emptiness.  Deriving it from occupancy (instead of the
        # pre-_finish flags) keeps a request that _finish->_submit_locked
        # just joined into a freed slot alive.
        self.done = jnp.asarray([s is None for s in self.slots])

    def _finish(self, slot: int, s: _Slot) -> None:
        self.slots[slot] = None
        # backfill the freed slot immediately (driver thread, one join)
        self._flush_pending_locked(max_joins=1)
        metrics.observe("llm.gen_time", time.monotonic() - s.req.stime)
        metrics.inc("llm.tokens", s.new_tokens)
        s.streamer.finish()


# -- chat templating -----------------------------------------------------------

IM_START, IM_END = "<|im_start|>", "<|im_end|>"


def apply_chat_template(messages: List[Dict[str, str]],
                        add_generation_prompt: bool = True) -> str:
    """Qwen ChatML string template (tokenizer-agnostic)."""
    out = []
    for m in messages:
        out.append(f"{IM_START}{m['role']}\n{m['content']}{IM_END}\n")
    if add_generation_prompt:
        out.append(f"{IM_START}assistant\n")
    return "".join(out)
