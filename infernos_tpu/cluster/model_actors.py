"""Model-serving actors: TTS, STT, LLM.

Capability parity with the reference's per-model Ray actors:

- :class:`TTSActor` <-> ``Cluster/InfernTTSActor.py``: ``start(lang,
  output_sr)``, session CRUD, ``tts_session_say`` / ``stop_saying``,
  ``get_rand_voice_id`` (``:21-52``);
- :class:`STTActor` <-> ``Cluster/InfernSTTActor.py``: session CRUD +
  ``stt_session_soundin`` (``:38-53``);
- :class:`LLMActor` <-> ``Cluster/InfernLLMActor.py``: warm-up on start
  (``:30-40``), session CRUD, ``llm_session_textin`` /
  ``llm_session_context_add`` (``:45-67``).

Each actor owns one slot-batched engine plus its driver thread; the actor
mailbox serializes session bookkeeping while the engine free-runs.
"""

from __future__ import annotations

import dataclasses
import uuid as uuid_mod
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..models import hifigan as hfg
from ..models import presets
from ..models import qwen
from ..models import speecht5 as st5
from ..models import whisper as wsp
from ..models.tokenizers import ByteTokenizer, CharTokenizer
from ..serving.driver import EngineDriver
from ..serving.llm_engine import LLMEngine, LLMEngineConfig
from ..serving.sessions import (
    LLMSession,
    STTSession,
    TTSRequest,
    TTSSession,
)
from ..serving.speakers import SpeakerBank
from ..serving.stt_engine import STTEngine, STTEngineConfig
from ..serving.tts_engine import TTSEngine, TTSEngineConfig
from ..utils.logging import get_logger
from .actors import Actor

log = get_logger("cluster.models")


def _serving_dtype():
    """bf16 on TPU for full-dims engines (weights 2x smaller, MXU-native);
    f32 elsewhere (CPU tests want exact golden numerics)."""
    import jax as _jax

    try:
        return jnp.bfloat16 if _jax.devices()[0].platform == "tpu" else jnp.float32
    except RuntimeError:
        return jnp.float32


def _cast_params(params, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if hasattr(x, "astype")
        and jnp.issubdtype(x.dtype, jnp.floating) else x, params)


def _zeros_init(init_fn, dtype):
    """Full-dims engines without a checkpoint initialize to zeros: weight
    VALUES are irrelevant until real checkpoints are ported (PERF.md), and
    zero-init allocates in milliseconds where full random init compiles an
    RNG graph for minutes (same trick as bench.py)."""
    shapes = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    return jax.jit(lambda: jax.tree_util.tree_map(
        lambda sd: jnp.zeros(sd.shape, dtype if jnp.issubdtype(sd.dtype, jnp.floating) else sd.dtype),
        shapes))()


class TTSActor(Actor):
    def __init__(self, tiny: bool = True, seed: int = 0,
                 ecfg: Optional[TTSEngineConfig] = None,
                 params=None, voc_params=None):
        self.tiny = tiny
        self.seed = seed
        self.ecfg = ecfg
        self._params = params
        self._voc_params = voc_params
        self.sessions: Dict[uuid_mod.UUID, TTSSession] = {}
        self.engine: Optional[TTSEngine] = None
        self.driver: Optional[EngineDriver] = None

    def start(self, lang: str = "en", output_sr: int = 16000) -> None:
        import os as _os2

        if _os2.environ.get("INFERNOS_MODEL_MODE") == "tiny-real":
            from ..models import tiny_real

            if tiny_real.have_tiny_tts():
                return self._start_tiny_real(lang)
            log.warning("INFERNOS_MODEL_MODE=tiny-real but no trained tiny "
                        "TTS checkpoint; falling back")
        cfg = presets.SPEECHT5_TINY if self.tiny else presets.SPEECHT5_FULL
        voc = presets.HIFIGAN_TINY if self.tiny else presets.HIFIGAN_FULL
        k1, k2 = jax.random.split(jax.random.PRNGKey(self.seed))
        dtype = jnp.float32 if self.tiny else _serving_dtype()
        if self.tiny:
            params = self._params or st5.init_params(k1, cfg)
            voc_params = self._voc_params or hfg.init_params(k2, voc)
        else:
            params = (_cast_params(self._params, dtype) if self._params is not None
                      else _zeros_init(lambda k: st5.init_params(k, cfg), dtype))
            voc_params = (_cast_params(self._voc_params, dtype)
                          if self._voc_params is not None
                          else _zeros_init(lambda k: hfg.init_params(k, voc), dtype))
        import os as _os

        ecfg = self.ecfg or TTSEngineConfig(
            # INFERNOS_TTS_SLOTS: call-ramp benches widen slots (24 measured
            # best at 32-frame ticks, PERF.md round 2); 8 is the reference's
            # worker batch (Cluster/InfernTTSWorker.py:57)
            batch_slots=4 if self.tiny else int(
                _os.environ.get("INFERNOS_TTS_SLOTS", "8")),
            max_text_tokens=32 if self.tiny else 96,
            max_steps=64 if self.tiny else 512,
            stop_threshold=2.0,  # random weights never emit a stop token
            dtype=dtype,
            # random/zeros weights synthesize ~3e-5 peak -- below the G.711
            # mu-law floor, i.e. digital silence on a PCMU leg.  Normalize
            # the plumbing stand-in to real speech loudness (only when no
            # externally trained params were provided).
            output_norm_rms=0.05 if self._params is None else 0.0,
        )
        self.lang = lang
        self.tokenizer = CharTokenizer()
        self.bank = SpeakerBank.synthetic(dim=cfg.speaker_embedding_dim)
        # chunk-boundary smoother: in-repo trained declicker when available
        # (full-dims engines only; its conditioning is 80-mel x 256-sample
        # frames, the reference post-vocoder geometry)
        amd_params = None
        if not self.tiny:
            from ..models import amendnet as amd

            amd_params = amd.load_pretrained()
        self.engine = TTSEngine(params, cfg, voc_params, voc, ecfg,
                                amd_params=amd_params)
        self.engine.warmup()
        self.driver = EngineDriver(self.engine, name="tts")
        self.driver.start()
        log.info("TTSActor started (lang=%s tiny=%s)", lang, self.tiny)

    def _start_tiny_real(self, lang: str) -> None:
        """Serve the in-repo-trained tiny SpeechT5+HiFi-GAN pair: real
        stop tokens, real speech (VERDICT r2 item 2)."""
        from ..models import tiny_real

        params, cfg, voc_params, vcfg, tok, table = tiny_real.load_tiny_tts()
        ecfg = self.ecfg or TTSEngineConfig(
            batch_slots=8, max_text_tokens=48, max_steps=170,
            stop_threshold=0.5,  # trained stop tokens actually fire
            dtype=jnp.float32,
        )
        self.lang = lang
        self.tokenizer = tok
        self.bank = SpeakerBank(table)
        self.engine = TTSEngine(params, cfg, voc_params, vcfg, ecfg)
        self.engine.warmup()
        self.driver = EngineDriver(self.engine, name="tts")
        self.driver.start()
        log.info("TTSActor started (lang=%s tiny-real trained pair)", lang)

    def on_stop(self) -> None:
        if self.driver:
            self.driver.stop(join=False)

    # -- session API ----------------------------------------------------------
    def new_tts_session(self) -> uuid_mod.UUID:
        sess = TTSSession(self.engine, tokenize=self.tokenizer,
                          speaker_bank=self.bank)
        self.sessions[sess.id] = sess
        return sess.id

    def tts_session_start(self, sess_id: uuid_mod.UUID, soundout: Callable) -> None:
        self.sessions[sess_id].start(soundout)

    def tts_session_say(self, sess_id: uuid_mod.UUID, req: TTSRequest):
        say_id = self.sessions[sess_id].say(req)
        self.driver.kick()
        return say_id

    def tts_session_stop_saying(self, sess_id: uuid_mod.UUID, say_id) -> bool:
        return self.sessions[sess_id].stop_saying(say_id)

    def tts_session_end(self, sess_id: uuid_mod.UUID) -> None:
        sess = self.sessions.pop(sess_id, None)
        if sess is not None:
            sess.end()

    def get_rand_voice_id(self) -> int:
        return self.bank.rand_id()


class STTActor(Actor):
    def __init__(self, tiny: bool = True, seed: int = 0,
                 ecfg: Optional[STTEngineConfig] = None, params=None):
        self.tiny = tiny
        self.seed = seed
        self.ecfg = ecfg
        self._params = params
        self.sessions: Dict[uuid_mod.UUID, STTSession] = {}
        self.engine: Optional[STTEngine] = None
        self.driver: Optional[EngineDriver] = None

    def start(self) -> None:
        import os

        if os.environ.get("INFERNOS_MODEL_MODE") == "tiny-real":
            from ..models import tiny_real

            if tiny_real.have_tiny_stt():
                return self._start_tiny_real()
            log.warning("INFERNOS_MODEL_MODE=tiny-real but no trained tiny "
                        "STT checkpoint; falling back")
        cfg = presets.WHISPER_TINY_TEST if self.tiny else presets.WHISPER_LARGE_V3
        ecfg = self.ecfg or (
            STTEngineConfig(batch_slots=4, buckets_s=(2, 8),
                            max_new_tokens=8, max_prompt_tokens=8,
                            lang_tokens={"en": 10, "pt": 11}, task_transcribe=12,
                            task_translate=13, no_timestamps=14, no_speech=4)
            if self.tiny else STTEngineConfig(dtype=_serving_dtype()))
        # INFERNOS_STT_MAX_NEW: decode-length cap.  Benches with random
        # weights set a representative cap (real transcripts of telephony
        # utterances are 10-30 tokens) because zero-logit argmax never emits
        # EOS and would burn the full 224-token budget per utterance
        # (PERF.md round-2 garbage-decode artifact).
        cap = os.environ.get("INFERNOS_STT_MAX_NEW")
        if cap and self.ecfg is None:
            ecfg = dataclasses.replace(ecfg, max_new_tokens=int(cap))
        if self.tiny:
            params = self._params or wsp.init_params(
                jax.random.PRNGKey(self.seed), cfg)
            self.engine = STTEngine(params, cfg, ecfg)
        else:
            params = (_cast_params(self._params, ecfg.dtype)
                      if self._params is not None
                      else _zeros_init(lambda k: wsp.init_params(k, cfg),
                                       ecfg.dtype))
            if self.ecfg is not None:
                self.engine = STTEngine(params, cfg, ecfg)
            else:
                # tiered serving: short utterances (the telephony common
                # case) decode against short cross-caches -- measured 1.5x
                # aggregate realtime vs one 30 s-capable engine (PERF.md)
                from ..serving.stt_tiered import TieredSTTConfig, TieredSTTEngine

                # INFERNOS_STT_SLOTS: short-tier width.  At a 32-call ramp
                # level the per-turn utterances partially synchronize, so a
                # 24-slot tier serves them in two waves -- a p95 tail, not a
                # throughput limit (round-5 profile).  int8 cross-KV keeps
                # 32 8-s slots ~1 GB.
                self.engine = TieredSTTEngine(
                    params, cfg,
                    TieredSTTConfig(
                        short_max_s=8,
                        short_slots=int(os.environ.get(
                            "INFERNOS_STT_SLOTS", "24")),
                        long_slots=8, dtype=ecfg.dtype,
                        base=dataclasses.replace(ecfg)))
        self.engine.warmup()
        self.driver = EngineDriver(self.engine, name="stt")
        self.driver.start()
        log.info("STTActor started (tiny=%s)", self.tiny)

    def _start_tiny_real(self) -> None:
        """Serve the in-repo-trained tiny Whisper: real transcripts, real
        EOS -- turn latency without the garbage-decode artifact."""
        from ..models import tiny_real

        params, cfg, tok, ecfg = tiny_real.load_tiny_stt()
        if self.ecfg is not None:
            ecfg = self.ecfg
        self.engine = STTEngine(params, cfg, ecfg,
                                detokenize=tok.detokenize)
        self.engine.warmup()
        self.driver = EngineDriver(self.engine, name="stt")
        self.driver.start()
        log.info("STTActor started (tiny-real trained whisper)")

    def on_stop(self) -> None:
        if self.driver:
            self.driver.stop(join=False)

    def new_stt_session(self, keep_context: bool = False) -> uuid_mod.UUID:
        eng = self.engine

        class _KickingEngine:
            """Submit then kick the driver (engine free-runs)."""

            ecfg = eng.ecfg

            def submit(inner_self, req):
                slot = eng.submit(req)
                self.driver.kick()
                return slot

        sess = STTSession(_KickingEngine(), keep_context=keep_context)
        self.sessions[sess.id] = sess
        return sess.id

    def stt_session_soundin(self, sess_id: uuid_mod.UUID, req) -> None:
        self.sessions[sess_id].soundin(req)

    def stt_session_end(self, sess_id: uuid_mod.UUID) -> None:
        sess = self.sessions.pop(sess_id, None)
        if sess is not None:
            sess.stop()


class LLMActor(Actor):
    def __init__(self, tiny: bool = True, seed: int = 0,
                 ecfg: Optional[LLMEngineConfig] = None, params=None):
        self.tiny = tiny
        self.seed = seed
        self.ecfg = ecfg
        self._params = params
        self.sessions: Dict[uuid_mod.UUID, LLMSession] = {}
        self.engine: Optional[LLMEngine] = None
        self.driver: Optional[EngineDriver] = None
        self.tokenizer = ByteTokenizer()

    def start(self) -> None:
        import os as _os3

        if _os3.environ.get("INFERNOS_MODEL_MODE") == "tiny-real":
            from ..models import tiny_real

            if tiny_real.have_tiny_llm():
                return self._start_tiny_real()
            log.warning("INFERNOS_MODEL_MODE=tiny-real but no trained tiny "
                        "LLM checkpoint; falling back")
        # full single-chip serving runs the 7B at int8 (8.7 GB weights; the
        # reference's 14B target, Cluster/InfernLLMWorker.py:64, needs a
        # tp mesh over a v5e-4 -- LLMEngine(mesh=...) + QWEN25_14B then)
        cfg = presets.QWEN_TINY if self.tiny else presets.QWEN25_7B
        # single-chip colocated serving (attendant shares the chip with
        # STT+TTS): 4 slots x 1k context keeps the KV cache ~0.5 GB; the
        # dedicated-chip / tp-mesh deployments pass an explicit ecfg
        ecfg = self.ecfg or (
            LLMEngineConfig(batch_slots=2, prompt_buckets=(64, 128),
                            max_total_tokens=192, max_new_tokens=24)
            if self.tiny else LLMEngineConfig(
                batch_slots=4, prompt_buckets=(128, 256, 512),
                max_total_tokens=1024, max_new_tokens=256,
                dtype=_serving_dtype()))
        if self.tiny:
            params = self._params or qwen.init_params(
                jax.random.PRNGKey(self.seed), cfg)
        else:
            params = self._params
            if params is None:
                # zeros-init DIRECTLY in the int8-quantized layout: a dense
                # bf16 7B (15 GB) plus its quantized copy would OOM the chip
                from ..models import quant

                shapes = jax.eval_shape(
                    lambda k: qwen.init_params(k, cfg), jax.random.PRNGKey(0))
                qshapes = jax.eval_shape(quant.quantize_params, shapes)
                dt = ecfg.dtype
                params = jax.jit(lambda: jax.tree_util.tree_map(
                    lambda sd: jnp.zeros(
                        sd.shape,
                        dt if jnp.issubdtype(sd.dtype, jnp.floating) else sd.dtype),
                    qshapes))()
                # all-zero weights collapse generation to token 0 forever,
                # which detokenizes to an empty reply -- dead-ending every
                # no-checkpoint serving bench.  Randomizing just the
                # embedding + readout and unit-ing the final norm gives a
                # varied token stream through the residual path at the cost
                # of two RNG ops (full random init compiles for minutes).
                k1, k2 = jax.random.split(jax.random.PRNGKey(self.seed))
                params["embed"]["w"] = (0.02 * jax.random.normal(
                    k1, params["embed"]["w"].shape, dt))
                params["ln_f"]["g"] = jnp.ones_like(params["ln_f"]["g"])
                if "lm_head" in params:
                    params["lm_head"]["w"] = (0.02 * jax.random.normal(
                        k2, params["lm_head"]["w"].shape, dt))
        self.engine = LLMEngine(params, cfg, ecfg,
                                detokenize=self.tokenizer.detokenize)
        self.engine.warmup()
        self.driver = EngineDriver(self.engine, name="llm")
        self.driver.start()
        log.info("LLMActor started (tiny=%s)", self.tiny)

    def _start_tiny_real(self) -> None:
        """Serve the in-repo-trained attendant LLM (tools/train_tiny_llm.py):
        real replies within the speechlang vocabulary, eos fires from data."""
        from ..models import tiny_real

        params, cfg = tiny_real.load_tiny_llm()
        # trainer examples are <=384 tokens; leave generation headroom
        ecfg = self.ecfg or LLMEngineConfig(
            batch_slots=4, prompt_buckets=(128, 256, 384),
            max_total_tokens=448, max_new_tokens=64)
        self.engine = LLMEngine(params, cfg, ecfg,
                                detokenize=self.tokenizer.detokenize)
        self.engine.warmup()
        self.driver = EngineDriver(self.engine, name="llm")
        self.driver.start()
        log.info("LLMActor started (tiny-real trained attendant)")

    def on_stop(self) -> None:
        if self.driver:
            self.driver.stop(join=False)

    def new_llm_session(self, system_prompt: str = "") -> uuid_mod.UUID:
        sess = LLMSession(self.engine, tokenize=self.tokenizer,
                          system_prompt=system_prompt)
        self.sessions[sess.id] = sess
        return sess.id

    def llm_session_textin(self, sess_id: uuid_mod.UUID, text: str,
                           result_cb, auto_ctx_add: bool = True,
                           req_id=None) -> int:
        req_id = self.sessions[sess_id].textin(text, result_cb,
                                               auto_ctx_add=auto_ctx_add,
                                               req_id=req_id)
        self.driver.kick()
        return req_id

    def llm_session_context_add(self, sess_id: uuid_mod.UUID, content: str,
                                role: str = "user") -> None:
        self.sessions[sess_id].context_add(content, role=role)

    def llm_session_end(self, sess_id: uuid_mod.UUID) -> None:
        self.sessions.pop(sess_id, None)
