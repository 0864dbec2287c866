"""Infernos-TPU: a TPU-native real-time AI inference-serving framework for
telephony streams.

Re-designed from scratch for TPU (JAX/XLA/Pallas/pjit) with the capability
surface of sippy/Infernos (see SURVEY.md): SIP call termination, RTP audio
ingest (G.711/G.722, 20 ms packets), streaming VAD -> STT (Whisper-class) ->
translation / LLM (Qwen-class) -> TTS (SpeechT5 + HiFi-GAN class) pipelines,
and paced RTP egress under hard real-time deadlines.

Architecture (three planes; contrast with the reference's Ray-actor +
Python-thread-per-request design, SURVEY.md section 7):

- **compute plane**: a small number of persistent jitted JAX programs with
  fixed shapes (batch slots x bucketed lengths) driven by host-side
  schedulers; sessions map to batch *slots*, joins/leaves are slot writes.
- **media plane**: host-side RTP engine (jitter buffer, packetizer, paced
  egress) with a C++ fast path, feeding coalesced per-tick host<->device
  transfers.
- **signaling plane**: asyncio SIP stack (UA/UAS/UAC, SDP negotiation,
  registration) compatible with the reference's YAML config surface.
"""

__version__ = "0.1.0"
