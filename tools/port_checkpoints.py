"""Port the reference's pretrained checkpoints into framework format.

Run once on a machine with network/HF-cache access; serving then loads the
saved pytrees offline.  Covers the checkpoints the reference deploys:

- SpeechT5 TTS per language (``Cluster/InfernTTSWorker.py:37-45``:
  microsoft/speecht5_tts, and the sobomax per-language variants)
- HiFi-GAN vocoder (microsoft/speecht5_hifigan)
- Whisper large-v3 (``Cluster/InfernSTTWorker.py:25``)
- Qwen2.5-14B-Instruct (``Cluster/InfernLLMWorker.py:64``)
- CMU-Arctic speaker xvectors (``HelloSippyRTPipe.py:181-183``)

Usage:
    python tools/port_checkpoints.py --out /ckpt [--tts] [--stt] [--llm]
                                     [--speakers] [--int8]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TTS_CHECKPOINTS = {
    "en": "microsoft/speecht5_tts",
    # the reference's per-language map (Cluster/InfernTTSWorker.py:37-45)
    # adds sobomax/speecht5_tts-* variants; extend as needed
}


def port_tts(out: str, int8: bool) -> None:
    from transformers import SpeechT5ForTextToSpeech, SpeechT5HifiGan

    from infernos_tpu.models import checkpoint as ckpt
    from infernos_tpu.models import hifigan as hfg
    from infernos_tpu.models import speecht5 as st5

    for lang, name in TTS_CHECKPOINTS.items():
        model = SpeechT5ForTextToSpeech.from_pretrained(name).eval()
        params, cfg = st5.port_from_hf(model)
        if int8:
            from infernos_tpu.models import quant

            params = quant.quantize_params(params)
        ckpt.save(os.path.join(out, f"tts_{lang}"), params, cfg)
        print(f"ported {name} -> tts_{lang}")
    voc = SpeechT5HifiGan.from_pretrained("microsoft/speecht5_hifigan").eval()
    vparams, vcfg = hfg.port_from_hf(voc)
    ckpt.save(os.path.join(out, "hifigan"), vparams, vcfg)
    print("ported hifigan")


def port_stt(out: str, int8: bool) -> None:
    from transformers import WhisperForConditionalGeneration, WhisperTokenizer

    from infernos_tpu.models import checkpoint as ckpt
    from infernos_tpu.models import whisper as wsp

    name = "openai/whisper-large-v3"
    model = WhisperForConditionalGeneration.from_pretrained(name).eval()
    params, cfg = wsp.port_from_hf(model)
    if int8:
        from infernos_tpu.models import quant

        params = quant.quantize_params(params)
    ckpt.save(os.path.join(out, "whisper"), params, cfg)
    tok = WhisperTokenizer.from_pretrained(name)
    tok.save_pretrained(os.path.join(out, "whisper", "tokenizer"))
    print(f"ported {name}")


def port_llm(out: str, int8: bool) -> None:
    import torch
    from transformers import AutoTokenizer, Qwen2ForCausalLM

    from infernos_tpu.models import checkpoint as ckpt
    from infernos_tpu.models import qwen

    name = "Qwen/Qwen2.5-14B-Instruct"
    model = Qwen2ForCausalLM.from_pretrained(name, torch_dtype=torch.float32).eval()
    params, cfg = qwen.port_from_hf(model)
    if int8:
        from infernos_tpu.models import quant

        params = quant.quantize_params(params)
    ckpt.save(os.path.join(out, "qwen"), params, cfg)
    tok = AutoTokenizer.from_pretrained(name)
    tok.save_pretrained(os.path.join(out, "qwen", "tokenizer"))
    print(f"ported {name}")


def port_speakers(out: str) -> None:
    from infernos_tpu.serving.speakers import SpeakerBank

    SpeakerBank.load_hf_xvectors(os.path.join(out, "xvectors.npz"))
    print("ported cmu-arctic xvectors")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/ckpt")
    ap.add_argument("--tts", action="store_true")
    ap.add_argument("--stt", action="store_true")
    ap.add_argument("--llm", action="store_true")
    ap.add_argument("--speakers", action="store_true")
    ap.add_argument("--int8", action="store_true")
    a = ap.parse_args()
    if not any((a.tts, a.stt, a.llm, a.speakers)):
        a.tts = a.stt = a.llm = a.speakers = True
    os.makedirs(a.out, exist_ok=True)
    if a.tts:
        port_tts(a.out, a.int8)
    if a.stt:
        port_stt(a.out, a.int8)
    if a.llm:
        port_llm(a.out, a.int8)
    if a.speakers:
        port_speakers(a.out)


if __name__ == "__main__":
    main()
