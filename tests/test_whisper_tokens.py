"""Golden tests for the vendored Whisper token layout and prompt builder.

The reference builds its prompt from the HF tokenizer at runtime
(``/root/reference/Cluster/InfernSTTWorker.py:125-134``):
``[<|startoftranscript|>, <|lang|>, <|task|>] (+ <|notimestamps|> unless
timestamps)``.  These tests pin our vendored ids and the exact prompt ids
for context / translate / timestamps combinations.
"""

import numpy as np
import pytest

from infernos_tpu.models.whisper_tokens import (
    BEGIN_SUPPRESS, SPECIALS_V2, SPECIALS_V3, SUPPRESS_V3,
    build_prompt, decode_with_timestamps, specials_for_vocab,
)
from infernos_tpu.serving.stt_engine import STTEngineConfig, STTRequest


def test_v3_special_ids():
    s = SPECIALS_V3
    assert s.eot == 50257 and s.sot == 50258
    assert s.lang_token("en") == 50259
    assert s.lang_token("fr") == 50265
    assert s.lang_token("yue") == 50358  # v3-only 100th language
    assert s.translate == 50359
    assert s.transcribe == 50360
    assert s.startoflm == 50361
    assert s.startofprev == 50362
    assert s.nospeech == 50363
    assert s.notimestamps == 50364
    assert s.timestamp_begin == 50365


def test_v2_special_ids():
    s = SPECIALS_V2
    assert s.translate == 50358 and s.transcribe == 50359
    assert s.startofprev == 50361 and s.nospeech == 50362
    assert s.notimestamps == 50363 and s.timestamp_begin == 50364
    with pytest.raises(KeyError):
        s.lang_token("yue")  # not in the 99-language v2 vocab


def test_specials_for_vocab():
    assert specials_for_vocab(51865) is SPECIALS_V2
    assert specials_for_vocab(51866) is SPECIALS_V3


def test_prompt_plain_transcribe():
    ids, sot = build_prompt(SPECIALS_V3, "en")
    assert ids == [50258, 50259, 50360, 50364]
    assert sot == 0


def test_prompt_translate_timestamps():
    ids, sot = build_prompt(SPECIALS_V3, "fr", mode="translate",
                            timestamps=True)
    assert ids == [50258, 50265, 50359]
    assert sot == 0


def test_prompt_with_context_prefixes_startofprev():
    ctx = [100, 200, 300]
    ids, sot = build_prompt(SPECIALS_V3, "en", context=ctx)
    assert ids == [50362, 100, 200, 300, 50258, 50259, 50360, 50364]
    assert sot == 4
    assert ids[sot] == SPECIALS_V3.sot


def test_prompt_context_truncates_from_left():
    ctx = list(range(1000, 1100))
    ids, sot = build_prompt(SPECIALS_V3, "en", context=ctx,
                            max_prompt_tokens=12)
    # room = 12 - 4 (tail) - 1 (startofprev) = 7 context tokens, newest kept
    assert len(ids) == 12
    assert ids[0] == SPECIALS_V3.startofprev
    assert ids[1:8] == list(range(1093, 1100))
    assert ids[8:] == [50258, 50259, 50360, 50364]
    assert sot == 8


def test_suppress_table_excludes_decode_essentials():
    # eot / notimestamps / timestamps must stay decodable
    assert SPECIALS_V3.eot not in SUPPRESS_V3
    assert SPECIALS_V3.notimestamps not in SUPPRESS_V3
    assert SPECIALS_V3.timestamp_begin not in SUPPRESS_V3
    # but the structural specials are suppressed mid-decode
    for t in (SPECIALS_V3.sot, SPECIALS_V3.translate, SPECIALS_V3.transcribe,
              SPECIALS_V3.startoflm, SPECIALS_V3.startofprev,
              SPECIALS_V3.nospeech):
        assert t in SUPPRESS_V3
    assert BEGIN_SUPPRESS == (220, 50257)


def test_engine_prompt_matches_vendored_builder():
    """STTEngine._build_prompt must emit the exact whisper_tokens layout."""

    class _Cfg:  # stand-in for WhisperConfig
        sot_token_id = SPECIALS_V3.sot
        vocab_size = SPECIALS_V3.vocab_size

    ecfg = STTEngineConfig.for_specials(SPECIALS_V3)
    eng = type("E", (), {})()  # no compilation: call the method unbound
    eng.ecfg = ecfg
    eng.cfg = _Cfg()
    from infernos_tpu.serving.stt_engine import STTEngine

    for lang, mode, ts, ctx in [
        ("en", "transcribe", False, None),
        ("pt", "translate", False, None),
        ("de", "transcribe", True, None),
        ("en", "transcribe", False, [11, 22, 33]),
        ("fr", "translate", True, list(range(500))),
    ]:
        req = STTRequest(audio=np.zeros(16, np.float32),
                         text_cb=lambda r: None, lang=lang, mode=mode,
                         timestamps=ts,
                         context=None if ctx is None else np.asarray(ctx))
        got, got_sot = STTEngine._build_prompt(eng, req)
        want, want_sot = build_prompt(
            SPECIALS_V3, lang, mode=mode, timestamps=ts, context=ctx,
            max_prompt_tokens=ecfg.max_prompt_tokens)
        assert got == want, (lang, mode, ts)
        assert got_sot == want_sot


def test_decode_with_timestamps():
    detok = lambda toks: "".join(chr(t) for t in toks)
    s = SPECIALS_V3
    toks = [s.timestamp_begin, ord("h"), ord("i"),
            s.timestamp_begin + 50]  # 50*0.02 = 1.00s
    assert decode_with_timestamps(toks, detok, s) == "<|0.00|>hi<|1.00|>"


def test_engine_config_for_specials_v2():
    e = STTEngineConfig.for_specials(SPECIALS_V2)
    assert e.no_speech == 50362 and e.sot_prev == 50361
    assert e.lang_tokens["en"] == 50259
    assert "yue" not in e.lang_tokens
    e3 = STTEngineConfig.for_specials(SPECIALS_V3)
    assert e3.no_speech == 50363 and e3.lang_tokens["yue"] == 50358
