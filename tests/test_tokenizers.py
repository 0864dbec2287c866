"""Real tokenizer engines: byte-level BPE + SentencePiece unigram.

Golden tests on hand-built merge tables, HF cross-validation on the same
on-disk files (GPT2TokenizerFast over a toy vocab -- offline), and
protobuf round-trip for the spm reader.  VERDICT r2 item 5.
"""

import json
import os

import numpy as np
import pytest

from infernos_tpu.models.bpe import (ByteLevelBPE, bytes_to_unicode,
                                     train_bpe)
from infernos_tpu.models.spm import (SentencePieceModel, load_spm_model,
                                     save_spm_model, train_char_spm)


def test_bytes_to_unicode_reversible():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256
    # printable ascii maps to itself
    assert m[ord("a")] == "a"
    assert m[ord("!")] == "!"


def _toy_bpe():
    """Hand-built table: bytes + merges for 'he', 'll', 'hell', 'hello'."""
    vocab = {u: i for i, u in enumerate(
        sorted(bytes_to_unicode().values(),
               key=lambda u: [k for k, v in bytes_to_unicode().items()
                              if v == u][0]))}
    # ^ byte alphabet in byte order
    merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o")]
    for a, b in merges:
        vocab[a + b] = len(vocab)
    return ByteLevelBPE(vocab, merges)


def test_bpe_golden_merges():
    tok = _toy_bpe()
    ids = tok.encode("hello")
    assert [tok.id_to_tok[i] for i in ids] == ["hello"]
    ids = tok.encode("hell")
    assert [tok.id_to_tok[i] for i in ids] == ["hell"]
    ids = tok.encode("he ll")
    # " ll" has a leading space byte token (Ġ) so 'll' merge applies after
    toks = [tok.id_to_tok[i] for i in ids]
    assert toks[0] == "he"
    assert "".join(toks).endswith("ll")


def test_bpe_roundtrip_unicode():
    tok = _toy_bpe()
    for text in ["hello world", "héllo", "日本語 text", "a\nb\tc",
                 "  spaces  ", "don't stop"]:
        assert tok.decode(tok.encode(text)) == text


def test_bpe_special_tokens():
    vocab = {u: i for i, u in enumerate(bytes_to_unicode().values())}
    tok = ByteLevelBPE(vocab, [], special_tokens={"<|eos|>": 500})
    ids = tok.encode("hi<|eos|>yo")
    assert 500 in ids
    assert tok.decode(ids) == "hiyo"  # specials skipped
    assert tok.decode(ids, skip_special=False) == "hi<|eos|>yo"


def test_bpe_trainer_learns_merges_and_roundtrips():
    corpus = ["the cat sat on the mat"] * 50 + ["the dog ran"] * 30
    tok = train_bpe(corpus, vocab_size=300, special_tokens=["<pad>"])
    assert tok.ranks, "trainer produced no merges"
    # frequent word 'the' should become few tokens
    assert len(tok.encode("the")) <= 2
    for text in corpus[:1] + ["unseen words zqx"]:
        assert tok.decode(tok.encode(text)) == text
    assert tok.special["<pad>"] == tok.vocab_size - 1


def test_bpe_file_roundtrip(tmp_path):
    tok = train_bpe(["aa bb aa bb cc"] * 20, vocab_size=280)
    vj, mt = str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt")
    tok.save(vj, mt)
    tok2 = ByteLevelBPE.from_files(vj, mt)
    text = "aa bb cc dd"
    assert tok2.encode(text) == tok.encode(text)
    assert tok2.decode(tok2.encode(text)) == text


def test_bpe_matches_hf_gpt2_fast(tmp_path):
    """Cross-validate our engine against HF's tokenizers on the SAME
    on-disk vocab/merges -- proves a checkpoint port is data-only and
    exercises the HFTokenizerAdapter path (VERDICT item 5)."""
    transformers = pytest.importorskip("transformers")
    tok = train_bpe(
        ["the quick brown fox jumps over the lazy dog"] * 40
        + ["pack my box with five dozen liquor jugs"] * 25,
        vocab_size=330)
    vj, mt = str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt")
    tok.save(vj, mt)
    try:
        hf = transformers.GPT2TokenizerFast(vocab_file=vj, merges_file=mt)
    except Exception as e:  # tokenizers backend unavailable offline
        pytest.skip(f"GPT2TokenizerFast unavailable: {e}")
    from infernos_tpu.models.tokenizers import HFTokenizerAdapter
    adapter = HFTokenizerAdapter(hf)
    for text in ["the quick brown fox", "lazy dogs jump", "a!b? c,d.",
                 "hello unseen tokens"]:
        ours = tok.encode(text)
        theirs = list(adapter(text))
        assert ours == theirs, (text, ours, theirs)
        assert adapter.detokenize(theirs) == tok.decode(ours) == text


def test_spm_char_train_encode_decode():
    corpus = ["hello world", "how are you"]
    m = train_char_spm(corpus)
    ids = m.encode("hello you")
    assert m.decode(ids) == "hello you"
    # encode maps known chars to non-unk pieces
    assert all(i != m.unk_id for i in ids)
    # unknown char falls back to unk
    ids2 = m.encode("hello Z")
    assert m.unk_id in ids2


def test_spm_viterbi_prefers_longer_pieces():
    # piece table where 'ab' has better score than 'a'+'b'
    pieces = [("<unk>", -10.0, 2), ("a", -3.0, 1), ("b", -3.0, 1),
              ("ab", -2.0, 1), ("▁", -1.0, 1)]
    m = SentencePieceModel(pieces)
    ids = m.encode("ab", add_ws_prefix=False)
    assert [m.pieces[i][0] for i in ids] == ["ab"]


def test_spm_protobuf_roundtrip(tmp_path):
    m = train_char_spm(["round trip text"])
    path = str(tmp_path / "spiece.model")
    save_spm_model(m, path)
    m2 = load_spm_model(path)
    assert len(m2.pieces) == len(m.pieces)
    for (p1, s1, t1), (p2, s2, t2) in zip(m.pieces, m2.pieces):
        assert p1 == p2 and t1 == t2
        assert abs(s1 - s2) < 1e-6
    text = "round trip"
    assert m2.decode(m2.encode(text)) == text
    assert m2.encode(text) == m.encode(text)


def test_spm_matches_real_sentencepiece_if_available(tmp_path):
    """If the sentencepiece lib is importable, cross-check decode parity
    on our own serialized model."""
    spm_lib = pytest.importorskip("sentencepiece")
    m = train_char_spm(["cross check text here"])
    path = str(tmp_path / "spiece.model")
    save_spm_model(m, path)
    try:
        sp = spm_lib.SentencePieceProcessor(model_file=path)
    except Exception as e:
        pytest.skip(f"sentencepiece refused minimal model: {e}")
    ids = m.encode("check text")
    assert sp.decode(ids) == m.decode(ids)
