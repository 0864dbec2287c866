"""Tiny-real attendant LLM: policy/dataset contract + loader.

The trainer (``tools/train_tiny_llm.py``) must stay aligned with serving:
ChatML via ``apply_chat_template``, ByteTokenizer ids, eos id 2 stop, and
replies sayable by the tiny TTS (speechlang vocabulary, <=40 chars).
"""

import numpy as np
import pytest

from infernos_tpu.models.tokenizers import ByteTokenizer


def test_policy_vocab_and_length():
    from tools.speechlang import WORDS
    from tools.train_tiny_llm import (INTERRUPTED, NOTHING, make_dialogue,
                                      policy)

    allowed = set(WORDS) | {NOTHING}
    rng = np.random.default_rng(0)
    seen = set()
    for _ in range(200):
        for ctx, reply in make_dialogue(rng):
            assert reply == policy(ctx[-1]["content"])  # deterministic
            assert len(reply) <= 40
            seen.add(reply)
            if reply != NOTHING:
                assert set(reply.split()) <= allowed, reply
    assert len(seen) > 8  # every policy branch is exercised


def test_encode_example_serving_shape():
    from infernos_tpu.serving.llm_engine import apply_chat_template
    from tools.train_tiny_llm import EOS, encode_example, make_dialogue

    tok = ByteTokenizer()
    rng = np.random.default_rng(1)
    ctx, reply = make_dialogue(rng)[0]
    ids, n_prompt = encode_example(tok, ctx, reply)
    # prompt part is exactly the serving prompt LLMSession would submit
    prompt = apply_chat_template(ctx)
    assert ids[:n_prompt] == tok(prompt).tolist()
    # generation target is reply bytes then the engine's stop token
    assert ids[n_prompt:] == tok(reply).tolist() + [EOS]
    assert tok.detokenize(ids[n_prompt:-1]) == reply


def test_assemble_masks_reply_only():
    from tools.train_tiny_llm import assemble, encode_example, make_dialogue

    tok = ByteTokenizer()
    rng = np.random.default_rng(2)
    ctx, reply = make_dialogue(rng)[0]
    ids, n_prompt = encode_example(tok, ctx, reply)
    toks, tgt, mask = assemble(tok, [(ids, n_prompt)])
    on = np.nonzero(mask[0])[0]
    # supervised positions predict exactly reply+eos
    assert on[0] == n_prompt - 1 and len(on) == len(ids) - n_prompt
    assert tgt[0, on].tolist() == ids[n_prompt:]
    assert mask[0, len(ids) - 1:].sum() == 0  # padding unsupervised


def test_loader_roundtrip():
    from infernos_tpu.models import tiny_real

    if not tiny_real.have_tiny_llm():
        pytest.skip("no trained tiny LLM checkpoint")
    params, cfg = tiny_real.load_tiny_llm()
    assert cfg.eos_token_id == 2
    assert params["embed"]["w"].shape == (cfg.vocab_size, cfg.hidden_size)
    assert params["layers"]["q"]["w"].shape[0] == cfg.num_layers
