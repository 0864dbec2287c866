"""Numerical parity of our JAX SpeechT5/HiFi-GAN vs random-init HF torch models.

Strategy: instantiate tiny HF models with random weights on CPU, port them
with ``port_from_hf``, and compare forward outputs.  This validates both the
architecture implementation and the weight-porting path that will load the
real checkpoints the reference uses (``Cluster/InfernTTSWorker.py:37-45``).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from infernos_tpu.models import speecht5 as st5
from infernos_tpu.models import hifigan as hfg


@pytest.fixture(scope="module")
def hf_tts():
    from transformers import SpeechT5Config, SpeechT5ForTextToSpeech

    torch.manual_seed(0)
    cfg = SpeechT5Config(
        vocab_size=41,
        hidden_size=48,
        encoder_layers=2,
        encoder_attention_heads=4,
        encoder_ffn_dim=96,
        decoder_layers=2,
        decoder_attention_heads=4,
        decoder_ffn_dim=96,
        num_mel_bins=20,
        speech_decoder_prenet_units=32,
        speech_decoder_prenet_layers=2,
        speech_decoder_prenet_dropout=0.0,
        speech_decoder_postnet_units=32,
        speech_decoder_postnet_layers=3,
        speech_decoder_postnet_kernel=5,
        reduction_factor=2,
        speaker_embedding_dim=16,
        max_text_positions=64,
        max_speech_positions=128,
        encoder_max_relative_position=20,
        positional_dropout=0.0,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
    )
    model = SpeechT5ForTextToSpeech(cfg).eval()
    # always-on prenet dropout with p=0 zeroes activations in HF; bypass it
    # so both sides compute the deterministic prenet
    model.speecht5.decoder.prenet._consistent_dropout = lambda x, p: x
    return model


@pytest.fixture(scope="module")
def ported(hf_tts):
    return st5.port_from_hf(hf_tts)


def test_encoder_parity(hf_tts, ported):
    params, cfg = ported
    rng = np.random.default_rng(0)
    ids = rng.integers(2, cfg.vocab_size, size=(2, 11)).astype(np.int32)
    with torch.no_grad():
        want = hf_tts.speecht5.encoder(torch.tensor(ids, dtype=torch.long)).last_hidden_state.numpy()
    got = np.asarray(st5.encode_text(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_prenet_and_decoder_parity(hf_tts, ported):
    params, cfg = ported
    rng = np.random.default_rng(1)
    B, S, T = 2, 11, 7
    ids = rng.integers(2, cfg.vocab_size, size=(B, S)).astype(np.int32)
    mel = rng.standard_normal((B, T, cfg.num_mel_bins)).astype(np.float32)
    spk = rng.standard_normal((B, cfg.speaker_embedding_dim)).astype(np.float32)

    with torch.no_grad():
        enc = hf_tts.speecht5.encoder(torch.tensor(ids, dtype=torch.long)).last_hidden_state
        pre = hf_tts.speecht5.decoder.prenet(torch.tensor(mel), torch.tensor(spk))
        dec = hf_tts.speecht5.decoder.wrapped_decoder(
            hidden_states=pre, encoder_hidden_states=enc
        ).last_hidden_state
        before, after, logits = hf_tts.speech_decoder_postnet(dec)

    enc_j = st5.encode_text(params, cfg, jnp.asarray(ids))
    pre_j = st5.decoder_prenet(
        params, cfg, jnp.asarray(mel), jnp.asarray(spk),
        step_offset=jnp.zeros(B, jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(pre_j), pre.numpy(), atol=2e-5)

    dec_j = st5.decode_full(params, cfg, pre_j, enc_j)
    np.testing.assert_allclose(np.asarray(dec_j), dec.numpy(), atol=3e-5)

    mel_j, logits_j = st5.feat_and_prob(params, cfg, dec_j)
    np.testing.assert_allclose(np.asarray(mel_j), before.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(logits_j), logits.numpy(), atol=3e-5)

    post_j = st5.postnet(params, cfg, mel_j)
    np.testing.assert_allclose(np.asarray(post_j), after.numpy(), atol=3e-5)


def test_incremental_decode_matches_full(ported):
    """The slot-batched cached step must reproduce teacher-forced decode."""
    params, cfg = ported
    rng = np.random.default_rng(2)
    B, S, T = 2, 9, 6
    enc = jnp.asarray(rng.standard_normal((B, S, cfg.hidden_size)).astype(np.float32))
    dec_in = jnp.asarray(rng.standard_normal((B, T, cfg.hidden_size)).astype(np.float32))

    want = st5.decode_full(params, cfg, dec_in, enc)

    cache = st5.init_cache(cfg, B, max_steps=T + 2, enc_len=S)
    cache = st5.fill_cross_kv(params, cfg, cache, enc)
    outs = []
    for t in range(T):
        pos = jnp.full((B,), t, jnp.int32)
        h, cache = st5.decode_step(params, cfg, dec_in[:, t : t + 1], cache, pos)
        outs.append(h)
    got = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_hifigan_parity():
    from transformers import SpeechT5HifiGan, SpeechT5HifiGanConfig

    torch.manual_seed(0)
    hc = SpeechT5HifiGanConfig(
        model_in_dim=20,
        upsample_initial_channel=32,
        upsample_rates=[4, 4],
        upsample_kernel_sizes=[8, 8],
        resblock_kernel_sizes=[3, 7],
        resblock_dilation_sizes=[[1, 3], [1, 3]],
    )
    model = SpeechT5HifiGan(hc).eval()
    params, cfg = hfg.port_from_hf(model)
    rng = np.random.default_rng(3)
    mel = rng.standard_normal((2, 12, 20)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.tensor(mel)).numpy()
    got = np.asarray(hfg.apply(params, cfg, jnp.asarray(mel)))
    assert got.shape == want.shape == (2, 12 * cfg.total_upsample)
    np.testing.assert_allclose(got, want, atol=2e-5)
