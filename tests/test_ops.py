"""Pallas kernel parity tests (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from infernos_tpu.ops.attention import _xla_attention, fused_attention


def _mk(B=2, S=256, D=64, H=4, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal((B, S, D)).astype(np.float32))
    return mk(), mk(), mk()


def test_pallas_attention_matches_xla():
    q, k, v = _mk()
    want = fused_attention(q, k, v, n_heads=4, use_pallas=False)
    got = fused_attention(q, k, v, n_heads=4, use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_pallas_attention_with_mask():
    q, k, v = _mk(seed=1)
    mask = np.ones((2, 256), bool)
    mask[0, 200:] = False  # padded tail on batch 0
    mask = jnp.asarray(mask)
    want = fused_attention(q, k, v, n_heads=4, mask=mask, use_pallas=False)
    got = fused_attention(q, k, v, n_heads=4, mask=mask, use_pallas=True,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    # masked keys must not influence the output: perturb them, nothing changes
    k2 = k.at[0, 200:].set(99.0)
    v2 = v.at[0, 200:].set(-99.0)
    got2 = fused_attention(q, k2, v2, n_heads=4, mask=mask, use_pallas=True,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(got), atol=2e-5)


def test_fallback_on_untiled_length():
    # S=250 doesn't tile by 128 -> silently uses the XLA path
    q, k, v = _mk(S=250, seed=2)
    out = fused_attention(q, k, v, n_heads=4)
    assert out.shape == (2, 250, 64)


def test_matches_layers_attention():
    """Same math as the model stack's attention (q/k/v pre-projected)."""
    from infernos_tpu.models import layers as L

    q, k, v = _mk(B=1, S=128, seed=3)
    got = fused_attention(q, k, v, n_heads=4, use_pallas=True, interpret=True)
    # layers.attention applies projections; emulate identity projections
    import jax.numpy as jnp

    D = 64
    eye = {"w": jnp.eye(D)}
    p = {"q": eye, "k": eye, "v": eye, "o": eye}
    want = L.attention(p, q, jnp.zeros_like(q), n_heads=4)  # placeholder
    # direct comparison vs scaled-dot-product on raw tensors:
    want = _xla_attention(
        q.reshape(1, 128, 4, 16).transpose(0, 2, 1, 3).reshape(4, 128, 16),
        k.reshape(1, 128, 4, 16).transpose(0, 2, 1, 3).reshape(4, 128, 16),
        v.reshape(1, 128, 4, 16).transpose(0, 2, 1, 3).reshape(4, 128, 16),
        jnp.zeros((4, 128), jnp.float32),
    ).reshape(1, 4, 128, 16).transpose(0, 2, 1, 3).reshape(1, 128, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_pallas_attention_pads_unaligned_seq_lens():
    """Production bucket lengths (400/1500) are not block_q multiples; the
    kernel must self-pad and still match XLA."""
    for S in (400, 1500, 130, 128):
        rng = np.random.default_rng(S)
        B, D = 2, 64
        q = jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32)
        mask = jnp.asarray(np.arange(S)[None, :] < np.array([[S - 7], [S]]))
        want = fused_attention(q, k, v, n_heads=4, mask=mask, use_pallas=False)
        got = fused_attention(q, k, v, n_heads=4, mask=mask, use_pallas=True,
                              interpret=True)
        np.testing.assert_allclose(np.asarray(got)[:, :, :],
                                   np.asarray(want), atol=2e-5)
