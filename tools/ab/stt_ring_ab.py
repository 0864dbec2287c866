"""One-process A/B: STT K-step dispatch with ring-merge vs per-step scatter.

Both variants run whisper-large-v3 decode dims at B=32, K=8, Tmax=224,
donated cache, fresh jit closures (fn-identity trap).  The scatter variant
reconstructs the pre-ring engine _step inline.
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from infernos_tpu.models import whisper as wsp

CFG = wsp.WhisperConfig()  # large-v3 dims
# B=16 is the SERVING batch (STTEngineConfig.batch_slots); B=32 OOMs on a
# 16 GB v5e at large-v3 dims because the [L,B,H,S,64] cache layout pads the
# 64-wide minor dim to 128 lanes (2x HBM expansion, see PERF.md round 4)
B, K, TMAX, S = 16, 8, 224, 1500
DT = jnp.bfloat16

params = wsp.init_params(jax.random.PRNGKey(0), CFG)
params = jax.tree_util.tree_map(lambda a: a.astype(DT), params)
enc_mask = jnp.ones((B, S), bool)


def mk_state():
    # int8 cross-KV is the SERVING configuration (PERF.md round 2) and is
    # what makes large-v3 B=32 fit one v5e chip: bf16 cross at S=1500 is
    # ~8 GB and OOMs next to the 3 GB params + self cache.
    cache = wsp.init_cache(CFG, B, TMAX, S, dtype=DT, cross_int8=True)
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    ck = jax.jit(lambda k, sh: wsp.quantize_kv(
        0.1 * jax.random.normal(k, sh, jnp.float32)), static_argnums=1)
    cache = cache._replace(
        self_k=(0.1 * jax.random.normal(ks[0], cache.self_k.shape)).astype(DT),
        self_v=(0.1 * jax.random.normal(ks[1], cache.self_v.shape)).astype(DT),
        cross_k=ck(ks[2], cache.cross_k["q"].shape),
        cross_v=ck(ks[3], cache.cross_v["q"].shape))
    pos = jnp.asarray(np.random.RandomState(0).randint(8, 180, size=B), jnp.int32)
    tok = jnp.full((B,), 50364, jnp.int32) % CFG.vocab_size
    done = jnp.zeros((B,), bool)
    return cache, pos, tok, done


def step_scatter(params, cache, pos, tok, done):
    def one(carry, _):
        cache, pos, tok, done = carry
        logits, cache = wsp.decode_step(params, CFG, tok, cache, pos,
                                        enc_mask=enc_mask)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        new_done = jnp.logical_or(done, nxt == CFG.eos_token_id)
        pos = jnp.where(done, pos, pos + 1)
        tok = jnp.where(new_done, tok, nxt)
        return (cache, pos, tok, new_done), nxt
    (cache, pos, tok, done), nxts = jax.lax.scan(
        one, (cache, pos, tok, done), None, length=K)
    return cache, pos, tok, done, nxts.T


def step_ring(params, cache, pos, tok, done):
    pos0 = pos
    ring_k, ring_v = wsp.init_ring(CFG, B, K, cache.self_k.dtype)

    def one(carry, step_i):
        ring_k, ring_v, pos, tok, done = carry
        logits, ring_k, ring_v = wsp.decode_step_ring(
            params, CFG, tok, cache, ring_k, ring_v, pos0, pos, step_i,
            enc_mask=enc_mask)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        new_done = jnp.logical_or(done, nxt == CFG.eos_token_id)
        wpos = jnp.where(done, TMAX, pos)
        pos = jnp.where(done, pos, pos + 1)
        tok = jnp.where(new_done, tok, nxt)
        return (ring_k, ring_v, pos, tok, new_done), (nxt, wpos)
    (ring_k, ring_v, pos, tok, done), (nxts, wposs) = jax.lax.scan(
        one, (ring_k, ring_v, pos, tok, done), jnp.arange(K))
    cache = wsp.merge_ring(cache, ring_k, ring_v, wposs.T)
    return cache, pos, tok, done, nxts.T


def bench(label, fn, n=25):
    j = jax.jit(lambda p, c, po, t, d: fn(p, c, po, t, d),
                donate_argnums=(1,))
    cache, pos, tok, done = mk_state()
    out = j(params, cache, pos, tok, done)
    jax.block_until_ready(out)
    _ = np.asarray(out[4])  # flush server-side load stall
    cache, pos, tok, done = mk_state()
    out = j(params, cache, pos, tok, done)
    cache = out[0]
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = j(params, cache, pos, tok, done)
        cache = out[0]
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    p50 = float(np.percentile(ts, 50))
    print(f"{label:10s} p50 {p50:7.2f} ms  p10 "
          f"{np.percentile(ts, 10):7.2f}  min {min(ts):7.2f} "
          f"({K}-step dispatch, B={B}, large-v3, Tmax={TMAX})", flush=True)
    return p50


if __name__ == "__main__":
    a = bench("scatter", step_scatter)
    b = bench("ring", step_ring)
    print(f"speedup p50: {a / b:.3f}")
    print("AB DONE", flush=True)
