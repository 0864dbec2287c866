"""One-process A/B: whisper ring decode with canonical [L,B,H,T,Dh] caches
vs time-minor [L,B,H,Dh,T] (the 2x-padding fix, PERF.md round 4).

Serving shape: B=16, K=8, Tmax=224, int8 cross-KV, large-v3 dims, donated
cache, fresh jit closures per variant.
"""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from infernos_tpu.models import whisper as wsp

CFG = wsp.WhisperConfig()  # large-v3 dims
B, K, TMAX, S = 16, 8, 224, 1500
DT = jnp.bfloat16

params = wsp.init_params(jax.random.PRNGKey(0), CFG)
params = jax.tree_util.tree_map(lambda a: a.astype(DT), params)
enc_mask = jnp.ones((B, S), bool)


def mk_state(tm):
    cache = wsp.init_cache(CFG, B, TMAX, S, dtype=DT, cross_int8=True,
                           time_minor=tm)
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    qshape = cache.cross_k["q"].shape

    def fill(k):
        x = 0.1 * jax.random.normal(k, qshape, jnp.float32)
        # per-POSITION scales over the head dim: canonical [*,S,Dh] ->
        # amax over -1 (s [*,S,1]); time-minor [*,Dh,S] -> over -2 ([*,1,S])
        amax = jnp.maximum(jnp.max(jnp.abs(x), axis=(-2 if tm else -1),
                                   keepdims=True), 1e-8)
        s = (amax / 127.0).astype(jnp.float32)
        q = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
        return {"q": q, "s": s}

    cache = cache._replace(
        self_k=(0.1 * jax.random.normal(ks[0], cache.self_k.shape)).astype(DT),
        self_v=(0.1 * jax.random.normal(ks[1], cache.self_v.shape)).astype(DT),
        cross_k=jax.jit(fill)(ks[2]), cross_v=jax.jit(fill)(ks[3]))
    pos = jnp.asarray(np.random.RandomState(0).randint(8, 180, size=B), jnp.int32)
    tok = jnp.full((B,), 50364, jnp.int32) % CFG.vocab_size
    done = jnp.zeros((B,), bool)
    return cache, pos, tok, done


def step_ring(tm, i8=False):
    def run(params, cache, pos, tok, done):
        pos0 = pos
        ring_k, ring_v = wsp.init_ring(CFG, B, K, cache.self_k.dtype,
                                       time_minor=tm)

        def one(carry, step_i):
            ring_k, ring_v, pos, tok, done = carry
            logits, ring_k, ring_v = wsp.decode_step_ring(
                params, CFG, tok, cache, ring_k, ring_v, pos0, pos, step_i,
                enc_mask=enc_mask, time_minor=tm, cross_direct_int8=i8)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            new_done = jnp.logical_or(done, nxt == CFG.eos_token_id)
            wpos = jnp.where(done, TMAX, pos)
            pos = jnp.where(done, pos, pos + 1)
            tok = jnp.where(new_done, tok, nxt)
            return (ring_k, ring_v, pos, tok, new_done), (nxt, wpos)
        (ring_k, ring_v, pos, tok, done), (nxts, wposs) = jax.lax.scan(
            one, (ring_k, ring_v, pos, tok, done), jnp.arange(K))
        cache = wsp.merge_ring(cache, ring_k, ring_v, wposs.T, time_minor=tm)
        return cache, pos, tok, done, nxts.T
    return run


def bench(label, tm, i8=False, n=25):
    j = jax.jit(step_ring(tm, i8), donate_argnums=(1,))
    cache, pos, tok, done = mk_state(tm)
    out = j(params, cache, pos, tok, done)
    jax.block_until_ready(out)
    _ = np.asarray(out[4])  # flush server-side load stall
    cache, pos, tok, done = mk_state(tm)
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
    import sys
    if "--i8-only" in sys.argv:
        b = bench("time-minor", True)
        c = bench("tm+i8direct", True, i8=True)
        print(f"i8-direct speedup over tm p50: {b / c:.3f}")
    else:
        a = bench("canonical", False)
        b = bench("time-minor", True)
        c = bench("tm+i8direct", True, i8=True)
        print(f"speedup p50 (tm): {a / b:.3f}; (tm+i8direct): {a / c:.3f}")
    print("AB DONE", flush=True)
