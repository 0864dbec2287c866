"""One-process A/B: HEAD fused kernel vs double-buffered-weights kernel.

Same window, same donation discipline, cache threaded between calls.
Configs: TMAX=512 f32 cache (historic headline) and TMAX=128 bf16 cache
(serving-shaped).  16-step scans at B=24 full SpeechT5 dims.
"""
import importlib.util
import sys, time, os
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from infernos_tpu.models import speecht5 as st5
from infernos_tpu.ops import tts_step as fs_new

spec = importlib.util.spec_from_file_location("tts_step_old", "/tmp/tts_step_old.py")
fs_old = importlib.util.module_from_spec(spec)
spec.loader.exec_module(fs_old)

CFG = st5.SpeechT5Config()
B = 24
N_STEPS = 16


def run_config(tmax, cache_dt, s=128):
    print(f"-- TMAX={tmax} cache={cache_dt.__name__} --", flush=True)
    params = st5.init_params(jax.random.PRNGKey(0), CFG)
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    x0 = jax.random.normal(ks[4], (B, 1, CFG.hidden_size), jnp.float32)
    pos0 = jnp.asarray(np.random.RandomState(0).randint(
        0, int(tmax * 0.8), size=B), jnp.int32)
    enc_mask = jnp.ones((B, s), bool)

    def mk_cache(mod):
        c = mod.tm_init_cache(CFG, B, tmax, s, dtype=cache_dt)
        kk = jax.random.split(jax.random.PRNGKey(1), 4)
        return c._replace(
            self_k=(0.1 * jax.random.normal(kk[0], c.self_k.shape)).astype(cache_dt),
            self_v=(0.1 * jax.random.normal(kk[1], c.self_v.shape)).astype(cache_dt),
            cross_k=(0.1 * jax.random.normal(kk[2], c.cross_k.shape)).astype(cache_dt),
            cross_v=(0.1 * jax.random.normal(kk[3], c.cross_v.shape)).astype(cache_dt))

    from infernos_tpu.models import quant
    qparams = dict(params)
    qparams["dec_layers"] = jax.jit(
        lambda d: quant.quantize_params(d, min_size=0))(params["dec_layers"])

    results = {}
    for label, mod, pp in (("old", fs_old, params), ("new", fs_new, params),
                           ("new-int8", fs_new, qparams)):
        fw = jax.jit(lambda p: mod.pack_fused_weights(p, CFG))(pp)

        def scan_fused(fw, x, cache, pos, _mod=mod):
            def step(carry, _):
                x, cache, pos = carry
                h, cache = _mod.fused_decode_step(
                    None, CFG, x, cache, pos, enc_mask=enc_mask,
                    time_minor=True, packed=fw)
                return (h.astype(x.dtype), cache, pos + 1), ()
            (h, cache, pos), _ = jax.lax.scan(step, (x, cache, pos), None,
                                              length=N_STEPS)
            return h, cache

        j = jax.jit(scan_fused, donate_argnums=(2,))
        cache = mk_cache(mod)
        h, cache = j(fw, x0, cache, pos0)
        jax.block_until_ready((h, cache))
        _ = np.asarray(h)  # flush server-side load stall
        cache = mk_cache(mod)
        h, cache = j(fw, x0, cache, pos0)
        jax.block_until_ready((h, cache))
        ts = []
        for _ in range(40):
            t0 = time.perf_counter()
            h, cache = j(fw, x0, cache, pos0)
            jax.block_until_ready((h, cache))
            ts.append((time.perf_counter() - t0) * 1e3)
        p50 = np.percentile(ts, 50)
        results[label] = p50
        print(f"  {label}: p50 {p50:7.2f} ms  p10 {np.percentile(ts,10):7.2f}"
              f"  min {min(ts):7.2f}  ({N_STEPS} steps => "
              f"{p50/N_STEPS:5.2f} ms/AR-step)", flush=True)
        del cache, j, fw
    print(f"  speedup p50 (dbuf): {results['old']/results['new']:.3f}; "
          f"(dbuf+int8): {results['old']/results['new-int8']:.3f}", flush=True)


if __name__ == "__main__":
    run_config(512, jnp.float32)
    run_config(128, jnp.bfloat16)
    print("AB DONE", flush=True)
