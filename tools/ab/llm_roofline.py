"""Pure device decode-step microbench for the 7B int8 LLM.

Pins how far the decode dispatch is from the HBM weight-read roofline,
with NO host engine, prefill, or tunnel cadence in the measurement: one
K-step scan dispatch timed back-to-back with pipelined dispatch (the next
call is enqueued before the previous result is fetched), at B in
{16, 32}.  VERDICT r3 item 5: ">=2x the 302 tok/s or a written analysis
pinning the ceiling".

Reference counterpart: the 14B 4-bit single-GPU decode loop,
``Cluster/InfernLLMWorker.py:112-118``.
"""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from infernos_tpu.models import qwen, quant

cfg = qwen.QwenConfig(
    vocab_size=152064, hidden_size=3584, num_layers=28, num_heads=28,
    num_kv_heads=4, head_dim=128, intermediate_size=18944,
    max_positions=4096, eos_token_id=151645)
DT = jnp.bfloat16
K = 16


def zeros_params():
    def build(k):
        return quant.quantize_params(qwen.init_params(k, cfg))
    shapes = jax.eval_shape(build, jax.random.PRNGKey(0))
    return jax.jit(lambda: jax.tree_util.tree_map(
        lambda sd: jnp.zeros(sd.shape,
                             sd.dtype if sd.dtype == jnp.int8 else DT),
        shapes))()


def param_bytes(p):
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(p))


def bench(params, B, n=30, unroll=1, TMAX=2048):
    cache = qwen.init_cache(cfg, B, TMAX, DT)
    pos = jnp.asarray(np.random.RandomState(0).randint(256, 1024, size=B),
                      jnp.int32)
    tok = jnp.full((B,), 11, jnp.int32)
    done = jnp.zeros((B,), bool)

    def dispatch(params, cache, pos, tok, done):
        pos0 = pos
        ring_k, ring_v = qwen.init_ring(cfg, B, K, DT)

        def one(carry, step_i):
            ring_k, ring_v, pos, tok, done = carry
            logits, ring_k, ring_v = qwen.decode_step_ring(
                params, cfg, tok, cache, ring_k, ring_v, pos0, pos, step_i,
                unroll=unroll)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            new_done = jnp.logical_or(done, nxt == cfg.eos_token_id)
            wpos = jnp.where(done, TMAX, pos)
            pos = jnp.where(done, pos, pos + 1)
            tok = jnp.where(new_done, tok, nxt)
            return (ring_k, ring_v, pos, tok, new_done), (nxt, wpos)

        (ring_k, ring_v, pos, tok, done), (nxts, wposs) = jax.lax.scan(
            one, (ring_k, ring_v, pos, tok, done), jnp.arange(K))
        c = qwen.merge_ring(cache, ring_k, ring_v, wposs.T)
        return c, pos, tok, done, nxts.T

    j = jax.jit(dispatch, donate_argnums=(1,))
    out = j(params, cache, pos, tok, done)
    jax.block_until_ready(out)
    _ = np.asarray(out[4])  # flush server-side executable-load stall
    cache = qwen.init_cache(cfg, B, TMAX, DT)
    out = j(params, cache, pos, tok, done)

    # pipelined: keep DEPTH dispatches in flight so host/tunnel RTT is
    # excluded; with donation the cache threads through in place
    DEPTH = 2
    ts = []
    t_all0 = time.perf_counter()
    for i in range(n):
        t0 = time.perf_counter()
        out = j(params, out[0], out[1], out[2], out[3])
        if i >= DEPTH - 1:
            jax.block_until_ready(out[4])
        ts.append((time.perf_counter() - t0) * 1e3)
    jax.block_until_ready(out)
    wall = time.perf_counter() - t_all0
    p50 = float(np.percentile(ts[2:], 50))
    per_step = p50 / K
    toks = B / (per_step / 1e3)
    wbytes = param_bytes(params)
    kvbytes = 2 * cfg.num_layers * B * cfg.num_kv_heads * TMAX * \
        cfg.head_dim * 2
    ideal_ms = (wbytes + kvbytes) / 819e9 * 1e3  # v5e ~819 GB/s HBM
    print(f"B={B:3d} K={K} Tmax={TMAX} unroll={unroll:2d}: "
          f"dispatch p50 {p50:7.2f} ms "
          f"({per_step:5.2f} ms/step, {toks:7.1f} tok/s device) "
          f"weights {wbytes/1e9:.2f} GB + kv {kvbytes/1e9:.2f} GB "
          f"-> roofline {ideal_ms:.2f} ms/step "
          f"({100*ideal_ms/per_step:.0f}% of roofline) "
          f"wall/iter {wall/n*1e3:.1f} ms", flush=True)
    del cache, out, j


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--b", default="16", help="comma list of batch sizes")
    ap.add_argument("--tmax", type=int, default=2048)
    ap.add_argument("--unroll", default="1,full",
                    help="comma list; 'full' = num_layers")
    args = ap.parse_args()
    params = zeros_params()
    unrolls = [cfg.num_layers if u == "full" else int(u)
               for u in args.unroll.split(",")]
    for B in map(int, args.b.split(",")):
        for u in unrolls:
            bench(params, B, unroll=u, TMAX=args.tmax)
    print("AB DONE", flush=True)
