"""Int8 weight-only matmul strategies at LLM decode shape: does the
s8->bf16 convert fuse into the dot, or does XLA materialize converted
weights (tripling effective HBM traffic)?

Variants at x[B,3584] @ w[3584,18944] (the qwen MLP up-proj, the biggest
per-layer read), B=16:
  a) current serving path: x @ w_q.astype(bf16) * scale
  b) bf16 dense reference (2x the int8 bytes, zero convert)
  c) w8a8: dynamic per-row activation int8 quant, s8 x s8 dot -> s32,
     rescale (true int8 weight traffic into the MXU)
Effective GB/s = weight bytes / time tells which one reads s8 directly.
"""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

B, DIN, DOUT = 16, 3584, 18944
N_LAYERS = 28  # scan repeats so the working set (28 layers) exceeds CMEM


def bench(label, fn, ws, wbytes, n=30):
    x = jax.random.normal(jax.random.PRNGKey(0), (B, DIN), jnp.bfloat16)
    j = jax.jit(fn)
    out = j(x, ws)
    jax.block_until_ready(out)
    _ = np.asarray(out[0, 0])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = j(x, ws)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    p50 = float(np.percentile(ts, 50))
    print(f"{label:28s} p50 {p50:7.2f} ms  effective "
          f"{wbytes / (p50 / 1e3) / 1e9:6.1f} GB/s over weight bytes "
          f"({wbytes/1e9:.2f} GB)", flush=True)


def main():
    # timing-only weights, generated directly in their storage dtypes (an
    # f32 master at these dims is 7.6 GB and OOMs next to the variants)
    kw = jax.random.PRNGKey(1)
    w_q = jax.jit(lambda k: jax.random.randint(
        k, (N_LAYERS, DIN, DOUT), -127, 128, jnp.int8))(kw)
    scale = jnp.full((N_LAYERS, DOUT), 2e-4, jnp.float32)
    w_bf = jax.jit(lambda k: 0.02 * jax.random.normal(
        k, (N_LAYERS, DIN, DOUT), jnp.bfloat16))(kw)

    def scan_over(fn_one):
        def run(x, ws):
            def body(x, wl):
                y = fn_one(x, wl)
                # keep DIN width so every layer does the same-shape read
                return y[:, :DIN].astype(jnp.bfloat16), ()
            y, _ = jax.lax.scan(body, x, ws)
            return y
        return run

    # a) serving path today
    bench("a) astype-convert (serving)",
          scan_over(lambda x, wl: jnp.einsum(
              "bi,io->bo", x, wl[0].astype(x.dtype)) * wl[1].astype(x.dtype)),
          (w_q, scale), w_q.nbytes)
    # b) bf16 dense
    bench("b) bf16 dense",
          scan_over(lambda x, wl: jnp.einsum("bi,io->bo", x, wl)),
          w_bf, w_bf.nbytes)

    # c) w8a8 dynamic
    def w8a8(x, wl):
        w_q, scale = wl
        xa = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True),
                         1e-6).astype(jnp.float32)
        xs = xa / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs), -127,
                      127).astype(jnp.int8)
        acc = jax.lax.dot_general(xq, w_q, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * xs * scale[None, :]

    bench("c) w8a8 dynamic-activation", scan_over(w8a8),
          (w_q, scale), w_q.nbytes)

    # d/e: is the bottleneck the scan's dynamic weight slice?  XLA's
    # copy-insertion materializes a copy of each sliced layer weight
    # (`copy(p__dec_layers__..._w__)` in the round-4 OOM dump) -> 3x
    # traffic.  d) python-unrolled loop over a LIST of per-layer weights
    # (no slicing at all); e) lax.scan(unroll=full).
    w_list = [(w_q[i], scale[i]) for i in range(N_LAYERS)]

    def unrolled(x, ws):
        for wl in ws:
            y = jnp.einsum("bi,io->bo", x, wl[0].astype(x.dtype)) \
                * wl[1].astype(x.dtype)
            x = y[:, :DIN].astype(jnp.bfloat16)
        return x

    bench("d) python-unrolled int8", unrolled, w_list, w_q.nbytes)

    def scan_unroll(x, ws):
        def body(x, wl):
            y = jnp.einsum("bi,io->bo", x, wl[0].astype(x.dtype)) \
                * wl[1].astype(x.dtype)
            return y[:, :DIN].astype(jnp.bfloat16), ()
        y, _ = jax.lax.scan(body, x, ws, unroll=N_LAYERS)
        return y

    bench("e) scan(unroll=full) int8", scan_unroll, (w_q, scale), w_q.nbytes)

    def unrolled_bf(x, ws):
        for wl in ws:
            y = jnp.einsum("bi,io->bo", x, wl)
            x = y[:, :DIN].astype(jnp.bfloat16)
        return x

    w_bf_list = [w_bf[i] for i in range(N_LAYERS)]
    bench("f) python-unrolled bf16", unrolled_bf, w_bf_list, w_bf.nbytes)
    print("AB DONE", flush=True)


if __name__ == "__main__":
    main()
