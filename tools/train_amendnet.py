"""Train the AmendmentNetwork chunk smoother on synthetic boundary artifacts.

The reference ships a pretrained post-vocoder smoother
(``sobomax/speecht5-rt.post_vocoder.v2``, ``HelloSippyRTPipe.py:176``) that
hides seams between independently vocoded chunks.  That checkpoint cannot be
fetched under zero egress, so the same-architecture net
(``infernos_tpu/models/amendnet.py``) is trained here as a generic
boundary declicker: clean synthetic speech is corrupted with the artifact
classes chunked vocoding produces -- per-chunk gain steps, DC offsets, and
boundary clicks -- and the gain-mask net learns to cancel them given the
(clean) mel conditioning.  Weights land in
``infernos_tpu/models/data/amendnet_weights.npz``.

Run:  python tools/train_amendnet.py [--steps 1200]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from infernos_tpu.models import amendnet as amd
from tools.synth_speech import synth_speech

SR = 16000
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "infernos_tpu", "models", "data", "amendnet_weights.npz")


def mel_frames(audio: np.ndarray, n_mels: int, frame: int) -> np.ndarray:
    """Log-mel with hop == frame size, aligned 1:1 with audio frames."""
    n = len(audio) // frame
    win = np.hanning(frame * 2)
    pad = np.concatenate([np.zeros(frame // 2), audio[: n * frame],
                          np.zeros(frame * 2)])
    spec = np.stack([np.abs(np.fft.rfft(pad[i * frame : i * frame + 2 * frame] * win))
                     for i in range(n)])
    nf = spec.shape[1]
    # triangular mel-ish filterbank (log-spaced centers)
    centers = np.geomspace(2, nf - 2, n_mels + 2)
    fb = np.zeros((n_mels, nf), np.float32)
    for m in range(n_mels):
        lo, c, hi = centers[m], centers[m + 1], centers[m + 2]
        f = np.arange(nf)
        fb[m] = np.clip(np.minimum((f - lo) / (c - lo + 1e-9),
                                   (hi - f) / (hi - c + 1e-9)), 0, None)
    return np.log1p(spec @ fb.T).astype(np.float32)  # [n, n_mels]


def corrupt(rng: np.random.Generator, audio: np.ndarray, cfg) -> np.ndarray:
    """Inject chunk-boundary artifacts every ``chunk_frames`` frames."""
    fs, ck = cfg.frame_size, cfg.chunk_frames
    x = audio.copy()
    n_chunks = len(x) // (fs * ck)
    for c in range(n_chunks):
        s = c * fs * ck
        e = s + fs * ck
        g = 10 ** (rng.uniform(-1.5, 1.5) / 20)  # per-chunk gain step
        x[s:e] *= g
        x[s:e] += rng.uniform(-0.02, 0.02)  # DC offset
        if rng.random() < 0.7:  # boundary click / edge ramp
            w = int(rng.integers(8, 48))
            x[s : s + w] += (rng.uniform(-0.3, 0.3)
                             * np.hanning(2 * w)[:w].astype(np.float32))
    return np.clip(x, -1.0, 1.0)


def make_batch(rng, batch: int, cfg):
    """Training windows of (chunk + context) with clean targets."""
    fs, tf, ck, pre = cfg.frame_size, cfg.total_frames, cfg.chunk_frames, cfg.pre_frames
    mels, dirty, clean = [], [], []
    while len(mels) < batch:
        sp, _ = synth_speech(rng, 1.2, sr=SR)
        sp = (0.5 * sp).astype(np.float32)
        bad = corrupt(rng, sp, cfg)
        mel = mel_frames(sp, cfg.num_mels, fs)
        n_frames = min(len(sp) // fs, len(mel))
        # sample windows aligned to chunk boundaries
        max_start = n_frames - tf - 1
        if max_start <= pre:
            continue
        for _ in range(4):
            if len(mels) >= batch:
                break
            st = int(rng.integers(0, max_start // ck)) * ck
            fr = slice(st, st + tf)
            sm = slice(st * fs, (st + tf) * fs)
            mels.append(mel[fr])
            dirty.append(bad[sm])
            cs = (st + pre) * fs
            clean.append(sp[cs : cs + ck * fs])
    return (np.stack(mels), np.stack(dirty), np.stack(clean))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    cfg = amd.AmendNetConfig()
    rng = np.random.default_rng(args.seed)
    params = amd.init_params(jax.random.PRNGKey(args.seed), cfg)

    opt = optax.adamw(args.lr, weight_decay=1e-5)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, mel, dirty, clean):
        def loss_fn(p):
            out = amd.apply(p, cfg, mel, dirty)
            return jnp.mean(jnp.abs(out - clean))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.time()
    for step in range(args.steps):
        mel, dirty, clean = make_batch(rng, args.batch, cfg)
        params, opt_state, loss = train_step(
            params, opt_state, jnp.asarray(mel), jnp.asarray(dirty),
            jnp.asarray(clean))
        if step % 100 == 0 or step == args.steps - 1:
            print(f"step {step:5d} L1 {float(loss):.4f} ({time.time()-t0:.0f}s)",
                  flush=True)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        flat[jax.tree_util.keystr(path)] = np.asarray(leaf)
    np.savez_compressed(OUT, **flat)
    print("saved", OUT, f"{os.path.getsize(OUT)/1e6:.2f} MB")

    # -- held-out eval: does the net beat identity? ----------------------------
    ev = np.random.default_rng(args.seed + 1)
    mel, dirty, clean = make_batch(ev, 64, cfg)
    out = np.asarray(amd.apply(params, cfg, jnp.asarray(mel), jnp.asarray(dirty)))
    fs, pre, ck = cfg.frame_size, cfg.pre_frames, cfg.chunk_frames
    ident = dirty[:, pre * fs : (pre + ck) * fs]
    l1_net = float(np.abs(out - clean).mean())
    l1_id = float(np.abs(ident - clean).mean())
    print(f"held-out L1: amended {l1_net:.4f}  identity {l1_id:.4f} "
          f"({l1_id / max(l1_net, 1e-9):.2f}x better)")


if __name__ == "__main__":
    main()
