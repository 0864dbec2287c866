"""Train the NeuralVAD on synthetic telephone audio (see synth_speech.py).

Silero's pretrained checkpoint (reference ``Core/VAD/SileroVAD.py:44-45``)
cannot be fetched under zero egress; this script trains the same-class
architecture (``infernos_tpu/models/vad.py``) from scratch on procedurally
generated speech/noise with exact labels, and writes the weights to
``infernos_tpu/models/data/vad_weights.npz`` (~0.4 MB), which
``models.vad.load_pretrained()`` picks up as the default VAD.

Run:  python tools/train_vad.py [--steps 1500] [--eval-only]
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

from infernos_tpu.models import vad as vad_m
from tools.synth_speech import SR, make_example

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "infernos_tpu", "models", "data", "vad_weights.npz")


def make_batch(rng, batch: int, n_windows: int, window: int):
    """[B, T, W] audio windows + [B, T] labels."""
    xs, ys = [], []
    seconds = n_windows * window / SR
    for _ in range(batch):
        a, l = make_example(rng, seconds, window)
        xs.append(a.reshape(n_windows, window))
        ys.append(l[:n_windows])
    return np.stack(xs), np.stack(ys)


def seq_apply(params, cfg, windows, state):
    """Scan apply() over the time axis. windows: [B, T, W] -> probs [B, T]."""

    def step(st, w_t):
        probs, st = vad_m.apply(params, cfg, w_t, st)
        return st, probs

    state, probs = jax.lax.scan(step, state, windows.transpose(1, 0, 2))
    return probs.T, state


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--windows", type=int, default=12)  # ~1.15 s sequences
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--eval-only", action="store_true")
    args = ap.parse_args()

    cfg = vad_m.VADConfig()
    rng = np.random.default_rng(args.seed)

    if args.eval_only:
        params = vad_m.load_pretrained()
        assert params is not None, "no trained weights at " + OUT
    else:
        params = vad_m.init_params(jax.random.PRNGKey(args.seed), cfg)

        opt = optax.adamw(args.lr, weight_decay=1e-5)
        opt_state = opt.init(params)

        @jax.jit
        def train_step(params, opt_state, windows, labels):
            def loss_fn(p):
                st = vad_m.init_state(cfg, windows.shape[0])
                probs, _ = seq_apply(p, cfg, windows, st)
                eps = 1e-6
                bce = -(labels * jnp.log(probs + eps)
                        + (1 - labels) * jnp.log(1 - probs + eps))
                return bce.mean(), probs

            (loss, probs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss, probs

        t0 = time.time()
        for step in range(args.steps):
            xw, yl = make_batch(rng, args.batch, args.windows, cfg.window)
            params, opt_state, loss, probs = train_step(
                params, opt_state, jnp.asarray(xw), jnp.asarray(yl))
            if step % 100 == 0 or step == args.steps - 1:
                acc = float((((np.asarray(probs) > 0.5) == yl)).mean())
                print(f"step {step:5d} loss {float(loss):.4f} "
                      f"acc {acc:.3f} ({time.time()-t0:.0f}s)")

        os.makedirs(os.path.dirname(OUT), exist_ok=True)
        flat = {}
        leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
        for path, leaf in leaves:
            flat[jax.tree_util.keystr(path)] = np.asarray(leaf)
        np.savez_compressed(OUT, **flat)
        print("saved", OUT, f"{os.path.getsize(OUT)/1e6:.2f} MB")
        params = vad_m.load_pretrained()
        assert params is not None

    # -- held-out eval vs EnergyVAD at low SNR ---------------------------------
    eval_rng = np.random.default_rng(args.seed + 1)
    n_eval = 64
    xw, yl = make_batch(eval_rng, n_eval, 24, cfg.window)
    st = vad_m.init_state(cfg, n_eval)
    probs, _ = jax.jit(lambda p, w, s: seq_apply(p, cfg, w, s))(
        params, jnp.asarray(xw), st)
    probs = np.asarray(probs)
    acc_n = float(((probs > 0.5) == yl).mean())

    ev = vad_m.EnergyVAD(n_eval)
    e_preds = np.stack([ev(xw[:, t]) for t in range(xw.shape[1])], axis=1)
    acc_e = float((e_preds == yl).mean())
    print(f"held-out window accuracy: neural {acc_n:.3f}  energy {acc_e:.3f}")


if __name__ == "__main__":
    main()
