"""Train a tiny-but-real SpeechT5-config TTS + HiFi-GAN vocoder on the
synthetic spoken language (tools/speechlang.py).

Counterpart of train_tiny_stt.py (VERDICT r2 item 2): the real per-language
SpeechT5 checkpoints (reference ``Cluster/InfernTTSWorker.py:37-45``) are
unfetchable offline, so this trains the SAME architecture code paths
(``models/speecht5.py``, ``models/hifigan.py``) at tiny dims until the
loopback (TTS -> audio -> tiny STT -> text) round-trips: stop tokens fire
from data, TTFB/turn latency is measured against real termination behavior,
and loopback QA similarity becomes meaningful.

Speakers: a fixed bank of 32 deterministic voices; the learned speaker
embedding table doubles as the serving speaker bank (reference's CMU-Arctic
xvector bank, ``HelloSippyRTPipe.py:181-183``).

Writes to infernos_tpu/models/data/tiny_tts/:
    t5_params.npz, voc_params.npz, speakers.npz, config.json,
    tokenizer/spiece.model

Run:  python tools/train_tiny_tts.py [--steps 3000] [--voc-steps 3000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import optax

from infernos_tpu.audio.mel import mel_filterbank
from infernos_tpu.models import hifigan as hfg
from infernos_tpu.models import speecht5 as st5
from infernos_tpu.models.npz_io import load_params, save_params
from infernos_tpu.models.spm import (SentencePieceModel, save_spm_model,
                                     train_char_spm)
from tools.speechlang import (SR, WORDS, Speaker, render_text,
                              transcript_corpus)

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.environ.get("INFERNOS_TRAIN_OUT_TTS") or \
    os.path.join(HERE, "infernos_tpu", "models", "data", "tiny_tts")

N_MELS = 80
N_FFT = 1024
HOP = 256          # = hifigan total_upsample; 16 ms per frame @ 16 k
MAX_TEXT = 48
MAX_FRAMES = 320   # mel frames (~5.1 s); decoder steps = /reduction_factor
N_SPEAKERS = 32
SPK_DIM = 64


def speaker_bank():
    return [Speaker.random(np.random.default_rng(7000 + i))
            for i in range(N_SPEAKERS)]


def mel80_np(wav: np.ndarray) -> np.ndarray:
    """[T_samples] -> [T_frames, 80] log10-mel (hop 256, win 1024 @16 k)."""
    n = (len(wav) // HOP) * HOP
    x = np.pad(wav[:n], (N_FFT // 2, N_FFT // 2), mode="reflect")
    n_frames = n // HOP
    idx = np.arange(N_FFT)[None, :] + HOP * np.arange(n_frames)[:, None]
    win = (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(N_FFT) / N_FFT))
    frames = x[idx] * win[None, :]
    spec = np.abs(np.fft.rfft(frames, axis=-1)) ** 2
    fb = mel_filterbank(N_MELS, N_FFT, SR, fmax=8000.0)
    mel = spec @ fb.T
    return np.log10(np.maximum(mel, 1e-7)).astype(np.float32)


def tiny_config(vocab: int) -> st5.SpeechT5Config:
    return st5.SpeechT5Config(
        vocab_size=vocab, hidden_size=256, encoder_layers=3,
        encoder_attention_heads=4, encoder_ffn_dim=768, decoder_layers=3,
        decoder_attention_heads=4, decoder_ffn_dim=768, num_mel_bins=N_MELS,
        reduction_factor=2, speech_decoder_prenet_layers=2,
        speech_decoder_prenet_units=128, speech_decoder_prenet_dropout=0.2,
        speech_decoder_postnet_layers=3, speech_decoder_postnet_units=128,
        speaker_embedding_dim=SPK_DIM, max_text_positions=MAX_TEXT,
        max_speech_positions=MAX_FRAMES)


def voc_config() -> hfg.HifiGanConfig:
    return hfg.HifiGanConfig(
        model_in_dim=N_MELS, upsample_initial_channel=128,
        upsample_rates=(8, 8, 2, 2), upsample_kernel_sizes=(16, 16, 4, 4),
        resblock_kernel_sizes=(3, 7), resblock_dilation_sizes=((1, 3), (1, 3)))


def make_example(rng: np.random.Generator, tok: SentencePieceModel,
                 speakers) -> tuple:
    """(ids, spk_id, mel [T,80], n_frames)."""
    words = transcript_corpus(1, seed=int(rng.integers(1 << 31)))[0]
    sid = int(rng.integers(0, N_SPEAKERS))
    while True:
        audio = render_text(rng, words, speakers[sid])
        if len(audio) <= MAX_FRAMES * HOP:
            break
        words = " ".join(words.split()[:-1])
    mel = mel80_np(audio)
    ids = tok.encode(words)[:MAX_TEXT]
    return ids, sid, mel, audio


def assemble(examples):
    B = len(examples)
    toks = np.zeros((B, MAX_TEXT), np.int32)
    tmask = np.zeros((B, MAX_TEXT), np.float32)
    spk = np.zeros((B,), np.int32)
    mels = np.zeros((B, MAX_FRAMES, N_MELS), np.float32)
    fmask = np.zeros((B, MAX_FRAMES), np.float32)
    stops = np.zeros((B, MAX_FRAMES), np.float32)
    for i, (ids, sid, mel, _audio) in enumerate(examples):
        toks[i, : len(ids)] = ids
        tmask[i, : len(ids)] = 1.0
        spk[i] = sid
        T = min(mel.shape[0], MAX_FRAMES)
        # keep T a multiple of reduction_factor
        T -= T % 2
        mels[i, :T] = mel[:T]
        mels[i, T:] = mel[:T].min()  # pad at the mel floor, not 0
        fmask[i, :T] = 1.0
        stops[i, T - 2 :] = 1.0  # stop fires on the last group onward
    return toks, tmask, spk, mels, fmask, stops


class DataServer:
    """Throttles refills once full so synthesis threads don't starve the
    training loop's host work (same rationale as train_tiny_stt)."""

    def __init__(self, tok, speakers, seed: int, size: int = 1536,
                 workers: int = 4, refresh_sleep: float = 0.1):
        import threading

        self.tok, self.speakers = tok, speakers
        self.size = size
        self.refresh_sleep = refresh_sleep
        self.buf: list = []
        self.lock = threading.Lock()
        self.stop = False
        self.generated = 0
        self.threads = [threading.Thread(target=self._fill,
                                         args=(seed + 31 * i,), daemon=True)
                        for i in range(workers)]
        for t in self.threads:
            t.start()

    def _fill(self, seed: int) -> None:
        import time as _t

        rng = np.random.default_rng(seed)
        while not self.stop:
            ex = make_example(rng, self.tok, self.speakers)
            with self.lock:
                full = len(self.buf) >= self.size
                if not full:
                    self.buf.append(ex)
                else:
                    self.buf[int(rng.integers(0, self.size))] = ex
                self.generated += 1
            if full:
                _t.sleep(self.refresh_sleep)

    def sample(self, rng: np.random.Generator, batch: int):
        import time as _t

        while True:
            with self.lock:
                if len(self.buf) >= max(batch, 192):
                    idx = rng.integers(0, len(self.buf), size=batch)
                    return [self.buf[i] for i in idx]
            _t.sleep(0.1)

    def close(self) -> None:
        self.stop = True


# -- SpeechT5 training --------------------------------------------------------

def train_t5(a, tok, speakers, server):
    cfg = tiny_config(tok.vocab_size)
    key = jax.random.PRNGKey(a.seed)
    params = st5.init_params(key, cfg)
    params["spk_table"] = 0.1 * jax.random.normal(
        jax.random.PRNGKey(a.seed + 5), (N_SPEAKERS, SPK_DIM))
    sched = optax.cosine_decay_schedule(a.lr, a.steps, alpha=0.05)
    opt = optax.adamw(sched, weight_decay=1e-4)
    opt_state = opt.init(params)
    r = cfg.reduction_factor

    @jax.jit
    def step_fn(params, opt_state, toks, tmask, spk, mels, fmask, stops, rng,
                p_ss):
        rng_d1, rng_d2, rng_ss = jax.random.split(rng, 3)

        def fwd(p, mel_in, spk_emb, enc, drng):
            dec_in = st5.decoder_prenet(
                p, cfg, mel_in, spk_emb,
                step_offset=jnp.zeros((toks.shape[0],), jnp.int32),
                dropout_rng=drng)
            hid, xattn = st5.decode_full(p, cfg, dec_in, enc, enc_mask=tmask,
                                         return_cross_attn=True)
            mel_b, stop_logits = st5.feat_and_prob(p, cfg, hid)
            return mel_b, st5.postnet(p, cfg, mel_b), stop_logits, xattn

        def loss_fn(p):
            enc = st5.encode_text(p, cfg, toks, attention_mask=tmask)
            B, T = mels.shape[:2]
            Td = T // r
            # decoder input at group t = last mel frame of group t-1
            prev = mels[:, r - 1 :: r][:, : Td - 1]
            gt_in = jnp.concatenate(
                [jnp.zeros((B, 1, N_MELS), mels.dtype), prev], axis=1)
            spk_emb = p["spk_table"][spk]
            # scheduled sampling (exposure-bias fix, two-pass): pass 1
            # teacher-forced; pass 2 feeds pass-1 PREDICTIONS at a ramping
            # fraction of positions, so free-running decode stays on the
            # manifold it was trained on
            mel_b1, mel_a1, _, _ = fwd(p, gt_in, spk_emb, enc, rng_d1)
            pred_prev = jax.lax.stop_gradient(
                mel_a1.reshape(B, Td, r, N_MELS)[:, : Td - 1, r - 1])
            use_pred = (jax.random.uniform(rng_ss, (B, Td - 1, 1))
                        < p_ss).astype(mels.dtype)
            mix_prev = pred_prev * use_pred + prev * (1.0 - use_pred)
            mel_in = jnp.concatenate(
                [jnp.zeros((B, 1, N_MELS), mels.dtype), mix_prev], axis=1)
            mel_b, mel_a, stop_logits, xattn = fwd(
                p, mel_in, spk_emb, enc, rng_d2)
            fm = fmask[:, :, None]
            denom = jnp.maximum(fmask.sum(), 1.0)
            # guided attention (Tachibana et al. 2017): penalize cross-attn
            # mass far from the diagonal t/Td ~ s/S.  This is what keeps a
            # tiny decoder aligned on long prompts instead of collapsing to
            # a repeated gesture (round-3 loopback failure mode).
            gmask = fmask[:, r - 1 :: r]                       # [B, Td]
            td_len = jnp.maximum(gmask.sum(-1, keepdims=True), 1.0)
            s_len = jnp.maximum(tmask.sum(-1, keepdims=True), 1.0)
            t_pos = jnp.arange(Td, dtype=jnp.float32)[None, :] / td_len
            s_pos = (jnp.arange(toks.shape[1], dtype=jnp.float32)[None, :]
                     / s_len)
            dist = t_pos[:, :, None] - s_pos[:, None, :]       # [B, Td, S]
            wga = 1.0 - jnp.exp(-(dist * dist) / (2.0 * 0.2 ** 2))
            vmask = gmask[:, :, None] * tmask[:, None, :].astype(jnp.float32)
            ga_num = (xattn.astype(jnp.float32)
                      * (wga * vmask)[None, :, None]).sum()
            # per-query normalization: each attn row sums to 1, so this is
            # the mean off-diagonal mass per (layer, head, valid position)
            l_ga = ga_num / jnp.maximum(
                gmask.sum() * xattn.shape[0] * xattn.shape[2], 1.0)
            l_b = (jnp.abs(mel_b - mels) * fm).sum() / (denom * N_MELS)
            l_a = (jnp.abs(mel_a - mels) * fm).sum() / (denom * N_MELS)
            l_b1 = (jnp.abs(mel_b1 - mels) * fm).sum() / (denom * N_MELS)
            l_a1 = (jnp.abs(mel_a1 - mels) * fm).sum() / (denom * N_MELS)
            # stop BCE: positive class upweighted (rare)
            sl = optax.sigmoid_binary_cross_entropy(stop_logits, stops)
            w = 1.0 + 4.0 * stops
            l_s = (sl * w * fmask).sum() / denom
            loss = (l_b + l_a + 0.5 * (l_b1 + l_a1) + 0.5 * l_s
                    + 2.0 * l_ga)
            return loss, (l_b, l_a, l_s, l_ga)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    rng = np.random.default_rng(a.seed)
    t0 = time.time()
    key = jax.random.PRNGKey(a.seed + 99)
    for step in range(a.steps):
        batch = assemble(server.sample(rng, a.batch))
        key, sub = jax.random.split(key)
        # scheduled-sampling ramp: pure teacher forcing for the first
        # quarter, then up to 50% predicted-frame feeding
        p_ss = min(0.5, max(0.0, (step / a.steps - 0.25) / 0.75) * 0.5)
        params, opt_state, loss, aux = step_fn(
            params, opt_state, *[jnp.asarray(x) for x in batch], sub,
            jnp.float32(p_ss))
        if step % 100 == 0 or step == a.steps - 1:
            lb, la, ls, lg = [float(x) for x in aux]
            print(f"t5 step {step} loss {float(loss):.4f} "
                  f"(pre {lb:.4f} post {la:.4f} stop {ls:.4f} "
                  f"ga {lg:.4f} ss {p_ss:.2f}) buf {len(server.buf)} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    return params, cfg


# -- vocoder training ---------------------------------------------------------

def _stft_mag(x, n_fft: int, hop: int):
    """[B, T] -> [B, F, n_fft//2+1] magnitudes (jittable)."""
    pad = n_fft // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (x.shape[1] - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    win = jnp.asarray(
        (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft))
        .astype(np.float32))
    frames = x[:, idx] * win[None, None, :]
    return jnp.abs(jnp.fft.rfft(frames, axis=-1))


def train_vocoder(a, server):
    vcfg = voc_config()
    key = jax.random.PRNGKey(a.seed + 17)
    params = hfg.init_params(key, vcfg)
    # mel normalization stats from the data (normalize_before path)
    ex = server.sample(np.random.default_rng(a.seed + 3), 64)
    cat = np.concatenate([m for (_, _, m, _) in ex], axis=0)
    params["mean"] = jnp.asarray(cat.mean(axis=0))
    params["scale"] = jnp.asarray(cat.std(axis=0) + 1e-4)
    sched = optax.cosine_decay_schedule(a.voc_lr, a.voc_steps, alpha=0.05)
    opt = optax.adamw(sched, weight_decay=1e-5)
    opt_state = opt.init(params)
    CROP = 64  # mel frames per training crop (= 16384 samples)

    @jax.jit
    def step_fn(params, opt_state, mel, wav):
        def loss_fn(p):
            pred = hfg.apply(p, vcfg, mel)  # [B, CROP*256]
            total = 0.0
            for n_fft, hop in ((512, 128), (1024, 256), (2048, 512)):
                mp = _stft_mag(pred, n_fft, hop)
                mt = _stft_mag(wav, n_fft, hop)
                sc = jnp.linalg.norm(mt - mp) / jnp.maximum(
                    jnp.linalg.norm(mt), 1e-6)
                lm = jnp.abs(jnp.log(jnp.maximum(mt, 1e-5))
                             - jnp.log(jnp.maximum(mp, 1e-5))).mean()
                total = total + sc + lm
            total = total + 10.0 * jnp.abs(pred - wav).mean() * 0.0
            return total

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(a.seed + 23)
    t0 = time.time()
    for step in range(a.voc_steps):
        ex = server.sample(rng, a.voc_batch)
        mels = np.zeros((len(ex), CROP, N_MELS), np.float32)
        wavs = np.zeros((len(ex), CROP * HOP), np.float32)
        for i, (_, _, mel, audio) in enumerate(ex):
            T = min(mel.shape[0], len(audio) // HOP)
            if T <= CROP:
                mels[i, :T] = mel[:T]
                wavs[i, : T * HOP] = audio[: T * HOP]
            else:
                o = int(rng.integers(0, T - CROP))
                mels[i] = mel[o : o + CROP]
                wavs[i] = audio[o * HOP : (o + CROP) * HOP]
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.asarray(mels), jnp.asarray(wavs))
        if step % 100 == 0 or step == a.voc_steps - 1:
            print(f"voc step {step} loss {float(loss):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    return params, vcfg


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--voc-steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--voc-batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--voc-lr", type=float, default=2e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--part", choices=["t5", "voc", "all"], default="all")
    a = ap.parse_args()

    corpus = transcript_corpus(2000, seed=11)
    tok = train_char_spm(corpus)
    speakers = speaker_bank()
    server = DataServer(tok, speakers, seed=a.seed + 1)
    os.makedirs(os.path.join(OUT, "tokenizer"), exist_ok=True)
    save_spm_model(tok, os.path.join(OUT, "tokenizer", "spiece.model"))
    with open(os.path.join(OUT, "corpus.json"), "w") as f:
        json.dump({"words": WORDS}, f)

    if a.part in ("t5", "all"):
        params, cfg = train_t5(a, tok, speakers, server)
        spk_table = np.asarray(params.pop("spk_table"))
        save_params(os.path.join(OUT, "t5_params.npz"), params)
        np.savez(os.path.join(OUT, "speakers.npz"), table=spk_table)
        with open(os.path.join(OUT, "config.json"), "w") as f:
            json.dump({k: getattr(cfg, k) for k in cfg.__dataclass_fields__},
                      f, indent=2)
        print(f"saved t5 to {OUT}")
    if a.part in ("voc", "all"):
        vparams, vcfg = train_vocoder(a, server)
        save_params(os.path.join(OUT, "voc_params.npz"), vparams)
        with open(os.path.join(OUT, "voc_config.json"), "w") as f:
            json.dump({k: getattr(vcfg, k) for k in vcfg.__dataclass_fields__},
                      f, indent=2, default=list)
        print(f"saved vocoder to {OUT}")
    server.close()


if __name__ == "__main__":
    main()
