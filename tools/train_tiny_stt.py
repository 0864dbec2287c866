"""Train a tiny-but-real Whisper-config STT on the synthetic spoken
language (tools/speechlang.py).

The real whisper-large-v3 checkpoint (reference
``Cluster/InfernSTTWorker.py:25``) is unfetchable offline; random weights
make every e2e bench decode garbage (the 224-token artifact in PERF.md).
This trains the SAME architecture code path (``models/whisper.py``) at tiny
dims on (utterance, transcript) pairs with a real in-repo-trained BPE
tokenizer, until greedy transcripts round-trip -- so EOS fires from data,
loopback similarity is real, and turn latency is measured, not
extrapolated (VERDICT r2 item 2).

Writes to infernos_tpu/models/data/tiny_stt/:
    params.npz, config.json, tokenizer/{vocab.json,merges.txt}

Run:  python tools/train_tiny_stt.py [--steps 4000] [--eval-only]
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

from infernos_tpu.audio.mel import log_mel_np
from infernos_tpu.models import whisper as wsp
from infernos_tpu.models.bpe import ByteLevelBPE, train_bpe
from infernos_tpu.models.npz_io import load_params, save_params
from tools.speechlang import (SR, WORDS, make_utterance,
                              transcript_corpus)

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.environ.get("INFERNOS_TRAIN_OUT_STT") or \
    os.path.join(HERE, "infernos_tpu", "models", "data", "tiny_stt")

N_MELS = 80
MAX_SECONDS = 5.0
MAX_MEL_T = int(MAX_SECONDS * SR) // 160          # 500 frames
MAX_TGT = 48

# token layout: BPE merges first, then specials appended by train_bpe.
# The SERVING prompt format (stt_engine._build_prompt) is trained exactly:
# [<|startofprev|> ctx...] <|sot|> <|lang_XX|> <|transcribe|> <|nots|>,
# nospeech supervised at the sot position on silence examples (whisper
# semantics in miniature) so engine ns_prob and rolling context work.
#
# Language conditioning (round 4): the corpus is bilingual with confusable
# cognate pairs (for/por, ...); an unconditioned decoder snaps en words to
# their pt spellings ~30% of the time (check_bilingual en-side 68.75%,
# /tmp/q4_bilingual.log).  Real whisper solves this with per-language
# tokens (<|en|>/<|pt|>) and the LT legs KNOW their language
# (reference Cluster/InfernSTTWorker.py language arg), so training tags
# language-pure utterances with the matching lang token; a 10% code-mixed
# slice (random tag) keeps off-language words from collapsing entirely.
SPECIALS = ["<|sot|>", "<|eos|>", "<|nospeech|>", "<|pad|>",
            "<|lang_en|>", "<|transcribe|>", "<|notimestamps|>",
            "<|startofprev|>", "<|lang_pt|>"]


def build_tokenizer() -> ByteLevelBPE:
    """Byte-level BPE with NO merges (= char tokens through the real BPE
    code path): one letter gesture <-> one token keeps the audio-text
    alignment monotonic, which a 2-layer decoder learns far faster than
    word-merge alignment (measured: 12% word acc with 370-merge BPE vs
    char-level's clean convergence)."""
    corpus = transcript_corpus(3000, seed=7)
    return train_bpe(corpus, vocab_size=256, special_tokens=SPECIALS)


def tiny_config(tok: ByteLevelBPE) -> wsp.WhisperConfig:
    return wsp.WhisperConfig(
        vocab_size=tok.vocab_size, num_mel_bins=N_MELS, d_model=256,
        encoder_layers=2, encoder_attention_heads=4, decoder_layers=2,
        decoder_attention_heads=4, ffn_dim=768,
        max_source_positions=MAX_MEL_T // 2, max_target_positions=64,
        eos_token_id=tok.special["<|eos|>"],
        sot_token_id=tok.special["<|sot|>"],
        no_speech_token_id=tok.special["<|nospeech|>"])


def serving_prompt(tok: ByteLevelBPE, ctx=None, lang: str = "en"):
    """Exactly stt_engine._build_prompt's layout for transcribe mode."""
    sp = tok.special
    prompt = []
    if ctx:
        prompt = [sp["<|startofprev|>"]] + list(ctx)
    return prompt + [sp["<|sot|>"], sp[f"<|lang_{lang}|>"],
                     sp["<|transcribe|>"], sp["<|notimestamps|>"]]


def _noise(rng: np.random.Generator, seconds: float) -> np.ndarray:
    kind = rng.integers(0, 3)
    n = int(seconds * SR)
    t = np.arange(n) / SR
    if kind == 0:
        x = rng.standard_normal(n)
    elif kind == 1:
        x = np.sin(2 * np.pi * rng.uniform(200, 3000) * t)
        x += 0.2 * rng.standard_normal(n)
    else:
        x = 0.02 * rng.standard_normal(n)  # near-silence
    peak = np.abs(x).max() + 1e-9
    return (0.5 * x / peak).astype(np.float32)


def telephone_channel(audio16: np.ndarray) -> np.ndarray:
    """The serving path's channel: 16k -> 8k -> G.711 u-law -> 8k -> 16k
    (bandlimit + quantization noise).  Training through it removes the
    clean-audio domain shift the RTP leg would otherwise introduce."""
    from infernos_tpu.audio.codecs import G711Codec
    from infernos_tpu.audio.resample import resample

    codec = G711Codec()
    a8 = resample(audio16, 16000, 8000)
    a8 = codec.decode(codec.encode(a8))
    return resample(np.asarray(a8, np.float32).reshape(-1), 8000, 16000)


def make_example(rng: np.random.Generator, tok: ByteLevelBPE):
    """(mel [M, T], ids, sot_idx, is_silence)."""
    sp = tok.special
    is_silence = rng.random() < 0.08
    # language conditioning: 45% pure-en, 45% pure-pt (tagged truthfully),
    # 10% code-mixed with a random tag (prior robustness, see SPECIALS note)
    r = rng.random()
    lang = "en" if r < 0.45 else ("pt" if r < 0.9 else None)
    tag = lang or ("en" if rng.random() < 0.5 else "pt")
    ctx = None
    if not is_silence and rng.random() < 0.2:
        # rolling-context examples: a previous transcript prefixes the
        # prompt (engine keep_context path, reference STTSession :121)
        prev = transcript_corpus(1, seed=int(rng.integers(1 << 31)))[0]
        ctx = tok.encode(prev)[:10]
    while True:
        if is_silence:
            audio, text = _noise(rng, float(rng.uniform(0.5, 3.0))), ""
        else:
            audio, text = make_utterance(rng, n_words=(1, 4), lang=lang)
        prompt = serving_prompt(tok, ctx, lang=tag)
        ids = prompt + tok.encode(text) + [sp["<|eos|>"]]
        if (len(audio) <= int(MAX_SECONDS * SR) - 320
                and len(ids) <= MAX_TGT):
            break
        ctx = None  # retry shorter
    if rng.random() < 0.5:
        audio = telephone_channel(audio)
    mel = log_mel_np(audio, N_MELS)[0]
    sot_idx = len(prompt) - 4
    return mel, ids, sot_idx, is_silence


def assemble(examples, tok: ByteLevelBPE):
    """(mel [B,M,T], toks [B,L], tgt [B,L-1], mask [B,L-1]).

    ``tgt``/``mask`` are over input positions 0..L-2 predicting the next
    token: the sot position's target is <|lang_en|> (or <|nospeech|> for
    silence -- whisper's no-speech convention), prompt-internal positions
    are unsupervised, and text+eos positions are supervised normally."""
    sp = tok.special
    pad = sp["<|pad|>"]
    batch = len(examples)
    mels = np.zeros((batch, N_MELS, MAX_MEL_T), np.float32)
    toks = np.full((batch, MAX_TGT), pad, np.int32)
    tgt = np.full((batch, MAX_TGT - 1), pad, np.int32)
    mask = np.zeros((batch, MAX_TGT - 1), np.float32)
    for i, (m, ids, sot_idx, is_sil) in enumerate(examples):
        mels[i, :, : m.shape[1]] = m
        toks[i, : len(ids)] = ids
        tgt[i, : len(ids) - 1] = ids[1:]
        # supervise: sot position (lang vs nospeech), then text onward
        mask[i, sot_idx] = 1.0
        if is_sil:
            tgt[i, sot_idx] = sp["<|nospeech|>"]
        first_text = sot_idx + 3  # input pos of <|nots|> predicts 1st text tok
        mask[i, first_text : len(ids) - 1] = 1.0
    return mels, toks, tgt, mask


def make_batch(rng: np.random.Generator, tok: ByteLevelBPE, batch: int):
    return assemble([make_example(rng, tok) for _ in range(batch)], tok)


class DataServer:
    """Replay buffer refilled by worker threads (scipy/numpy release the
    GIL): training samples batches immediately while fresh augmented
    examples stream in, so the jit step, not synthesis, sets the pace.

    Once the buffer is full, refills THROTTLE (sleep per example): on a
    small host the unthrottled workers otherwise eat the CPU the training
    loop needs (measured: 190 s/100 steps vs 20 s with throttling)."""

    def __init__(self, tok: ByteLevelBPE, seed: int, size: int = 2048,
                 workers: int = 4, refresh_sleep: float = 0.1):
        import threading

        self.tok = tok
        self.size = size
        self.refresh_sleep = refresh_sleep
        self.buf: list = []
        self.lock = threading.Lock()
        self.stop = False
        self.generated = 0
        self.threads = [
            threading.Thread(target=self._fill, args=(seed + 31 * i,),
                             daemon=True)
            for i in range(workers)]
        for t in self.threads:
            t.start()

    def _fill(self, seed: int) -> None:
        import time as _t

        rng = np.random.default_rng(seed)
        while not self.stop:
            ex = make_example(rng, self.tok)
            with self.lock:
                full = len(self.buf) >= self.size
                if not full:
                    self.buf.append(ex)
                else:
                    self.buf[int(rng.integers(0, self.size))] = ex
                self.generated += 1
            if full:
                _t.sleep(self.refresh_sleep)

    def batch(self, rng: np.random.Generator, batch: int):
        import time as _t

        while True:
            with self.lock:
                if len(self.buf) >= max(batch, 256):
                    idx = rng.integers(0, len(self.buf), size=batch)
                    ex = [self.buf[i] for i in idx]
                    break
            _t.sleep(0.1)
        return assemble(ex, self.tok)

    def close(self) -> None:
        self.stop = True


def greedy_decode(params, cfg, tok, mel, max_new: int = MAX_TGT - 1,
                  lang: str = "en"):
    """Batched greedy from the SERVING prompt with a FIXED-shape token
    buffer (one compile: the decoder is causal, so positions past the
    frontier don't affect the frontier's logits)."""
    B = mel.shape[0]
    prompt = serving_prompt(tok, lang=lang)
    P = len(prompt)
    enc = wsp.encode(params, cfg, jnp.asarray(mel))

    @jax.jit
    def frontier_logits(buf, t):
        logits = wsp.decode_full(params, cfg, buf, enc)
        return jnp.argmax(logits[:, t - 1], axis=-1).astype(jnp.int32)

    buf = np.full((B, MAX_TGT), cfg.eos_token_id, np.int32)
    buf[:, :P] = prompt
    done = np.zeros(B, bool)
    for t in range(P, min(MAX_TGT, P + max_new)):
        nxt = np.asarray(frontier_logits(jnp.asarray(buf), t))
        nxt = np.where(done, cfg.eos_token_id, nxt)
        buf[:, t] = nxt
        done |= nxt == cfg.eos_token_id
        if done.all():
            break
    outs = []
    for row in buf:
        ids = []
        for tkn in row[P:]:
            if tkn == cfg.eos_token_id:
                break
            ids.append(int(tkn))
        outs.append(tok.decode(ids))
    return outs


def word_acc(hyps, refs) -> float:
    ok = tot = 0
    for h, r in zip(hyps, refs):
        hw, rw = h.split(), r.split()
        tot += len(rw)
        ok += sum(1 for a, b in zip(hw, rw) if a == b)
    return ok / max(1, tot)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=7000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--resume", action="store_true",
                    help="continue from OUT/params.npz (warm-restart "
                         "schedule) instead of re-initializing -- lets a "
                         "killed/half-schedule run keep its progress")
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()

    tok = build_tokenizer()
    cfg = tiny_config(tok)
    rng = np.random.default_rng(a.seed)

    if a.eval_only:
        params = load_params(os.path.join(OUT, "params.npz"))
        assert params is not None, f"no checkpoint at {OUT}"
    else:
        params = None
        if a.resume:
            params = load_params(os.path.join(OUT, "params.npz"))
            if params is not None:
                print(f"resuming from {OUT}/params.npz", flush=True)
        if params is None:
            params = wsp.init_params(jax.random.PRNGKey(a.seed), cfg)
        warm = min(300, max(1, a.steps // 10))
        sched = optax.warmup_cosine_decay_schedule(
            0.0, a.lr, warm, a.steps, a.lr * 0.02)
        opt = optax.adamw(sched, weight_decay=1e-4)
        opt_state = opt.init(params)

        @jax.jit
        def train_step(params, opt_state, mel, toks, tgt, mask):
            def loss_fn(p):
                enc = wsp.encode(p, cfg, mel)
                logits = wsp.decode_full(p, cfg, toks[:, :-1], enc)
                ll = optax.softmax_cross_entropy_with_integer_labels(
                    logits, tgt)
                return (ll * mask).sum() / jnp.maximum(mask.sum(), 1.0)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        def save(params):
            os.makedirs(os.path.join(OUT, "tokenizer"), exist_ok=True)
            with open(os.path.join(OUT, "corpus.json"), "w") as f:
                json.dump({"words": WORDS}, f)
            save_params(os.path.join(OUT, "params.npz"), params)
            with open(os.path.join(OUT, "config.json"), "w") as f:
                json.dump({k: getattr(cfg, k)
                           for k in cfg.__dataclass_fields__}, f, indent=2)
            tok.save(os.path.join(OUT, "tokenizer", "vocab.json"),
                     os.path.join(OUT, "tokenizer", "merges.txt"))
            with open(os.path.join(OUT, "special_tokens.json"), "w") as f:
                json.dump(tok.special, f, indent=2)

        server = DataServer(tok, seed=a.seed + 1)
        t0 = time.time()
        for step in range(a.steps):
            mel, toks, tgt, mask = server.batch(rng, a.batch)
            params, opt_state, loss = train_step(
                params, opt_state, jnp.asarray(mel), jnp.asarray(toks),
                jnp.asarray(tgt), jnp.asarray(mask))
            if step % 100 == 0 or step == a.steps - 1:
                print(f"step {step} loss {float(loss):.4f} "
                      f"buf {len(server.buf)} gen {server.generated} "
                      f"({time.time()-t0:.0f}s)", flush=True)
            if step and step % 1000 == 0:
                save(params)  # crash-resumable partial checkpoint
        server.close()

        save(params)
        print(f"saved to {OUT}")

    # held-out eval PER LANGUAGE SIDE (fresh rng stream; the mixed-corpus
    # mean hid a 68.75% en side behind a 94% average in round 4)
    erng = np.random.default_rng(a.seed + 10_000)
    for lang in ("en", "pt"):
        texts, mels = [], []
        while len(texts) < 12:
            audio, text = make_utterance(erng, n_words=(1, 4), lang=lang)
            if len(audio) > int(MAX_SECONDS * SR) - 320:
                continue
            if erng.random() < 0.5:
                audio = telephone_channel(audio)
            texts.append(text)
            mels.append(log_mel_np(audio, N_MELS)[0])
        mel = np.zeros((len(texts), N_MELS, MAX_MEL_T), np.float32)
        for i, m in enumerate(mels):
            mel[i, :, : m.shape[1]] = m
        hyps = greedy_decode(params, cfg, tok, mel, lang=lang)
        acc = word_acc(hyps, texts)
        print(f"held-out {lang} word accuracy: {acc:.3f}")
        for h, r in list(zip(hyps, texts))[:3]:
            print(f"  ref: {r!r}\n  hyp: {h!r}")


if __name__ == "__main__":
    main()
