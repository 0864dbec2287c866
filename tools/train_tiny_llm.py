"""Train a tiny-but-real Qwen-config attendant LLM on synthetic dialogues.

Counterpart of train_tiny_stt.py / train_tiny_tts.py (VERDICT r2 item 2):
the real Qwen2.5-14B checkpoint (reference ``Cluster/InfernLLMWorker.py:64``)
is unfetchable offline, so this trains the SAME architecture code path
(``models/qwen.py``) and the SAME serving surface (ByteTokenizer + ChatML
``apply_chat_template`` + eos stop, ``serving/llm_engine.py``) on a
deterministic telephone-attendant policy whose vocabulary is the synthetic
spoken language (tools/speechlang.py WORDS) -- so AIA replies are speakable
by the tiny TTS and transcribable by the tiny STT, making the attendant
pipeline end-to-end real: barge-in context, ``<nothingtosay>``, metadata
first turn (reference ``Apps/AIAttendant/AIASession.py:109-154``).

Each training example is one serving-shaped generation: the ChatML prompt
for the context-so-far plus the assistant reply bytes plus eos (id 2), with
loss only on the reply+eos — exactly what ``LLMSession.textin`` asks the
engine to produce.

Writes to infernos_tpu/models/data/tiny_llm/: params.npz, config.json

Run:  python tools/train_tiny_llm.py [--steps 6000] [--eval-only]
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

from infernos_tpu.models import qwen
from infernos_tpu.models.npz_io import load_params, save_params
from infernos_tpu.models.tokenizers import ByteTokenizer
from infernos_tpu.serving.llm_engine import apply_chat_template
from tools.speechlang import WORDS

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(HERE, "infernos_tpu", "models", "data", "tiny_llm")

MAX_LEN = 384          # tokens (bytes) per example, input+target
EOS = 2                # ByteTokenizer eos id; engine stop token

SYSTEM_PROMPT = ("You are a helpful phone attendant. Be brief and "
                 "conversational.\nIf you have nothing to add, reply "
                 "exactly <nothingtosay>.")

DIGITS = "zero one two three four five six seven eight nine".split()
DEPTS = ["billing", "sales", "support"]

NOTHING = "<nothingtosay>"
INTERRUPTED = "<sentence interrupted>"


# -- the attendant policy (ground truth) --------------------------------------

def policy(user: str) -> str:
    """Deterministic attendant reply; vocabulary ⊆ speechlang WORDS (+ the
    two protocol markers) and every reply <=40 chars, so each one is a
    single sayable sentence for the tiny TTS (max_text_tokens=48)."""
    words = user.replace("<", " ").replace(">", " ").split()
    ws = set(words)
    if "incoming" in ws:
        return "hello this is the service team"
    digits = [w for w in words if w in DIGITS]
    for d in DEPTS:
        if d in ws:
            return f"will transfer you to {d} now"
    if "account" in ws and "number" in ws and not digits:
        return "please repeat my account number"
    if len(digits) >= 2:
        return "confirm number " + " ".join(digits[:3]) + " yes"
    if "goodbye" in ws or "thanks" in ws:
        return "thanks goodbye"
    if "agent" in ws or "manager" in ws:
        return "please wait for the agent now"
    if "cancel" in ws:
        return "will cancel that order now"
    if "status" in ws or "order" in ws:
        return "the order status is open today"
    if "hello" in ws or "morning" in ws or "evening" in ws:
        return "hello can help you"
    if INTERRUPTED in user or not words:
        return NOTHING
    return "can you repeat that please"


def _rand_utterance(rng: np.random.Generator, words=None) -> str:
    """User turns drawn from the same distribution the STT emits."""
    vocab = WORDS if words is None else words
    k = int(rng.integers(1, 7))
    return " ".join(vocab[int(rng.integers(0, len(vocab)))] for _ in range(k))


def _intent_utterance(rng: np.random.Generator) -> str:
    """Half the turns carry a recognizable intent so the policy's branches
    are all well represented."""
    kind = int(rng.integers(0, 8))
    if kind == 0:
        return f"transfer me to {DEPTS[int(rng.integers(0, 3))]} please"
    if kind == 1:
        n = int(rng.integers(2, 6))
        ds = " ".join(DIGITS[int(rng.integers(0, 10))] for _ in range(n))
        return f"my account number is {ds}"
    if kind == 2:
        return "check my account number please"
    if kind == 3:
        return "thanks goodbye"
    if kind == 4:
        return "can me speak with the manager"
    if kind == 5:
        return "cancel my order please"
    if kind == 6:
        return "what is my order status"
    return "hello good morning"


def make_dialogue(rng: np.random.Generator):
    """-> list of (context, reply) serving-shaped examples for one call."""
    name = WORDS[int(rng.integers(0, len(WORDS)))]
    number = "".join(str(int(rng.integers(0, 10)))
                     for _ in range(int(rng.integers(4, 8))))
    ctx = [{"role": "system", "content": SYSTEM_PROMPT},
           {"role": "user", "content": f"<incoming call from {name} ({number})>"}]
    examples = []
    n_turns = int(rng.integers(1, 4))
    for t in range(n_turns):
        reply = policy(ctx[-1]["content"])
        examples.append(([dict(m) for m in ctx], reply))
        ctx.append({"role": "assistant", "content": reply})
        roll = rng.random()
        if roll < 0.55:
            u = _intent_utterance(rng)
        elif roll < 0.95:
            u = _rand_utterance(rng)
        else:
            # unaudible-segment protocol turn (AIASession.text_in)
            u = (f"<unaudible duration={rng.uniform(5, 20):.1f} "
                 f"no_speech_probability={rng.uniform(0.5, 1.0):.2f}>")
        if rng.random() < 0.08:
            u = INTERRUPTED + "\n" + u
        ctx.append({"role": "user", "content": u})
    return examples


def encode_example(tok: ByteTokenizer, context, reply: str):
    """-> (ids [<=MAX_LEN], n_prompt) or None if too long."""
    prompt = apply_chat_template(context)          # ends <|im_start|>assistant\n
    pids = tok(prompt).tolist()
    rids = tok(reply).tolist() + [EOS]
    if len(pids) + len(rids) > MAX_LEN:
        return None
    return pids + rids, len(pids)


def assemble(tok: ByteTokenizer, exs):
    B = len(exs)
    toks = np.zeros((B, MAX_LEN), np.int32)
    tgt = np.zeros((B, MAX_LEN - 1), np.int32)
    mask = np.zeros((B, MAX_LEN - 1), np.float32)
    for i, (ids, np_) in enumerate(exs):
        toks[i, : len(ids)] = ids
        tgt[i, : len(ids) - 1] = ids[1:]
        mask[i, np_ - 1 : len(ids) - 1] = 1.0
    return toks, tgt, mask


def make_batch(rng, tok, batch):
    exs = []
    while len(exs) < batch:
        for ctx, reply in make_dialogue(rng):
            e = encode_example(tok, ctx, reply)
            if e is not None:
                exs.append(e)
            if len(exs) >= batch:
                break
    return assemble(tok, exs)


def tiny_config() -> qwen.QwenConfig:
    return qwen.QwenConfig(
        vocab_size=ByteTokenizer.vocab_size, hidden_size=192, num_layers=4,
        num_heads=4, num_kv_heads=2, head_dim=48, intermediate_size=512,
        rope_theta=10000.0, max_positions=512, eos_token_id=EOS,
        tie_word_embeddings=False)


# -- eval ---------------------------------------------------------------------

def greedy_replies(params, cfg, tok, contexts, max_new=48):
    """Lockstep batched greedy over ragged prompts with a FIXED-shape
    buffer (one compile, ``max_new`` dispatches total): per-row frontier
    indices into a right-padded [B, MAX_LEN] buffer; causality makes the
    padding past each row's frontier inert."""
    B = len(contexts)
    prompts = [tok(apply_chat_template(c)).astype(np.int32)
               for c in contexts]
    buf = np.zeros((B, MAX_LEN), np.int32)
    f = np.asarray([len(p) for p in prompts], np.int32)
    for i, p in enumerate(prompts):
        buf[i, : len(p)] = p

    @jax.jit
    def step(buf, f):
        logits, _, _ = qwen.prefill(params, cfg, buf)
        return jnp.argmax(
            logits[jnp.arange(buf.shape[0]), f - 1], axis=-1).astype(jnp.int32)

    done = np.zeros(B, bool)
    outs = [[] for _ in range(B)]
    for _ in range(max_new):
        nxt = np.asarray(step(jnp.asarray(buf), jnp.asarray(f)))
        for i in range(B):
            if done[i]:
                continue
            if int(nxt[i]) == EOS or f[i] >= MAX_LEN - 1:
                done[i] = True
                continue
            outs[i].append(int(nxt[i]))
            buf[i, f[i]] = nxt[i]
            f[i] += 1
        if done.all():
            break
    return [tok.detokenize(o) for o in outs]


def evaluate(params, cfg, tok, n_dialogues=20, seed=10_000):
    rng = np.random.default_rng(seed)
    pairs = [p for _ in range(n_dialogues) for p in make_dialogue(rng)]
    pairs = [p for p in pairs
             if encode_example(tok, p[0], p[1]) is not None]
    hyps = greedy_replies(params, cfg, tok, [c for c, _ in pairs])
    ok = sum(h == r for h, (_, r) in zip(hyps, pairs))
    for h, (_, r) in list(zip(hyps, pairs))[:6]:
        print(f"  ref: {r!r}\n  hyp: {h!r}")
    acc = ok / max(1, len(pairs))
    print(f"held-out reply exact-match: {acc:.3f} ({ok}/{len(pairs)})")
    return acc


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()

    tok = ByteTokenizer()
    cfg = tiny_config()
    rng = np.random.default_rng(a.seed)

    if a.eval_only:
        params = load_params(os.path.join(OUT, "params.npz"))
        assert params is not None, f"no checkpoint at {OUT}"
        evaluate(params, cfg, tok)
        return

    params = qwen.init_params(jax.random.PRNGKey(a.seed), cfg)
    warm = min(300, max(1, a.steps // 10))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, a.lr, warm, a.steps, a.lr * 0.02)
    opt = optax.adamw(sched, weight_decay=1e-4)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, toks, tgt, mask):
        def loss_fn(p):
            logits, _, _ = qwen.prefill(p, cfg, toks[:, :-1])
            ll = optax.softmax_cross_entropy_with_integer_labels(logits, tgt)
            return (ll * mask).sum() / jnp.maximum(mask.sum(), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def save(params):
        os.makedirs(OUT, exist_ok=True)
        save_params(os.path.join(OUT, "params.npz"), params)
        with open(os.path.join(OUT, "config.json"), "w") as f:
            json.dump({k: getattr(cfg, k) for k in cfg.__dataclass_fields__},
                      f, indent=2)

    t0 = time.time()
    for step in range(a.steps):
        toks, tgt, mask = make_batch(rng, tok, a.batch)
        params, opt_state, loss = train_step(
            params, opt_state, jnp.asarray(toks), jnp.asarray(tgt),
            jnp.asarray(mask))
        if step % 100 == 0 or step == a.steps - 1:
            print(f"step {step} loss {float(loss):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        if step and step % 1000 == 0:
            save(params)  # crash-resumable partial checkpoint

    save(params)
    print(f"saved to {OUT}")
    evaluate(params, cfg, tok)


if __name__ == "__main__":
    main()
