"""SpeechT5-class text-to-speech model: text encoder + autoregressive
spectrogram decoder + postnet, in functional JAX.

Capability parity: this is the model inside the reference's TTS pipeline
(``HelloSippyTTSRT/HelloSippyRTPipe.py:152-180`` loads
``microsoft/speecht5_tts``-family checkpoints per language,
``Cluster/InfernTTSWorker.py:37-45``).  Architecture and numerics follow the
HF ``SpeechT5ForTextToSpeech`` computation exactly so pretrained checkpoints
port via :func:`port_from_hf` (golden-tested against random-init HF models
in ``tests/test_speecht5_parity.py``).

TPU-first design (contrast with the reference's per-step torch Python loop):

- the AR decode loop runs as a **slot-batched jitted step** over ``[B]``
  concurrent sessions with per-slot positions -- sessions join/leave a live
  batch by slot writes, never triggering recompilation (the reference's
  unfinished batch-merge, ``HelloSippyRTPipe.py:122-135``, solved here);
- KV caches are preallocated ``[L, B, H, Tmax, Dh]`` pytrees, donated
  through the step function;
- cross-attention K/V are precomputed once per session at join time
  (``precompute_cross_kv``), so steady-state decode touches the text encoder
  zero times.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import layers as L


@dataclasses.dataclass(frozen=True)
class SpeechT5Config:
    vocab_size: int = 81
    hidden_size: int = 768
    encoder_layers: int = 12
    encoder_attention_heads: int = 12
    encoder_ffn_dim: int = 3072
    decoder_layers: int = 6
    decoder_attention_heads: int = 12
    decoder_ffn_dim: int = 3072
    num_mel_bins: int = 80
    reduction_factor: int = 2
    speech_decoder_prenet_layers: int = 2
    speech_decoder_prenet_units: int = 256
    speech_decoder_prenet_dropout: float = 0.5
    speech_decoder_postnet_layers: int = 5
    speech_decoder_postnet_units: int = 256
    speech_decoder_postnet_kernel: int = 5
    speaker_embedding_dim: int = 512
    max_text_positions: int = 450
    max_speech_positions: int = 4000
    encoder_max_relative_position: int = 160
    pad_token_id: int = 1
    layer_norm_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.encoder_attention_heads


# -- init ---------------------------------------------------------------------

def _enc_layer_init(key, cfg: SpeechT5Config):
    ks = jax.random.split(key, 4)
    return {
        "attn": L.mha_init(ks[0], cfg.hidden_size),
        "ln1": L.layer_norm_init(cfg.hidden_size),
        "ffn": {
            "in": L.linear_init(ks[1], cfg.hidden_size, cfg.encoder_ffn_dim),
            "out": L.linear_init(ks[2], cfg.encoder_ffn_dim, cfg.hidden_size),
        },
        "ln2": L.layer_norm_init(cfg.hidden_size),
    }


def _dec_layer_init(key, cfg: SpeechT5Config):
    ks = jax.random.split(key, 5)
    return {
        "self_attn": L.mha_init(ks[0], cfg.hidden_size),
        "ln1": L.layer_norm_init(cfg.hidden_size),
        "cross_attn": L.mha_init(ks[1], cfg.hidden_size),
        "ln2": L.layer_norm_init(cfg.hidden_size),
        "ffn": {
            "in": L.linear_init(ks[2], cfg.hidden_size, cfg.decoder_ffn_dim),
            "out": L.linear_init(ks[3], cfg.decoder_ffn_dim, cfg.hidden_size),
        },
        "ln3": L.layer_norm_init(cfg.hidden_size),
    }


def stack_layers(layers):
    """Per-layer pytrees -> one pytree with a leading layer dim (model runs
    as ``lax.scan`` over layers for fast trace/compile)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def init_params(key, cfg: SpeechT5Config) -> Dict[str, Any]:
    n_keys = 10 + cfg.encoder_layers + cfg.decoder_layers + \
        cfg.speech_decoder_prenet_layers + cfg.speech_decoder_postnet_layers
    ks = list(jax.random.split(key, n_keys))

    def nk():
        return ks.pop()

    D = cfg.hidden_size
    prenet_sizes = [cfg.num_mel_bins] + [cfg.speech_decoder_prenet_units] * cfg.speech_decoder_prenet_layers
    post_sizes = (
        [cfg.num_mel_bins]
        + [cfg.speech_decoder_postnet_units] * (cfg.speech_decoder_postnet_layers - 1)
        + [cfg.num_mel_bins]
    )
    return {
        "text_embed": L.embedding_init(nk(), cfg.vocab_size, D, cfg.pad_token_id),
        "enc_pos_alpha": jnp.ones((), jnp.float32),
        "enc_rel_pos": L.embedding_init(nk(), 2 * cfg.encoder_max_relative_position, cfg.head_dim),
        "enc_ln": L.layer_norm_init(D),
        "enc_layers": stack_layers(
            [_enc_layer_init(nk(), cfg) for _ in range(cfg.encoder_layers)]),
        "dec_prenet": {
            "layers": [
                L.linear_init(nk(), prenet_sizes[i], prenet_sizes[i + 1])
                for i in range(cfg.speech_decoder_prenet_layers)
            ],
            "final": L.linear_init(nk(), cfg.speech_decoder_prenet_units, D),
            "pos_alpha": jnp.ones((), jnp.float32),
            "speaker": L.linear_init(nk(), cfg.speaker_embedding_dim + D, D),
        },
        "dec_layers": stack_layers(
            [_dec_layer_init(nk(), cfg) for _ in range(cfg.decoder_layers)]),
        "feat_out": L.linear_init(nk(), D, cfg.num_mel_bins * cfg.reduction_factor),
        "prob_out": L.linear_init(nk(), D, cfg.reduction_factor),
        "postnet": [
            {
                "conv": L.conv1d_init(nk(), post_sizes[i], post_sizes[i + 1],
                                      cfg.speech_decoder_postnet_kernel, bias=False),
                "bn": {
                    "g": jnp.ones((post_sizes[i + 1],), jnp.float32),
                    "b": jnp.zeros((post_sizes[i + 1],), jnp.float32),
                    "running_mean": jnp.zeros((post_sizes[i + 1],), jnp.float32),
                    "running_var": jnp.ones((post_sizes[i + 1],), jnp.float32),
                },
            }
            for i in range(cfg.speech_decoder_postnet_layers)
        ],
    }


# -- encoder ------------------------------------------------------------------

def _enc_layer(p, x, mask_bias, pos_bias, n_heads, eps):
    h = L.attention(p["attn"], x, n_heads=n_heads, mask=mask_bias, pos_bias=pos_bias)
    x = L.layer_norm(x + h, p["ln1"], eps)
    h = L.linear(jax.nn.gelu(L.linear(x, p["ffn"]["in"]), approximate=False), p["ffn"]["out"])
    return L.layer_norm(x + h, p["ln2"], eps)


def encode_text(params, cfg: SpeechT5Config, input_ids, attention_mask=None):
    """[B, S] int32 -> [B, S, D] encoder states.

    Text prenet (embed + scaled interleaved sinusoid) then the relative-
    position-bias transformer encoder (HF SpeechT5Encoder semantics).
    """
    B, S = input_ids.shape
    emb = params["text_embed"]["w"]
    pe = jnp.asarray(L.sinusoid_interleaved(cfg.max_text_positions, cfg.hidden_size)).astype(emb.dtype)
    x = emb[input_ids] + params["enc_pos_alpha"] * pe[:S]
    x = L.layer_norm(x, params["enc_ln"], cfg.layer_norm_eps)

    # relative position bias, shared by all layers
    pos = jnp.arange(S)
    rel = pos[:, None] - pos[None, :]
    rel = jnp.clip(rel, -cfg.encoder_max_relative_position, cfg.encoder_max_relative_position - 1)
    rel = rel + cfg.encoder_max_relative_position
    pos_bias = params["enc_rel_pos"]["w"][rel]  # [S, S, Dh]

    mask_bias = None
    if attention_mask is not None:
        mask_bias = L.pad_mask_to_bias(attention_mask, S)

    def body(x, lp):
        return _enc_layer(lp, x, mask_bias, pos_bias,
                          cfg.encoder_attention_heads, cfg.layer_norm_eps), None

    x, _ = jax.lax.scan(body, x, params["enc_layers"])
    return x


# -- decoder prenet -----------------------------------------------------------

def decoder_prenet(params, cfg: SpeechT5Config, mel_in, speaker_emb, *,
                   step_offset, dropout_rng=None):
    """[B, T, n_mels] + [B, spk_dim] -> [B, T, D] decoder inputs.

    Always-on consistent dropout (Tacotron2-style, HF
    ``SpeechT5SpeechDecoderPrenet._consistent_dropout``): one mask shared
    across the batch, keep-probability ``p``, scale ``1/(1-p)``.  Pass
    ``dropout_rng=None`` (or p=0) to disable for deterministic tests.

    ``step_offset``: [B] per-slot decoder position for the positional
    encoding (slots are at different timesteps).
    """
    p = params["dec_prenet"]
    x = mel_in
    for lp in p["layers"]:
        x = jax.nn.relu(L.linear(x, lp))
        dp = cfg.speech_decoder_prenet_dropout
        if dropout_rng is not None and dp > 0:
            dropout_rng, sub = jax.random.split(dropout_rng)
            mask = jax.random.bernoulli(sub, dp, x.shape[1:])
            x = jnp.where(mask[None], x, 0.0) / (1.0 - dp)
    x = L.linear(x, p["final"])
    pe = jnp.asarray(L.sinusoid_interleaved(cfg.max_speech_positions, cfg.hidden_size)).astype(x.dtype)
    T = x.shape[1]
    pos_idx = step_offset[:, None] + jnp.arange(T)[None, :]  # [B, T]
    x = x + p["pos_alpha"] * pe[pos_idx]
    if speaker_emb is not None:
        spk = speaker_emb / jnp.maximum(
            jnp.linalg.norm(speaker_emb, axis=-1, keepdims=True), 1e-12
        )
        spk = jnp.broadcast_to(spk[:, None, :], (x.shape[0], T, spk.shape[-1]))
        x = jax.nn.relu(L.linear(jnp.concatenate([x, spk], axis=-1), p["speaker"]))
    return x


# -- decoder ------------------------------------------------------------------

def decode_full(params, cfg: SpeechT5Config, dec_in, enc_out, enc_mask=None,
                return_cross_attn: bool = False):
    """Teacher-forced full-sequence decoder (parity tests / batch prefill).

    dec_in: [B, T, D] prenet outputs. Returns final hidden states [B, T, D];
    with ``return_cross_attn`` also the per-layer cross-attention weights
    ``[L, B, H, T, S]`` (guided-attention training / alignment diagnostics).
    """
    B, T, D = dec_in.shape
    H = cfg.decoder_attention_heads
    eps = cfg.layer_norm_eps
    causal = L.causal_bias(T)
    xmask = None
    if enc_mask is not None:
        xmask = L.pad_mask_to_bias(enc_mask, T)

    def body(x, lp):
        h = L.attention(lp["self_attn"], x, n_heads=H, mask=causal)
        x = L.layer_norm(x + h, lp["ln1"], eps)
        h, w = L.attention(lp["cross_attn"], x, enc_out, n_heads=H,
                           mask=xmask, return_probs=True)
        x = L.layer_norm(x + h, lp["ln2"], eps)
        h = L.linear(jax.nn.gelu(L.linear(x, lp["ffn"]["in"]), approximate=False), lp["ffn"]["out"])
        return L.layer_norm(x + h, lp["ln3"], eps), w if return_cross_attn else None

    x, ws = jax.lax.scan(body, dec_in, params["dec_layers"])
    if return_cross_attn:
        return x, ws
    return x


class DecoderCache(NamedTuple):
    """Slot-batched decoder state: KV caches + precomputed cross K/V."""

    self_k: jnp.ndarray  # [L, B, H, Tmax, Dh]
    self_v: jnp.ndarray
    cross_k: jnp.ndarray  # [L, B, H, S, Dh]
    cross_v: jnp.ndarray


def init_cache(cfg: SpeechT5Config, batch: int, max_steps: int, enc_len: int,
               dtype=jnp.float32) -> DecoderCache:
    Lyr, H, Dh = cfg.decoder_layers, cfg.decoder_attention_heads, cfg.head_dim
    z = lambda t: jnp.zeros((Lyr, batch, H, t, Dh), dtype)
    return DecoderCache(z(max_steps), z(max_steps), z(enc_len), z(enc_len))


def fill_cross_kv(params, cfg: SpeechT5Config, cache: DecoderCache, enc_out) -> DecoderCache:
    """Precompute cross-attention K/V for all slots (called at join time on
    the freshly encoded text, then sliced into the slot -- see engine)."""

    def body(_, lp):
        k, v = L.precompute_cross_kv(lp["cross_attn"], enc_out,
                                     n_heads=cfg.decoder_attention_heads)
        return None, (k, v)

    _, (ks, vs) = jax.lax.scan(body, None, params["dec_layers"])
    return cache._replace(cross_k=ks, cross_v=vs)


def decode_step(params, cfg: SpeechT5Config, x, cache: DecoderCache, pos,
                enc_mask=None) -> Tuple[jnp.ndarray, DecoderCache]:
    """One AR decoder step for all slots.

    x: [B, 1, D] prenet output; pos: [B] per-slot position.
    Returns ([B, 1, D] hidden, updated cache).
    """
    H = cfg.decoder_attention_heads
    eps = cfg.layer_norm_eps

    def body(x, layer):
        lp, k_l, v_l, ck_l, cv_l = layer
        h, k_c, v_c = L.attention_step(
            lp["self_attn"], x, n_heads=H, k_cache=k_l, v_cache=v_l, pos=pos,
        )
        x = L.layer_norm(x + h, lp["ln1"], eps)
        h = L.cross_attention_step(
            lp["cross_attn"], x, ck_l, cv_l, n_heads=H, kv_mask=enc_mask,
        )
        x = L.layer_norm(x + h, lp["ln2"], eps)
        h = L.linear(jax.nn.gelu(L.linear(x, lp["ffn"]["in"]), approximate=False), lp["ffn"]["out"])
        return L.layer_norm(x + h, lp["ln3"], eps), (k_c, v_c)

    x, (sk, sv) = jax.lax.scan(
        body, x, (params["dec_layers"], cache.self_k, cache.self_v,
                  cache.cross_k, cache.cross_v))
    cache = cache._replace(self_k=sk, self_v=sv)
    return x, cache


# -- heads / postnet ----------------------------------------------------------

def feat_and_prob(params, cfg: SpeechT5Config, hidden):
    """Decoder hidden [B, T, D] -> (mel [B, T*r, n_mels], stop logits [B, T*r])."""
    B, T, _ = hidden.shape
    mel = L.linear(hidden, params["feat_out"]).reshape(B, T * cfg.reduction_factor, cfg.num_mel_bins)
    logits = L.linear(hidden, params["prob_out"]).reshape(B, T * cfg.reduction_factor)
    return mel, logits


def postnet(params, cfg: SpeechT5Config, mel):
    """Residual conv refinement of [B, T, n_mels] (HF SpeechT5SpeechDecoderPostnet)."""
    x = mel
    pad = (cfg.speech_decoder_postnet_kernel - 1) // 2
    n = len(params["postnet"])
    for i, lp in enumerate(params["postnet"]):
        x = L.conv1d(x, lp["conv"], padding=pad)
        x = L.batch_norm_1d(x, lp["bn"])
        if i < n - 1:
            x = jnp.tanh(x)
    return mel + x


# -- HF weight porting ---------------------------------------------------------

def _t(x) -> jnp.ndarray:
    return jnp.asarray(np.asarray(x.detach().cpu().float().numpy()))


def _lin(mod) -> Dict[str, jnp.ndarray]:
    p = {"w": _t(mod.weight).T}
    if mod.bias is not None:
        p["b"] = _t(mod.bias)
    return p


def _mha(mod) -> Dict[str, Any]:
    return {"q": _lin(mod.q_proj), "k": _lin(mod.k_proj), "v": _lin(mod.v_proj),
            "o": _lin(mod.out_proj)}


def _ln(mod) -> Dict[str, jnp.ndarray]:
    return {"g": _t(mod.weight), "b": _t(mod.bias)}


def port_from_hf(model) -> Tuple[Dict[str, Any], SpeechT5Config]:
    """Port a ``transformers.SpeechT5ForTextToSpeech`` to our params pytree.

    Covers the checkpoints the reference uses per language
    (``Cluster/InfernTTSWorker.py:37-45``).
    """
    hc = model.config
    cfg = SpeechT5Config(
        vocab_size=hc.vocab_size,
        hidden_size=hc.hidden_size,
        encoder_layers=hc.encoder_layers,
        encoder_attention_heads=hc.encoder_attention_heads,
        encoder_ffn_dim=hc.encoder_ffn_dim,
        decoder_layers=hc.decoder_layers,
        decoder_attention_heads=hc.decoder_attention_heads,
        decoder_ffn_dim=hc.decoder_ffn_dim,
        num_mel_bins=hc.num_mel_bins,
        reduction_factor=hc.reduction_factor,
        speech_decoder_prenet_layers=hc.speech_decoder_prenet_layers,
        speech_decoder_prenet_units=hc.speech_decoder_prenet_units,
        speech_decoder_prenet_dropout=hc.speech_decoder_prenet_dropout,
        speech_decoder_postnet_layers=hc.speech_decoder_postnet_layers,
        speech_decoder_postnet_units=hc.speech_decoder_postnet_units,
        speech_decoder_postnet_kernel=hc.speech_decoder_postnet_kernel,
        speaker_embedding_dim=hc.speaker_embedding_dim,
        max_text_positions=hc.max_text_positions,
        max_speech_positions=hc.max_speech_positions,
        encoder_max_relative_position=hc.encoder_max_relative_position,
        pad_token_id=hc.pad_token_id,
    )
    enc = model.speecht5.encoder  # SpeechT5EncoderWithTextPrenet
    dec = model.speecht5.decoder  # SpeechT5DecoderWithSpeechPrenet
    wenc = enc.wrapped_encoder
    wdec = dec.wrapped_decoder
    prenet = dec.prenet
    post = model.speech_decoder_postnet

    params: Dict[str, Any] = {
        "text_embed": {"w": _t(enc.prenet.embed_tokens.weight)},
        "enc_pos_alpha": _t(enc.prenet.encode_positions.alpha),
        "enc_rel_pos": {"w": _t(wenc.embed_positions.pe_k.weight)},
        "enc_ln": _ln(wenc.layer_norm),
        "enc_layers": stack_layers([
            {
                "attn": _mha(l.attention),
                "ln1": _ln(l.layer_norm),
                "ffn": {"in": _lin(l.feed_forward.intermediate_dense),
                        "out": _lin(l.feed_forward.output_dense)},
                "ln2": _ln(l.final_layer_norm),
            }
            for l in wenc.layers
        ]),
        "dec_prenet": {
            "layers": [_lin(l) for l in prenet.layers],
            "final": _lin(prenet.final_layer),
            "pos_alpha": _t(prenet.encode_positions.alpha),
            "speaker": _lin(prenet.speaker_embeds_layer),
        },
        "dec_layers": stack_layers([
            {
                "self_attn": _mha(l.self_attn),
                "ln1": _ln(l.self_attn_layer_norm),
                "cross_attn": _mha(l.encoder_attn),
                "ln2": _ln(l.encoder_attn_layer_norm),
                "ffn": {"in": _lin(l.feed_forward.intermediate_dense),
                        "out": _lin(l.feed_forward.output_dense)},
                "ln3": _ln(l.final_layer_norm),
            }
            for l in wdec.layers
        ]),
        "feat_out": _lin(post.feat_out),
        "prob_out": _lin(post.prob_out),
        "postnet": [
            {
                # torch Conv1d weight [C_out, C_in, K] -> ours [K, C_in, C_out]
                "conv": {"w": _t(l.conv.weight).transpose(2, 1, 0)},
                "bn": {
                    "g": _t(l.batch_norm.weight),
                    "b": _t(l.batch_norm.bias),
                    "running_mean": _t(l.batch_norm.running_mean),
                    "running_var": _t(l.batch_norm.running_var),
                },
            }
            for l in post.layers
        ],
    }
    return params, cfg
