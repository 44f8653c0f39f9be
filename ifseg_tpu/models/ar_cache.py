"""KV-cached incremental autoregressive decoding.

The reference decoder caches per-layer K/V in ``incremental_state``
(decoder_module.py:680-862, unify_multihead_attention KV cache); here the
cache is an explicit functional pytree threaded through the generator's
``step_fn`` — the TPU-native shape for a static-length ``lax.scan`` decode:

  cache = init_ar_cache(cfg, params, encoder_out, bsz*beam, max_len)
  logits, cache = ar_step(cfg, params, cache, tokens, step)

Per step the new token attends over the cached keys/values (masked beyond
``step``), so cost is O(L) per step instead of the O(L^2) full-prefix
recompute of Decoder.decode_ar.  All batch-independent biases (abs position
q·k, per-layer token relative, cross bias to the encoder) are precomputed at
init.  Numerically equivalent to Decoder.decode_ar (tested).
"""

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ifseg_tpu.config import ModelConfig
from ifseg_tpu.models.position import (
    gather_rel_bias_all_layers,
    make_token_bucket_position,
)

NEG_INF = -1e9


def _ln(x, p):
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"]


def _dense(x, p):
    y = x @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    return y


class ARCache(NamedTuple):
    self_k: Any  # per-layer (B, Lmax, H, Dh)
    self_v: Any
    cross_k: Any  # per-layer (B, L_enc, H, Dh) — computed once
    cross_v: Any
    self_bias: jnp.ndarray  # (layers, H, Lmax, Lmax) precomputed
    cross_bias: jnp.ndarray  # (H, Lmax, L_enc)
    enc_out: jnp.ndarray  # (B, L_enc, D)
    enc_pad: jnp.ndarray  # (B, L_enc)


def init_ar_cache(
    cfg: ModelConfig, params, encoder_out: Dict[str, Any], bsz: int, max_len: int
) -> ARCache:
    # the cached step mirrors the DEFAULT decoder layer; configs that add
    # modules to the layer body must use the uncached decode_ar path
    unsupported = [
        flag for flag in ("decoder_prompt", "adapter", "scale_resids")
        if getattr(cfg, flag, False)
    ]
    if unsupported:
        raise NotImplementedError(
            f"KV-cached generation does not support {unsupported}; "
            "use use_kv_cache=False (decode_ar)"
        )
    dec = params["decoder"]
    heads = cfg.decoder_attention_heads
    d = cfg.decoder_embed_dim
    hd = d // heads
    enc = encoder_out["encoder_out"].astype(jnp.float32)
    n_layers = cfg.decoder_layers

    # batch-independent biases over the full generation length
    pos = _ln(jnp.take(dec["embed_positions"]["embedding"], jnp.arange(max_len), 0),
              dec["pos_ln"])
    scaling = float(hd * cfg.attn_scale_factor) ** -0.5
    q = (_dense(pos, dec["self_pos_q_linear"]) * scaling).reshape(max_len, heads, hd)
    k = _dense(pos, dec["self_pos_k_linear"]).reshape(max_len, heads, hd)
    self_bias0 = jnp.einsum("qhd,khd->hqk", q, k)
    token_bucket = make_token_bucket_position(cfg.token_bucket_size)[
        :max_len, :max_len
    ]
    tok_all = gather_rel_bias_all_layers(dec["token_rel_pos_table"], token_bucket)
    self_bias = self_bias0[None] + tok_all  # (layers, H, Lmax, Lmax)

    src_pos = encoder_out["position_embeddings"].astype(jnp.float32)
    cq = (_dense(pos, dec["cross_pos_q_linear"]) * scaling).reshape(max_len, heads, hd)
    ck = _dense(src_pos, dec["cross_pos_k_linear"]).reshape(-1, heads, hd)
    cross_bias = jnp.einsum("qhd,khd->hqk", cq, ck)

    self_k, self_v, cross_k, cross_v = [], [], [], []
    for i in range(n_layers):
        lp = dec[f"layers_{i}"]
        l_enc = enc.shape[1]
        ek = _dense(enc, lp["encoder_attn"]["k_proj"]).reshape(bsz, l_enc, heads, hd)
        ev = _dense(enc, lp["encoder_attn"]["v_proj"]).reshape(bsz, l_enc, heads, hd)
        cross_k.append(ek)
        cross_v.append(ev)
        self_k.append(jnp.zeros((bsz, max_len, heads, hd), jnp.float32))
        self_v.append(jnp.zeros((bsz, max_len, heads, hd), jnp.float32))

    return ARCache(
        self_k=self_k, self_v=self_v, cross_k=cross_k, cross_v=cross_v,
        self_bias=self_bias, cross_bias=cross_bias,
        enc_out=enc, enc_pad=encoder_out["encoder_padding_mask"],
    )


def _activation(cfg: "ModelConfig"):
    """Match the configured FFN activation (FeedForward in layers.py); the
    cached step must agree with the uncached decode_ar bit-for-bit."""
    name = getattr(cfg, "activation_fn", "gelu")
    if name in ("gelu", "gelu_exact"):
        return lambda v: jax.nn.gelu(v, approximate=False)
    if name == "gelu_tanh":
        return lambda v: jax.nn.gelu(v, approximate=True)
    if name == "gelu_poly":
        from ifseg_tpu.ops.gelu import gelu_poly

        return gelu_poly
    return getattr(jax.nn, name)


def _attend(q, k, v, bias, key_mask, c_attn, out_p):
    """q (B, H, Dh); k/v (B, L, H, Dh); bias (H, L); key_mask (B?, L) True=pad."""
    logits = jnp.einsum("bhd,blhd->bhl", q, k) + bias[None]
    logits = jnp.where(key_mask[:, None, :] if key_mask.ndim == 2 else key_mask,
                       NEG_INF, logits)
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhl,blhd->bhd", p, v)
    if c_attn is not None:
        out = out * c_attn[None, :, None]
    b, h, hd = out.shape
    return _dense(out.reshape(b, h * hd), out_p)


def ar_step(
    cfg: ModelConfig, params, cache: ARCache, tokens, step, embed_mode="seg"
) -> Tuple[jnp.ndarray, ARCache]:
    """tokens: (B, Lmax) generated so far; returns ((B, C) logits, cache)."""
    dec = params["decoder"]
    heads = cfg.decoder_attention_heads
    d = cfg.decoder_embed_dim
    hd = d // heads
    bsz, lmax = tokens.shape
    tok = jnp.take_along_axis(tokens, jnp.full((bsz, 1), step), axis=1)[:, 0]

    if embed_mode == "seg":
        vocab_emb = jnp.take(params["embed_tokens"]["embedding"], jnp.clip(tok, 0, None), 0)
        seg_emb = jnp.take(
            dec["seg_embed_tokens"], jnp.clip(tok, 0, cfg.num_seg_tokens - 1), 0
        )
        # position 0 holds BOS (a vocab token); later positions hold class ids
        x = jnp.where(step == 0, vocab_emb, seg_emb)
    else:
        x = jnp.take(params["embed_tokens"]["embedding"], tok, 0)
    x = x.astype(jnp.float32)
    if cfg.layernorm_embedding:
        x = _ln(x, dec["layernorm_embedding"])

    scaling = float(hd * cfg.attn_scale_factor) ** -0.5
    pos_mask = jnp.arange(lmax)[None, :] > step  # future positions masked
    new_self_k, new_self_v = [], []
    for i in range(cfg.decoder_layers):
        lp = dec[f"layers_{i}"]
        res = x
        y = _ln(x, lp["self_attn_layer_norm"])
        q = (_dense(y, lp["self_attn"]["q_proj"]) * scaling).reshape(bsz, heads, hd)
        k_new = _dense(y, lp["self_attn"]["k_proj"]).reshape(bsz, 1, heads, hd)
        v_new = _dense(y, lp["self_attn"]["v_proj"]).reshape(bsz, 1, heads, hd)
        sk = jax.lax.dynamic_update_slice_in_dim(cache.self_k[i], k_new, step, axis=1)
        sv = jax.lax.dynamic_update_slice_in_dim(cache.self_v[i], v_new, step, axis=1)
        new_self_k.append(sk)
        new_self_v.append(sv)
        bias_row = jax.lax.dynamic_slice_in_dim(
            cache.self_bias[i], step, 1, axis=1
        )[:, 0]  # (H, Lmax)
        y = _attend(
            q, sk, sv, bias_row, pos_mask, lp["self_attn"].get("c_attn"),
            lp["self_attn"]["out_proj"],
        )
        if "self_attn_ln" in lp:
            y = _ln(y, lp["self_attn_ln"])
        x = res + y

        res = x
        y = _ln(x, lp["encoder_attn_layer_norm"])
        q = (_dense(y, lp["encoder_attn"]["q_proj"]) * scaling).reshape(bsz, heads, hd)
        cbias_row = jax.lax.dynamic_slice_in_dim(
            cache.cross_bias, step, 1, axis=1
        )[:, 0]  # (H, L_enc)
        y = _attend(
            q, cache.cross_k[i], cache.cross_v[i], cbias_row, cache.enc_pad,
            lp["encoder_attn"].get("c_attn"), lp["encoder_attn"]["out_proj"],
        )
        if "cross_attn_ln" in lp:
            y = _ln(y, lp["cross_attn_ln"])
        x = res + y

        res = x
        y = _ln(x, lp["final_layer_norm"])
        y = _dense(y, lp["ffn"]["fc1"])
        y = _activation(cfg)(y)
        if "ffn_layernorm" in lp["ffn"]:
            y = _ln(y, lp["ffn"]["ffn_layernorm"])
        y = _dense(y, lp["ffn"]["fc2"])
        x = res + y

    x = _ln(x, dec["layer_norm"])
    head = dec["seg_embed_tokens"] if cfg.tie_seg_projection else dec["seg_projection"]
    logits = x @ head.T
    return logits, cache._replace(self_k=new_self_k, self_v=new_self_v)
