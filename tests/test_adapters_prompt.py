"""Adapters, prefix prompt tuning, grouped cross-attention.

Reference semantics: unify_transformer_layer.py:49-94 (Adapter_Layer),
encoder_module.py:374-386 + :989-1027 (PromptEncoder / get_encoder_prompt),
unify_multihead_attention.py:453-459 (prompt_kv prepend) and :159-274
(grouped cross-attention when key_bsz != bsz).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ifseg_tpu.models.attention import MultiheadAttention
from ifseg_tpu.models.layers import Adapter, PromptEncoder


def test_adapter_math():
    d, down = 16, 4
    mod = Adapter(embed_dim=d, down_size=down)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, d)), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params, x)
    p = params["params"]
    expected = x + np.maximum(
        x @ p["down_proj"]["kernel"] + p["down_proj"]["bias"], 0.0
    ) @ p["up_proj"]["kernel"] + p["up_proj"]["bias"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_prompt_encoder_shapes():
    pe = PromptEncoder(length=7, embed_dim=32, num_layers=3, num_heads=4)
    params = pe.init({"params": jax.random.PRNGKey(0)}, deterministic=True)
    out = pe.apply(params, deterministic=True)
    assert out.shape == (3, 2, 4, 7, 8)
    pe2 = PromptEncoder(
        length=7, embed_dim=32, num_layers=3, num_heads=4, projection=True,
        proj_dim=16,
    )
    p2 = pe2.init({"params": jax.random.PRNGKey(0)}, deterministic=True)
    out2 = pe2.apply(p2, deterministic=True)
    assert out2.shape == (3, 2, 4, 7, 8)


def test_prompt_kv_prepend_matches_manual():
    """Attention with prompt_kv == manual softmax over [prompt_k ‖ k_proj(x)]."""
    rng = np.random.default_rng(1)
    b, l, d, h, p = 2, 6, 16, 4, 3
    hd = d // h
    x = jnp.asarray(rng.normal(size=(b, l, d)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(h, l, l)), jnp.float32)
    prompt_kv = jnp.asarray(rng.normal(size=(2, h, p, hd)), jnp.float32)

    mha = MultiheadAttention(d, h, scale_factor=2.0, scale_heads=True)
    params = mha.init(jax.random.PRNGKey(0), x, bias=bias)
    out = mha.apply(params, x, bias=bias, prompt_kv=prompt_kv)

    pp = params["params"]
    scaling = float(hd * 2.0) ** -0.5
    q = (x @ pp["q_proj"]["kernel"] + pp["q_proj"]["bias"]) * scaling
    k = x @ pp["k_proj"]["kernel"] + pp["k_proj"]["bias"]
    v = x @ pp["v_proj"]["kernel"] + pp["v_proj"]["bias"]
    q = np.asarray(q).reshape(b, l, h, hd)
    k = np.asarray(k).reshape(b, l, h, hd)
    v = np.asarray(v).reshape(b, l, h, hd)
    pk = np.broadcast_to(np.asarray(prompt_kv)[0].transpose(1, 0, 2), (b, p, h, hd) if False else (p, h, hd))
    pk = np.broadcast_to(np.asarray(prompt_kv)[0].transpose(1, 0, 2)[None], (b, p, h, hd))
    pv = np.broadcast_to(np.asarray(prompt_kv)[1].transpose(1, 0, 2)[None], (b, p, h, hd))
    k_full = np.concatenate([pk, k], axis=1)
    v_full = np.concatenate([pv, v], axis=1)
    logits = np.einsum("bqhd,bkhd->bhqk", q, k_full)
    # bias applies to the trailing real keys only (ref :464-465)
    logits[:, :, :, p:] += np.asarray(bias)[None]
    probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)
    attn = np.einsum("bhqk,bkhd->bqhd", np.asarray(probs), v_full)
    attn = attn * np.asarray(pp["c_attn"])[None, None, :, None]
    expected = attn.reshape(b, l, d) @ pp["out_proj"]["kernel"] + pp["out_proj"]["bias"]
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)


def test_grouped_cross_attention_matches_tiled():
    """query batch B*G over key batch B == tiling K/V G-fold (ref :159-274)."""
    rng = np.random.default_rng(2)
    bk, g, lq, lk, d, h = 2, 3, 4, 5, 16, 4
    q = jnp.asarray(rng.normal(size=(bk * g, lq, d)), jnp.float32)
    key = jnp.asarray(rng.normal(size=(bk, lk, d)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(h, lq, lk)), jnp.float32)
    kpm = jnp.asarray(rng.random(size=(bk, lk)) < 0.3)

    mha = MultiheadAttention(d, h, scale_factor=2.0, scale_heads=True)
    params = mha.init(jax.random.PRNGKey(0), q, key=key, bias=bias)
    grouped = mha.apply(params, q, key=key, bias=bias, key_padding_mask=kpm)
    tiled = mha.apply(
        params,
        q,
        key=jnp.repeat(key, g, axis=0),
        bias=bias,
        key_padding_mask=jnp.repeat(kpm, g, axis=0),
    )
    np.testing.assert_allclose(np.asarray(grouped), np.asarray(tiled), atol=1e-4)


def test_segofa_adapter_prompt_end_to_end():
    """Tiny SegOFA with --adapter --encoder-prompt --decoder-prompt: forward
    runs; the freeze mask trains exactly the prompt encoders + adapters."""
    from ifseg_tpu.config import model_config_for_arch
    from ifseg_tpu.models.segofa import SegOFAVariables
    from ifseg_tpu.train.optim import freeze_mask

    cfg = model_config_for_arch(
        "segofa_tiny",
        encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=2,
        encoder_attention_heads=4, decoder_embed_dim=32,
        decoder_ffn_embed_dim=64, decoder_layers=2, decoder_attention_heads=4,
        resnet_type="resnet50", patch_image_size=32, orig_patch_image_size=32,
        num_seg_tokens=4, dropout=0.0, encoder_drop_path_rate=0.0,
        decoder_drop_path_rate=0.0,
        adapter=True, adapter_dim=8,
        encoder_prompt=True, encoder_prompt_length=5,
        decoder_prompt=True, decoder_prompt_length=5,
        use_flash_attention=False, checkpoint_activations=False,
    )
    model, params = SegOFAVariables.init(cfg, jax.random.PRNGKey(0))
    assert "prompt_encoder" in params["encoder"]
    assert "prompt_encoder" in params["decoder"]
    assert "adapter" in params["encoder"]["layers_0"]

    logits, _ = model.apply(
        {"params": params},
        src_tokens=jnp.zeros((1, 8), jnp.int32),
        patch_images=jnp.zeros((1, 32, 32, 3), jnp.float32),
        bos_tokens=jnp.zeros((1, 1), jnp.int32),
        deterministic=True,
    )
    assert bool(jnp.all(jnp.isfinite(logits)))

    mask = freeze_mask(params, cfg)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    for path, trainable in flat:
        joined = "/".join(str(getattr(p, "key", p)) for p in path)
        expect = "prompt_encoder" in joined or "/adapter/" in f"/{joined}/"
        assert trainable == expect, (joined, trainable)


def test_convert_adapter_and_prompt_keys():
    """Torch adapter/prompt weights land in the flax tree (no silent skip)."""
    from ifseg_tpu.checkpoint.convert import convert_torch_state_dict

    d, down, p = 8, 4, 3
    rng = np.random.default_rng(3)
    sd = {
        "encoder.layers.0.adapter.down_proj.weight": rng.normal(size=(down, d)).astype(np.float32),
        "encoder.layers.0.adapter.down_proj.bias": np.zeros(down, np.float32),
        "encoder.layers.0.adapter.up_proj.weight": rng.normal(size=(d, down)).astype(np.float32),
        "encoder.layers.0.adapter.up_proj.bias": np.zeros(d, np.float32),
        "encoder.encoder_prompt_encoder.embedding.weight": rng.normal(size=(p, 2 * 2 * d)).astype(np.float32),
        "decoder.decoder_prompt_encoder.embedding.weight": rng.normal(size=(p, 2 * 2 * d)).astype(np.float32),
    }
    tree = convert_torch_state_dict(sd, target_vocab=16)
    ad = tree["encoder"]["layers_0"]["adapter"]
    np.testing.assert_allclose(
        ad["down_proj"]["kernel"],
        sd["encoder.layers.0.adapter.down_proj.weight"].T,
    )
    assert tree["encoder"]["prompt_encoder"]["embedding"]["embedding"].shape == (p, 4 * d)
    assert tree["decoder"]["prompt_encoder"]["embedding"]["embedding"].shape == (p, 4 * d)
