"""KV-cached incremental decode must match the full-prefix recompute."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ifseg_tpu.config import model_config_for_arch
from ifseg_tpu.models.ar_cache import ar_step, init_ar_cache
from ifseg_tpu.models.segofa import SegOFA, SegOFAVariables


def test_cached_matches_recompute():
    cfg = model_config_for_arch(
        "segofa_tiny",
        encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=2,
        encoder_attention_heads=4, decoder_embed_dim=32, decoder_ffn_embed_dim=64,
        decoder_layers=2, decoder_attention_heads=4, resnet_type="resnet50",
        patch_image_size=32, orig_patch_image_size=32, num_seg_tokens=5,
        dropout=0.0, encoder_drop_path_rate=0.0, decoder_drop_path_rate=0.0,
        dtype="float32",
    )
    model, params = SegOFAVariables.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(4, 100, size=(2, 8)), jnp.int32)
    img = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)

    enc = jax.jit(
        lambda p, s, im: model.apply(
            {"params": p}, method=lambda m, s_, im_: m.encoder.encode(s_, im_),
            s_=s, im_=im,
        )
    )(params, src, img)

    lmax = 6
    prev = jnp.asarray(rng.integers(0, 5, size=(2, lmax)), jnp.int32)
    prev = prev.at[:, 0].set(0)  # bos

    # reference: full-prefix recompute logits for every position
    full = jax.jit(
        lambda p, t: model.apply(
            {"params": p}, t, enc, method=lambda m, t_, e: m.decoder.decode_ar(t_, e)
        )
    )(params, prev)

    # cached: step through positions
    cache = init_ar_cache(cfg, params, enc, bsz=2, max_len=lmax)
    step_fn = jax.jit(
        lambda c, t, s: ar_step(cfg, params, c, t, s), static_argnums=()
    )
    for t in range(lmax):
        logits_t, cache = step_fn(cache, prev, jnp.int32(t))
        np.testing.assert_allclose(
            np.asarray(logits_t), np.asarray(full[:, t]), atol=3e-4, rtol=3e-4,
        )


def test_generator_cached_matches_recompute():
    from ifseg_tpu.models.segofa import build_generator

    cfg = model_config_for_arch(
        "segofa_tiny",
        encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=2,
        encoder_attention_heads=4, decoder_embed_dim=32, decoder_ffn_embed_dim=64,
        decoder_layers=2, decoder_attention_heads=4, resnet_type="resnet50",
        patch_image_size=32, orig_patch_image_size=32, num_seg_tokens=5,
        dropout=0.0, encoder_drop_path_rate=0.0, decoder_drop_path_rate=0.0,
        dtype="float32",
    )
    model, params = SegOFAVariables.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.integers(4, 100, size=(1, 8)), jnp.int32)
    img = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
    enc = model.apply(
        {"params": params}, method=lambda m, s_, im_: m.encoder.encode(s_, im_),
        s_=src, im_=img,
    )

    gen_c = build_generator(model, params, enc, beam=2, max_len=4, min_len=4,
                            use_kv_cache=True)
    out_c = gen_c(bsz=1, cache=gen_c.initial_cache)
    gen_r = build_generator(model, params, enc, beam=2, max_len=4, min_len=4,
                            use_kv_cache=False)
    out_r = gen_r(bsz=1, cache=())
    np.testing.assert_array_equal(
        np.asarray(out_c.tokens)[0, 0], np.asarray(out_r.tokens)[0, 0]
    )
    np.testing.assert_allclose(
        np.asarray(out_c.scores)[0, 0], np.asarray(out_r.scores)[0, 0], atol=1e-4
    )
