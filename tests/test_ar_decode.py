"""AR decode path + generator wiring on a tiny SegOFA."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ifseg_tpu.config import model_config_for_arch
from ifseg_tpu.models.segofa import SegOFA, SegOFAVariables, build_generator


@pytest.fixture(scope="module")
def setup():
    cfg = model_config_for_arch(
        "segofa_tiny",
        encoder_embed_dim=32,
        encoder_ffn_embed_dim=64,
        encoder_layers=2,
        encoder_attention_heads=4,
        decoder_embed_dim=32,
        decoder_ffn_embed_dim=64,
        decoder_layers=2,
        decoder_attention_heads=4,
        resnet_type="resnet50",
        patch_image_size=32,
        orig_patch_image_size=32,
        num_seg_tokens=5,
        dropout=0.0,
        encoder_drop_path_rate=0.0,
        decoder_drop_path_rate=0.0,
        dtype="float32",
    )
    model, params = SegOFAVariables.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(4, 100, size=(1, 8)), jnp.int32)
    img = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
    enc = jax.jit(
        lambda p, s, im: model.apply(
            {"params": p}, method=lambda m, s_, im_: m.encoder.encode(s_, im_),
            s_=s, im_=im,
        )
    )(params, src, img)
    return cfg, model, params, enc


def test_ar_logits_shape_and_causality(setup):
    cfg, model, params, enc = setup
    rng = np.random.default_rng(1)
    prev = jnp.asarray(rng.integers(0, 5, size=(1, 6)), jnp.int32)
    prev = prev.at[:, 0].set(0)  # bos

    decode = jax.jit(
        lambda p, t: model.apply(
            {"params": p}, t, enc, method=lambda m, t_, e: m.decoder.decode_ar(t_, e)
        ),
        static_argnums=(),
    )
    logits = decode(params, prev)
    assert logits.shape == (1, 6, 5)

    # causality: changing a later token must not affect earlier logits
    prev2 = prev.at[:, 4].set((prev[:, 4] + 1) % 5)
    logits2 = decode(params, prev2)
    np.testing.assert_allclose(
        np.asarray(logits[:, :4]), np.asarray(logits2[:, :4]), atol=1e-5
    )
    assert np.abs(np.asarray(logits[:, 4:]) - np.asarray(logits2[:, 4:])).max() > 0


def test_generator_over_ar_model(setup):
    cfg, model, params, enc = setup
    gen = build_generator(
        model, params, enc, beam=2, max_len=4, min_len=4
    )
    out = gen(bsz=1, cache=gen.initial_cache)
    toks = np.asarray(out.tokens)[0, 0]
    # pinned length: bos + 4 class tokens + the synthetic EOS column
    # (= num_seg; class ids 0..num_seg-1 must all remain emittable)
    assert toks[5] == cfg.num_seg_tokens
    assert (toks[1:5] < cfg.num_seg_tokens).all()
    assert np.isfinite(np.asarray(out.scores)).all()
