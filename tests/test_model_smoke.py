import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ifseg_tpu.config import ModelConfig
from ifseg_tpu.models import SegOFA, SegOFAVariables


def tiny_cfg(**kw):
    base = dict(
        encoder_embed_dim=64,
        encoder_ffn_embed_dim=128,
        encoder_layers=2,
        encoder_attention_heads=4,
        decoder_embed_dim=64,
        decoder_ffn_embed_dim=128,
        decoder_layers=2,
        decoder_attention_heads=4,
        resnet_type="resnet50",
        patch_image_size=64,  # grid 4x4
        orig_patch_image_size=64,
        num_seg_tokens=5,
        dtype="float32",
    )
    base.update(kw)
    return ModelConfig(**base)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_cfg()
    model, params = SegOFAVariables.init(
        cfg, jax.random.PRNGKey(0), src_len=12, image_size=64
    )
    return cfg, model, params


def test_forward_shapes_train_and_aux(tiny_model):
    cfg, model, params = tiny_model
    b, t = 2, 12
    hw = (cfg.patch_image_size // 16) ** 2

    @jax.jit
    def fwd(params):
        return model.apply(
            {"params": params},
            src_tokens=jnp.ones((b, t), jnp.int32) * 5,
            patch_images=jnp.zeros((b, 64, 64, 3), jnp.float32),
            patch_masks=jnp.ones((b,), bool),
            bos_tokens=jnp.zeros((b, 1), jnp.int32),
            aux_grid_ids=jnp.zeros((b, hw), jnp.int32),
            aux_src_tokens=jnp.ones((b, t), jnp.int32) * 5,
            class_tokens=jnp.ones((cfg.num_seg_tokens + 1, 3), jnp.int32),
            class_lengths=jnp.ones((cfg.num_seg_tokens + 1,), jnp.int32) * 2,
            deterministic=True,
        )

    logits, extra = fwd(params)
    assert logits.shape == (b, hw + 1, cfg.num_seg_tokens)
    assert extra["aux_output"].shape == (b, hw + 1, cfg.num_seg_tokens)
    assert np.isfinite(np.asarray(logits)).all()
    assert np.isfinite(np.asarray(extra["aux_output"])).all()


def test_eval_nonsquare_grid(tiny_model):
    """Eval keep-ratio resize produces non-square grids; pos/bias interpolation
    must handle (h, w) != (orig, orig)."""
    cfg, model, params = tiny_model
    b, t = 1, 12

    @jax.jit
    def fwd(params):
        return model.apply(
            {"params": params},
            src_tokens=jnp.ones((b, t), jnp.int32) * 5,
            patch_images=jnp.zeros((b, 96, 64, 3), jnp.float32),  # grid 6x4
            patch_masks=jnp.ones((b,), bool),
            bos_tokens=jnp.zeros((b, 1), jnp.int32),
            deterministic=True,
        )

    logits, extra = fwd(params)
    assert extra["encoder_returns"]["image_embed_shape"] == (6, 4)
    assert logits.shape == (b, 6 * 4 + 1, cfg.num_seg_tokens)
    assert np.isfinite(np.asarray(logits)).all()


def test_causal_vs_full_context_differ(tiny_model):
    cfg, model, params = tiny_model
    kwargs = dict(
        src_tokens=jnp.arange(8, dtype=jnp.int32)[None] + 4,
        patch_images=jnp.ones((1, 64, 64, 3), jnp.float32) * 0.1,
        patch_masks=jnp.ones((1,), bool),
        bos_tokens=jnp.zeros((1, 1), jnp.int32),
        deterministic=True,
    )

    @jax.jit
    def fwd(params, full):
        lc, _ = model.apply({"params": params}, **kwargs, full_context_alignment=False)
        lf, _ = model.apply({"params": params}, **kwargs, full_context_alignment=True)
        return lc, lf

    l_causal, l_full = fwd(params, True)
    assert not np.allclose(np.asarray(l_causal), np.asarray(l_full))


def test_dropout_rngs_apply():
    cfg = tiny_cfg(dropout=0.5)
    model, params = SegOFAVariables.init(
        cfg, jax.random.PRNGKey(0), src_len=8, image_size=64
    )
    kwargs = dict(
        src_tokens=jnp.arange(8, dtype=jnp.int32)[None] + 4,
        patch_images=jnp.ones((1, 64, 64, 3), jnp.float32) * 0.1,
        patch_masks=jnp.ones((1,), bool),
        bos_tokens=jnp.zeros((1, 1), jnp.int32),
    )

    @jax.jit
    def fwd(params, rng):
        l, _ = model.apply(
            {"params": params}, **kwargs, deterministic=False, rngs={"dropout": rng}
        )
        return l

    l1 = fwd(params, jax.random.PRNGKey(1))
    l2 = fwd(params, jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(l1), np.asarray(l2))
