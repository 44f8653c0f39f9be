"""LAMB, composite groups, and the small optax-backed optimizers."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ifseg_tpu.train.optim import (
    _single_optimizer,
    build_optimizer,
    composite,
    fixed_schedule,
    lamb,
    parse_composite_groups,
)


def _opt_cfg(**kw):
    base = dict(
        lr=0.1, optimizer="adam", lr_scheduler="fixed", warmup_ratio=0.0,
        warmup_updates=0, weight_decay=0.0, adam_betas=(0.9, 0.999),
        adam_eps=1e-8, momentum=0.0, composite_groups="", composite_base="adam",
    )
    base.update(kw)
    return types.SimpleNamespace(**base)


def test_lamb_matches_reference_formula():
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    lr, b1, b2, eps, wd = 0.01, 0.9, 0.999, 1e-6, 0.01
    tx = lamb(fixed_schedule(lr), b1=b1, b2=b2, eps=eps, weight_decay=wd)
    state = tx.init({"w": p})
    upd, _ = tx.update({"w": g}, state, {"w": p})

    # hand-rolled apex FusedLAMB step 1
    m = (1 - b1) * np.asarray(g)
    v = (1 - b2) * np.asarray(g) ** 2
    mhat = m / (1 - b1)
    vhat = v / (1 - b2)
    u = mhat / (np.sqrt(vhat) + eps) + wd * np.asarray(p)
    trust = np.linalg.norm(np.asarray(p)) / np.linalg.norm(u)
    expect = -lr * trust * u
    np.testing.assert_allclose(np.asarray(upd["w"]), expect, rtol=1e-5)


def test_parse_composite_groups():
    gs = parse_composite_groups("encoder=sgd@0.5, decoder=lamb")
    assert gs == [("encoder", "sgd", 0.5), ("decoder", "lamb", None)]


def test_composite_routes_groups():
    params = {
        "encoder": {"w": jnp.ones((3,))},
        "decoder": {"w": jnp.ones((3,))},
        "head": {"w": jnp.ones((3,))},
    }
    grads = jax.tree_util.tree_map(lambda p: jnp.full_like(p, 0.5), params)
    cfg = _opt_cfg()
    tx = composite(
        params, parse_composite_groups("encoder=sgd@0.5,decoder=sgd@0.1"),
        "sgd", cfg, total_num_updates=10,
    )
    # base lr (head) = 0.1 from cfg.lr
    state = tx.init(params)
    upd, _ = tx.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(upd["encoder"]["w"]), -0.25, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(upd["decoder"]["w"]), -0.05, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(upd["head"]["w"]), -0.05, rtol=1e-6)


@pytest.mark.parametrize(
    "name", ["sgd", "nag", "adagrad", "adadelta", "adamax", "lamb"]
)
def test_single_optimizers_step(name):
    cfg = _opt_cfg(momentum=0.9)
    tx = _single_optimizer(name, fixed_schedule(0.01), cfg)
    p = {"w": jnp.ones((4,))}
    g = {"w": jnp.full((4,), 0.1)}
    state = tx.init(p)
    upd, state = tx.update(g, state, p)
    p2 = optax.apply_updates(p, upd)
    assert np.all(np.isfinite(np.asarray(p2["w"])))
    assert not np.allclose(np.asarray(p2["w"]), 1.0)


def test_build_optimizer_composite_on_real_tree():
    # composite over a realistic nested param tree through build_optimizer
    params = {
        "encoder": {"layers_0": {"fc": {"kernel": jnp.ones((2, 2))}}},
        "decoder": {"layers_0": {"fc": {"kernel": jnp.ones((2, 2))}}},
    }
    from ifseg_tpu.config import model_config_for_arch

    model_cfg = model_config_for_arch("segofa_tiny")
    cfg = _opt_cfg(optimizer="composite", composite_groups="decoder=sgd@0.2")
    tx, schedule, mask = build_optimizer(params, model_cfg, cfg, 10)
    g = jax.tree_util.tree_map(lambda p: jnp.full_like(p, 1.0), params)
    state = tx.init(params)
    upd, _ = tx.update(g, state, params)
    np.testing.assert_allclose(
        np.asarray(upd["decoder"]["layers_0"]["fc"]["kernel"]), -0.2, rtol=1e-6
    )
    # encoder went through fairseq_adam at base lr 0.1: step 1 update is
    # -lr * m_hat/(sqrt(v_hat)+eps) ~= -lr for constant grads
    enc = np.asarray(upd["encoder"]["layers_0"]["fc"]["kernel"])
    np.testing.assert_allclose(enc, -0.1, rtol=1e-3)


def test_parse_composite_groups_brace_quantifier():
    gs = parse_composite_groups("layers_[0-9]{1,2}=sgd@0.01,decoder=adam")
    assert gs == [("layers_[0-9]{1,2}", "sgd", 0.01), ("decoder", "adam", None)]


def test_freeze_embedding_does_not_freeze_seg_embed():
    """'embed_tokens' must match the exact path segment: the default-on
    embedding freezes must NOT catch decoder/seg_embed_tokens (the trainable
    segmentation head)."""
    import types

    import jax.numpy as jnp

    from ifseg_tpu.train.optim import freeze_mask

    params = {
        "embed_tokens": {"embedding": jnp.ones((8, 4))},
        "decoder": {"seg_embed_tokens": jnp.ones((5, 4))},
    }
    cfg = types.SimpleNamespace(
        bitfit=False, encoder_prompt=False, decoder_prompt=False, adapter=False,
        freeze_encoder_embedding=True, freeze_decoder_embedding=True,
        freeze_seg_embedding=False, freeze_entire_resnet=False,
        freeze_resnet=False, freeze_encoder_transformer=False,
        freeze_encoder_transformer_layers=0,
    )
    mask = freeze_mask(params, cfg)
    assert mask["embed_tokens"]["embedding"] is False
    assert mask["decoder"]["seg_embed_tokens"] is True
    # adapter mode freezes the shared embedding but not the seg head either
    cfg.adapter = True
    mask = freeze_mask(params, cfg)
    assert mask["embed_tokens"]["embedding"] is False
    assert mask["decoder"]["seg_embed_tokens"] is True
