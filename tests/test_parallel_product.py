"""PP / EP / CP productization: flags route the real SegOFA through
parallel/{pipeline,moe,context}.py (VERDICT round-1 item 4; reference
model_parallel/models/pipeline_parallel_transformer/model.py:316-319 and
modules/base_layer.py:14-29 are flag-launchable the same way)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ifseg_tpu.config import Config, model_config_for_arch
from ifseg_tpu.parallel.mesh import MeshConfig, build_mesh, mesh_from_config, model_axis_size
from ifseg_tpu.parallel.plan import ParallelPlan, plan_from_config
from ifseg_tpu.models.segofa import SegOFA, SegOFAVariables

pytestmark = [pytest.mark.slow, pytest.mark.mesh]


def tiny_cfg(**kw):
    over = dict(
        encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=2,
        encoder_attention_heads=4, decoder_embed_dim=32,
        decoder_ffn_embed_dim=64, decoder_layers=2, decoder_attention_heads=4,
        resnet_type="resnet50", patch_image_size=32, orig_patch_image_size=32,
        num_seg_tokens=4, dropout=0.0, encoder_drop_path_rate=0.0,
        decoder_drop_path_rate=0.0, use_flash_attention=False,
        checkpoint_activations=False,
    )
    over.update(kw)
    return model_config_for_arch("segofa_tiny", **over)


def _inputs(b=2, s=32, src_len=8):
    rng = np.random.default_rng(0)
    return dict(
        src_tokens=jnp.asarray(rng.integers(4, 100, size=(b, src_len)), jnp.int32),
        patch_images=jnp.asarray(rng.normal(size=(b, s, s, 3)), jnp.float32),
        bos_tokens=jnp.zeros((b, 1), jnp.int32),
    )


def test_model_axis_exclusivity():
    from ifseg_tpu.config import DistributedConfig

    assert model_axis_size(DistributedConfig(tensor_parallel=2)) == 2
    assert model_axis_size(DistributedConfig(pipeline_parallel=4)) == 4
    assert model_axis_size(DistributedConfig(moe_experts=8)) == 8
    with pytest.raises(ValueError):
        model_axis_size(DistributedConfig(tensor_parallel=2, pipeline_parallel=2))


def test_context_parallel_matches_dense():
    """--context-parallel=2: ring attention output == dense forward."""
    # fp32: the ring and dense paths accumulate differently, so bf16
    # noise would swamp an equality check
    cfg = tiny_cfg(dtype="float32")
    mesh = build_mesh(MeshConfig(data_parallel=2, fsdp=2, tensor_parallel=2))
    plan = ParallelPlan(mesh=mesh, context_parallel=2)
    # encoder L = hw + src_len = 4 + 8 = 12 (even); decoder L = 1 + 4 = 5 (odd
    # -> decoder self-attn falls back to dense, which the equality also covers)
    model, params = SegOFAVariables.init(cfg, jax.random.PRNGKey(0), src_len=8,
                                         image_size=32)
    dense = SegOFA(cfg)
    cp = SegOFA(cfg, plan=plan)
    kw = _inputs(b=4, src_len=12)  # L = 4 + 12 = 16, divisible by 2
    out_dense, _ = jax.jit(
        lambda p, kw: dense.apply({"params": p}, deterministic=True, **kw)
    )(params, kw)
    out_cp, _ = jax.jit(
        lambda p, kw: cp.apply({"params": p}, deterministic=True, **kw)
    )(params, kw)
    np.testing.assert_allclose(
        np.asarray(out_cp, np.float32), np.asarray(out_dense, np.float32),
        atol=1e-4, rtol=1e-4,
    )


def test_pipeline_parallel_matches_dense():
    """--pipeline-parallel=2: GPipe over the layer stacks == dense forward."""
    cfg = tiny_cfg(dtype="float32")
    mesh = build_mesh(MeshConfig(data_parallel=2, fsdp=2, tensor_parallel=2))
    plan = ParallelPlan(mesh=mesh, pipeline_parallel=2, pipeline_chunks=2)
    model, params = SegOFAVariables.init(cfg, jax.random.PRNGKey(0), src_len=8,
                                         image_size=32)
    dense = SegOFA(cfg)
    pp = SegOFA(cfg, plan=plan)
    kw = _inputs(b=4, src_len=8)
    out_dense, _ = jax.jit(
        lambda p, kw: dense.apply({"params": p}, deterministic=True, **kw)
    )(params, kw)
    out_pp, _ = jax.jit(
        lambda p, kw: pp.apply({"params": p}, deterministic=True, **kw)
    )(params, kw)
    np.testing.assert_allclose(
        np.asarray(out_pp, np.float32), np.asarray(out_dense, np.float32),
        atol=1e-4, rtol=1e-4,
    )


def test_moe_forward_and_train_step():
    """--moe-experts=2: MoE FFN layers route through lax.all_to_all and train."""
    from ifseg_tpu.train.trainer import Trainer

    cfg = Config()
    cfg = cfg.replace(model=tiny_cfg())
    cfg.task.num_seg_tokens = 4
    cfg.distributed = dataclasses.replace(
        cfg.distributed, data_parallel=2, fsdp=2, moe_experts=2, moe_freq=2
    )
    mesh = mesh_from_config(cfg.distributed, devices=jax.devices())
    assert mesh.shape["model"] == 2

    rng = np.random.default_rng(0)
    tokens = rng.integers(4, 100, size=(5, 3)).astype(np.int32)
    lengths = rng.integers(1, 4, size=(5,)).astype(np.int32)
    trainer = Trainer(cfg, mesh, tokens, lengths, total_num_updates=4)
    trainer.init_state()
    # the 2nd layer of each stack is MoE (moe_freq=2)
    assert "moe" in trainer.state.params["encoder"]["layers_1"]
    assert "ffn" in trainer.state.params["encoder"]["layers_0"]

    b, s = 4, 32
    hw16 = (s // 16) ** 2
    batch = {
        "patch_images": rng.normal(size=(b, s, s, 3)).astype(np.float32),
        "src_tokens": rng.integers(4, 100, size=(b, 8)).astype(np.int32),
        "bos_tokens": np.zeros((b, 1), np.int32),
        "target": rng.integers(0, 4, size=(b, s, s)).astype(np.int32),
        "downsampled_target": rng.integers(0, 4, size=(b, hw16)).astype(np.int32),
        "aux_grid_ids": rng.integers(0, 4, size=(b, hw16)).astype(np.int32),
        "aux_target": rng.integers(0, 4, size=(b, s, s)).astype(np.int32),
    }
    logs = trainer.train_step(batch)
    assert np.isfinite(float(np.asarray(logs["loss"])))


def test_pipeline_parallel_train_step():
    """PP end-to-end through the Trainer: gradients flow through ppermute."""
    from ifseg_tpu.train.trainer import Trainer

    cfg = Config()
    cfg = cfg.replace(model=tiny_cfg())
    cfg.task.num_seg_tokens = 4
    cfg.distributed = dataclasses.replace(
        cfg.distributed, data_parallel=2, fsdp=2, pipeline_parallel=2
    )
    mesh = mesh_from_config(cfg.distributed, devices=jax.devices())

    rng = np.random.default_rng(0)
    tokens = rng.integers(4, 100, size=(5, 3)).astype(np.int32)
    lengths = rng.integers(1, 4, size=(5,)).astype(np.int32)
    trainer = Trainer(cfg, mesh, tokens, lengths, total_num_updates=4)
    trainer.init_state()

    b, s = 4, 32
    hw16 = (s // 16) ** 2
    batch = {
        "patch_images": rng.normal(size=(b, s, s, 3)).astype(np.float32),
        "src_tokens": rng.integers(4, 100, size=(b, 8)).astype(np.int32),
        "bos_tokens": np.zeros((b, 1), np.int32),
        "target": rng.integers(0, 4, size=(b, s, s)).astype(np.int32),
        "downsampled_target": rng.integers(0, 4, size=(b, hw16)).astype(np.int32),
        "aux_grid_ids": rng.integers(0, 4, size=(b, hw16)).astype(np.int32),
        "aux_target": rng.integers(0, 4, size=(b, s, s)).astype(np.int32),
    }
    l0 = float(np.asarray(trainer.train_step(batch)["loss"]))
    l1 = float(np.asarray(trainer.train_step(batch)["loss"]))
    assert np.isfinite(l0) and np.isfinite(l1)
    assert l1 < l0  # params actually updated through the pipeline


def test_plan_from_config_none_when_gspmd_only():
    from ifseg_tpu.config import DistributedConfig

    mesh = build_mesh(MeshConfig(data_parallel=4, fsdp=2, tensor_parallel=1))
    assert plan_from_config(DistributedConfig(tensor_parallel=1), mesh) is None
    plan = plan_from_config(DistributedConfig(context_parallel=2), mesh)
    assert plan is not None and plan.context_parallel == 2
