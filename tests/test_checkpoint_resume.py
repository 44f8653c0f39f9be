"""Checkpoint save -> restore -> continue == continuous training
(the reference's test_reproducibility / test_train resume-semantics analog)."""

import numpy as np
import pytest

import jax

from ifseg_tpu.benchmark.dummy_seg import DummySegTask, dummy_seg_batch
from ifseg_tpu.checkpoint.manager import CheckpointManager
from ifseg_tpu.config import CheckpointConfig, Config, model_config_for_arch
from ifseg_tpu.parallel.mesh import MeshConfig, build_mesh
from ifseg_tpu.train.trainer import Trainer


def tiny_cfg():
    cfg = Config()
    cfg = cfg.replace(
        model=model_config_for_arch(
            "segofa_tiny",
            encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=2,
            encoder_attention_heads=4, decoder_embed_dim=32,
            decoder_ffn_embed_dim=64, decoder_layers=2,
            decoder_attention_heads=4, resnet_type="resnet50",
            patch_image_size=32, orig_patch_image_size=32, num_seg_tokens=4,
            dropout=0.0, encoder_drop_path_rate=0.0, decoder_drop_path_rate=0.0,
            dtype="float32",
        )
    )
    cfg.task.num_seg_tokens = 4
    cfg.task.patch_image_size = 32
    cfg.optimization.lr = 1e-3
    # monitoring off: halves the test's compile time
    cfg.criterion.unsupervised_segmentation = True
    return cfg


def make_trainer(cfg, task):
    mesh = build_mesh(MeshConfig(data_parallel=2))
    t = Trainer(cfg, mesh, task.class_tokens, task.class_lengths, total_num_updates=10)
    t.init_state()
    return t


@pytest.mark.slow
@pytest.mark.e2e
def test_save_restore_continue_matches_continuous(tmp_path):
    cfg = tiny_cfg()
    task = DummySegTask(cfg, src_len=10)
    batches = [dummy_seg_batch(cfg, 2, seed=i, src_len=10) for i in range(4)]

    # continuous: 4 steps
    t1 = make_trainer(cfg, task)
    for b in batches:
        t1.train_step(b)
    p_cont = jax.device_get(
        t1.state.params["encoder"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    )

    # interrupted: 2 steps, save, restore into a fresh trainer, 2 more
    t2 = make_trainer(cfg, task)
    for b in batches[:2]:
        t2.train_step(b)
    mgr = CheckpointManager(CheckpointConfig(save_dir=str(tmp_path)))
    mgr.save(epoch=1, state=t2.state, extra={"epoch": 1}, val_metric=0.5)

    t3 = make_trainer(cfg, task)
    t3.state = mgr.load("checkpoint_1", t3.state)
    assert int(t3.state.step) == 2
    for b in batches[2:]:
        t3.train_step(b)
    p_resumed = jax.device_get(
        t3.state.params["encoder"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    )
    np.testing.assert_allclose(p_cont, p_resumed, atol=1e-6)

    # best/last bookkeeping
    assert mgr.best() == "checkpoint_1"
    assert mgr.latest() == "checkpoint_1"
