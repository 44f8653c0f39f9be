"""--save-interval-updates: mid-epoch checkpoints with iterator cursor
(ref utils/checkpoint_utils.py:35-120 checkpoint_{epoch}_{upd}.pt +
trainer.py:383-442 itr_state persistence)."""

import dataclasses

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
    cfg.criterion.unsupervised_segmentation = True
    return cfg


def test_interval_save_rotation_and_manifest(tmp_path):
    cfg = tiny_cfg()
    task = DummySegTask(cfg, src_len=10)
    mesh = build_mesh(MeshConfig(data_parallel=2))
    t = Trainer(cfg, mesh, task.class_tokens, task.class_lengths, total_num_updates=10)
    t.init_state()

    mgr = CheckpointManager(
        CheckpointConfig(save_dir=str(tmp_path), keep_interval_updates=2)
    )
    for upd in (2, 4, 6):
        mgr.save(
            epoch=1, state=t.state,
            extra={"epoch": 1, "iterator": {"epoch": 1, "iterations_in_epoch": upd}},
            updates=upd,
        )
    # rotation keeps the newest 2 interval checkpoints
    names = [e["name"] for e in mgr.manifest["intervals"]]
    assert names == ["checkpoint_1_4", "checkpoint_1_6"]
    assert mgr.latest() == "checkpoint_1_6"
    import os
    assert not os.path.exists(str(tmp_path) + "/checkpoint_1_2")

    # the extra carries the iterator cursor
    extra = mgr.load_extra("checkpoint_1_6")
    assert extra["iterator"]["iterations_in_epoch"] == 6

    # restore_training_state resumes INSIDE the epoch
    from ifseg_tpu.cli.train import restore_training_state

    t2 = Trainer(cfg, mesh, task.class_tokens, task.class_lengths, total_num_updates=10)
    t2.init_state()
    start_epoch, resume_iter = restore_training_state(cfg, t2, mgr)
    assert start_epoch == 1
    assert resume_iter["iterations_in_epoch"] == 6


@pytest.mark.slow
@pytest.mark.e2e
def test_mid_epoch_resume_matches_continuous(tmp_path):
    """Stop after 2 of 4 updates, restore (params + cursor), finish: final
    params match the uninterrupted run (reference test_reproducibility
    analog at mid-epoch granularity)."""
    cfg = tiny_cfg()
    task = DummySegTask(cfg, src_len=10)
    batches = [dummy_seg_batch(cfg, 2, seed=i, src_len=10) for i in range(4)]
    mesh = build_mesh(MeshConfig(data_parallel=2))

    def make_trainer():
        t = Trainer(cfg, mesh, task.class_tokens, task.class_lengths,
                    total_num_updates=10)
        t.init_state()
        return t

    t1 = make_trainer()
    for b in batches:
        t1.train_step(b)
    p_cont = jax.device_get(
        t1.state.params["encoder"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    )

    t2 = make_trainer()
    for b in batches[:2]:
        t2.train_step(b)
    mgr = CheckpointManager(CheckpointConfig(save_dir=str(tmp_path)))
    mgr.save(
        epoch=1, state=t2.state,
        extra={"epoch": 1,
               "iterator": {"epoch": 1, "iterations_in_epoch": 2, "seed": 7}},
        updates=2,
    )

    t3 = make_trainer()
    from ifseg_tpu.cli.train import restore_training_state

    epoch, resume_iter = restore_training_state(cfg, t3, mgr)
    assert epoch == 1 and int(t3.state.step) == 2
    # continue from the cursor: batches[resume_iter.iterations:]
    for b in batches[resume_iter["iterations_in_epoch"]:]:
        t3.train_step(b)
    p_resumed = jax.device_get(
        t3.state.params["encoder"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    )
    np.testing.assert_allclose(p_cont, p_resumed, atol=1e-6)
