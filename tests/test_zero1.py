"""ZeRO-1 optimizer-state sharding: training still correct, state sharded."""

import numpy as np
import pytest

import jax

from ifseg_tpu.config import Config, model_config_for_arch
from ifseg_tpu.parallel.mesh import MeshConfig, build_mesh
from ifseg_tpu.train.trainer import Trainer
from tests.test_train_step import make_batch, make_class_table, tiny_config


@pytest.mark.slow
@pytest.mark.mesh
def test_zero1_training_matches_replicated():
    cfg_r = tiny_config(dtype="float32")
    cfg_z = tiny_config(dtype="float32")
    cfg_z.distributed.zero1 = True
    tokens, lengths = make_class_table(cfg_r.model.num_seg_tokens)
    mesh = build_mesh(MeshConfig(data_parallel=8))

    tr = Trainer(cfg_r, mesh, tokens, lengths, total_num_updates=10)
    tr.init_state()
    tz = Trainer(cfg_z, mesh, tokens, lengths, total_num_updates=10)
    tz.init_state()

    batch = make_batch(cfg_r, b=8, seed=0)
    tr.train_step(batch)
    tz.train_step(batch)

    pr = jax.device_get(
        tr.state.params["encoder"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    )
    pz = jax.device_get(
        tz.state.params["encoder"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    )
    np.testing.assert_allclose(pr, pz, atol=1e-6)

    # at least one optimizer-state array actually sharded over 'data'
    specs = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(
            lambda x: str(getattr(x, "sharding", "")), tz.state.opt_state
        )
    )
    assert any("data" in s for s in specs), specs[:5]
