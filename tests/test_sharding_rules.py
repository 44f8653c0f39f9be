"""Unit tests for the GSPMD sharding rules (parallel/sharding.py).

Pins the layout invariants the multichip dryrun depends on (VERDICT r2
"Involuntary full rematerialization" post-mortem): 1-D params replicate
under fsdp, gather tables only ever shard their row axis, and TP rules are
suppressed when shard_map strategies occupy the model axis.
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from ifseg_tpu.parallel.sharding import (
    _spec_for,
    param_shardings,
    shardings_for_plan,
)


@pytest.fixture(scope="module")
def mesh():
    devs = np.asarray(jax.devices()[:8]).reshape(2, 2, 2)
    return Mesh(devs, ("data", "fsdp", "model"))


def _replicated(spec):
    return all(ax is None for ax in spec)


def test_1d_params_replicate_under_fsdp(mesh):
    # LN gammas / biases: fsdp-sharding the only (feature) axis forces a
    # batch-major -> feature-major activation reshard in the dgamma reduction
    assert _replicated(_spec_for("encoder/ln/scale", (768,), mesh, False, True))
    assert _replicated(_spec_for("ffn/fc1/bias", (3072,), mesh, False, True))


def test_embedding_tables_shard_rows_only(mesh):
    # even rows: row ('fsdp') shard even though the feature dim also divides
    spec = _spec_for("decoder/embed_seg_positions/embedding", (1026, 768),
                     mesh, False, True)
    assert spec == P("fsdp", None)
    # odd rows: replicate rather than feature-shard (gather outputs would
    # emerge feature-sharded = full-remat transition back to batch-major)
    spec = _spec_for("encoder/embed_tokens/embedding", (29729, 768),
                     mesh, False, True)
    assert _replicated(spec)


def test_matmul_kernels_fsdp_largest_axis(mesh):
    spec = _spec_for("ffn/fc1/kernel", (768, 3072), mesh, False, True)
    assert spec == P(None, "fsdp")


def test_tp_rules_apply_only_when_tp_owns_model_axis(mesh):
    path = "layers_0/self_attn/q_proj/kernel"
    with_tp = _spec_for(path, (768, 768), mesh, True, True)
    assert with_tp == P("fsdp", "model")
    # CP/PP/MoE runs pass use_tp=False: kernel must stay off the model axis
    without_tp = _spec_for(path, (768, 768), mesh, False, True)
    assert "model" not in [ax for ax in without_tp if ax is not None]


def test_moe_experts_stay_on_model_axis_without_tp(mesh):
    # expert params live on the model axis by design even when TP is off
    spec = _spec_for("layers_1/moe/wi", (2, 32, 64), mesh, False, True, True)
    assert spec[0] == "model"


def test_shardings_for_plan():
    class D:  # minimal dist-config stub
        tensor_parallel = 1
        moe_experts = 0

    d = D()
    assert shardings_for_plan(d) == (False, False)
    d.tensor_parallel = 2
    assert shardings_for_plan(d) == (True, False)
    d.tensor_parallel = 1
    d.moe_experts = 2
    assert shardings_for_plan(d) == (False, True)


def test_param_shardings_pytree(mesh):
    params = {
        "encoder": {
            "embed_tokens": {"embedding": np.zeros((29729, 64), np.float32)},
            "layernorm_embedding": {"scale": np.zeros((64,), np.float32)},
        },
        "scalar": np.float32(1.0),
    }
    sh = param_shardings(params, mesh, use_tp=False, use_fsdp=True)
    assert _replicated(sh["encoder"]["embed_tokens"]["embedding"].spec)
    assert _replicated(sh["encoder"]["layernorm_embedding"]["scale"].spec)
    assert _replicated(sh["scalar"].spec)
