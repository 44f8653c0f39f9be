"""Device mesh construction (single-controller JAX).

Replaces the reference's process-per-device NCCL/Gloo/XLA shim
(custom_fairseq/fairseq/distributed/utils.py:243-389) with the TPU-native
model: one controller per host, ``jax.distributed.initialize`` over DCN, and a
``jax.sharding.Mesh`` over ICI with named axes:

  data  — pure data parallelism (grad psum)
  fsdp  — data parallelism + parameter/optimizer sharding (ZeRO-3 analog of
          distributed/fully_sharded_data_parallel.py)
  model — tensor parallelism (analog of model_parallel/ Megatron TP)

Collectives are never written by hand here: shardings on the jitted train step
let XLA place all_gather/psum/reduce_scatter on ICI (SURVEY §5 "distributed
communication backend").
"""

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


@dataclass
class MeshConfig:
    data_parallel: int = -1  # -1 = all remaining devices
    fsdp: int = 1
    tensor_parallel: int = 1


def build_mesh(
    cfg: Optional[MeshConfig] = None, devices: Optional[Sequence] = None
) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    tp = max(cfg.tensor_parallel, 1)
    fs = max(cfg.fsdp, 1)
    dp = cfg.data_parallel
    if dp == -1:
        assert n % (tp * fs) == 0, f"{n} devices not divisible by fsdp*tp={fs * tp}"
        dp = n // (tp * fs)
    used = dp * fs * tp
    assert used <= n, (
        f"mesh {dp}x{fs}x{tp} needs {used} devices but only {n} available"
    )
    arr = np.asarray(devices[:used]).reshape(dp, fs, tp)
    return Mesh(arr, ("data", "fsdp", "model"))


def model_axis_size(dist_cfg) -> int:
    """Size of the shared 'model' axis given the distributed flags.  At most
    one model-parallel strategy may exceed 1 (the reference likewise maintains
    a single model-parallel group, distributed/utils.py:491-508)."""
    sizes = {
        "tensor_parallel": max(getattr(dist_cfg, "tensor_parallel", 1), 1),
        "pipeline_parallel": max(getattr(dist_cfg, "pipeline_parallel", 1), 1),
        "context_parallel": max(getattr(dist_cfg, "context_parallel", 1), 1),
        "moe_experts": max(getattr(dist_cfg, "moe_experts", 0), 1),
    }
    active = {k: v for k, v in sizes.items() if v > 1}
    if len(active) > 1:
        raise ValueError(
            f"at most one model-parallel strategy may exceed 1, got {active}"
        )
    return max(sizes.values())


def mesh_from_config(dist_cfg, devices=None) -> Mesh:
    return build_mesh(
        MeshConfig(
            data_parallel=getattr(dist_cfg, "data_parallel", -1),
            fsdp=getattr(dist_cfg, "fsdp", 1),
            tensor_parallel=model_axis_size(dist_cfg),
        ),
        devices=devices,
    )


def initialize_distributed(coordinator_address=None, num_processes=1, process_id=0):
    """Multi-host init (reference distributed_init, utils.py:243-332). No-op
    for a single process."""
    if num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def coordination_barrier(name: str, timeout_s: float = 600.0) -> None:
    """Block until every process reaches this barrier, via the JAX
    coordination service (gRPC) — NOT via a device collective.

    This is the multi-host rendezvous primitive for phases with large
    cross-host skew (cold compiles, checkpoint writes): unlike
    ``multihost_utils.sync_global_devices`` — which runs a device all-gather
    and therefore initialises a Gloo/NCCL communicator with its own hard
    30 s key-value window — this barrier tolerates ``timeout_s`` of skew and
    touches no communicator.  Call it between AOT compilation and the first
    execution of a collective program so every process enters communicator
    init within milliseconds of its peers.  Reference analog: the NCCL init
    retry loop + dummy all-reduce (distributed/utils.py:262-294).  No-op for
    a single process."""
    if jax.process_count() == 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    assert client is not None, "coordination_barrier needs jax.distributed"
    client.wait_at_barrier(name, timeout_in_ms=int(timeout_s * 1000))


def local_batch_slice(global_batch: int, mesh: Mesh) -> int:
    """Rows this process loads from disk per step.

    Under the single-controller model each process feeds an equal contiguous
    slice of the global batch and the global array is assembled against the
    batch NamedSharding (each process's rows land on its addressable
    devices).  That requires the global batch to split evenly both across
    data-parallel shards (so the sharding is valid) and across processes (so
    the host slices are equal) — e.g. global_batch=8 on 2 hosts with
    dp_total=4 gives 4 rows/host, 2 rows/device."""
    dp_total = mesh.shape["data"] * mesh.shape["fsdp"]
    nproc = jax.process_count()
    assert global_batch % dp_total == 0, (
        f"global batch {global_batch} not divisible by dp*fsdp={dp_total}"
    )
    assert global_batch % nproc == 0, (
        f"global batch {global_batch} not divisible by process count {nproc}"
    )
    # make_array_from_process_local_data needs each host's rows to exactly
    # cover its addressable batch shards, i.e. a whole number of data-parallel
    # shards per host
    assert dp_total % nproc == 0, (
        f"dp*fsdp={dp_total} not divisible by process count {nproc}"
    )
    return global_batch // nproc
