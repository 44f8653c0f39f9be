"""ParallelPlan: the model-parallel strategy the SegOFA modules execute.

The reference launches TP/PP/EP from flags through one model-parallel group
(model_parallel/models/pipeline_parallel_transformer/model.py:316-319,
modules/base_layer.py:14-29); this is the TPU-native equivalent: a frozen
plan object (mesh + which strategy rides the 'model' axis) threaded into the
flax modules as static metadata.  TP needs no plan — it is pure GSPMD via
parameter shardings (parallel/sharding.py TP_RULES); PP/EP/CP are shard_map
programs that need the mesh at trace time.
"""

from dataclasses import dataclass
from typing import Optional

from jax.sharding import Mesh

from .mesh import model_axis_size


@dataclass(frozen=True)
class ParallelPlan:
    mesh: Mesh
    context_parallel: int = 1
    pipeline_parallel: int = 1
    pipeline_chunks: int = 0  # 0 -> pipeline_parallel
    moe_experts: int = 0
    moe_freq: int = 2
    moe_assignment: str = "sinkhorn"
    axis: str = "model"

    @property
    def chunks(self) -> int:
        return self.pipeline_chunks or self.pipeline_parallel


def plan_from_config(dist_cfg, mesh: Mesh) -> Optional[ParallelPlan]:
    """A plan when any shard_map strategy is active, else None (the pure
    GSPMD path needs no plan)."""
    if (
        max(getattr(dist_cfg, "pipeline_parallel", 1), 1) == 1
        and max(getattr(dist_cfg, "context_parallel", 1), 1) == 1
        and getattr(dist_cfg, "moe_experts", 0) <= 1
    ):
        return None
    model_axis_size(dist_cfg)  # validates exclusivity
    return ParallelPlan(
        mesh=mesh,
        context_parallel=max(dist_cfg.context_parallel, 1),
        pipeline_parallel=max(dist_cfg.pipeline_parallel, 1),
        pipeline_chunks=getattr(dist_cfg, "pipeline_chunks", 0),
        moe_experts=max(dist_cfg.moe_experts, 0),
        moe_freq=max(getattr(dist_cfg, "moe_freq", 2), 1),
        moe_assignment=getattr(dist_cfg, "moe_assignment", "sinkhorn"),
    )
