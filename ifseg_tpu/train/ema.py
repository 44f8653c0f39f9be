"""Exponential moving average of parameters.

Mirrors custom_fairseq/fairseq/models/ema/ema.py: shadow copy updated as
``ema = decay * ema + (1 - decay) * params`` each update (stepped in
trainer.py:964-976), kept fp32 when ``ema_fp32``.  The seg-criterion's lazy
init also writes into the EMA copy (seg_criterion.py:398-405); here that is
just re-running ``init_seg_embeddings`` on the EMA tree.
"""

from typing import Any

import jax
import jax.numpy as jnp


def ema_init(params: Any, fp32: bool = False) -> Any:
    if fp32:
        return jax.tree_util.tree_map(lambda p: p.astype(jnp.float32), params)
    return jax.tree_util.tree_map(lambda p: p, params)


def ema_step(ema_params: Any, params: Any, decay: float) -> Any:
    return jax.tree_util.tree_map(
        lambda e, p: (decay * e + (1.0 - decay) * p.astype(e.dtype)).astype(e.dtype),
        ema_params,
        params,
    )
