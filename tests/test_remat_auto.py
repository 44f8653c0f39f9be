"""remat_policy='auto' resolution (train.trainer.resolve_remat_policy).

The Trainer resolves the default 'auto' policy from an explicit HBM bytes
model: remat OFF when the full no-remat activation set fits the chip with
margin, save-attn otherwise.  Calibration points are measured on one 16 GB
v5e at OFA-Base 512px: batch 16 fits (0.279 vs 0.293 s/step), batch 64 OOMs.
"""

import jax.numpy as jnp  # noqa: F401  (keeps jax import order with conftest)

from ifseg_tpu.config import Config, model_config_for_arch
from ifseg_tpu.train.trainer import (
    estimate_train_hbm_bytes,
    resolve_remat_policy,
)

HBM_V5E = 16e9


def _cfg(arch="segofa_base", batch=16, **kw):
    cfg = Config()
    cfg = cfg.replace(model=model_config_for_arch(arch))
    cfg.optimization.batch_size = batch
    for k, v in kw.items():
        setattr(cfg.criterion, k, v) if hasattr(cfg.criterion, k) else None
    return cfg


def test_base_batch16_turns_remat_off():
    cfg = _cfg(batch=16)
    assert cfg.model.remat_policy == "auto"  # the shipped default
    resolve_remat_policy(cfg, n_data_shards=1, hbm_bytes=HBM_V5E)
    assert cfg.model.checkpoint_activations is False
    assert cfg.model.remat_policy == "save-attn"  # resolved fallback value


def test_base_batch64_keeps_save_attn():
    cfg = _cfg(batch=64)
    resolve_remat_policy(cfg, n_data_shards=1, hbm_bytes=HBM_V5E)
    assert cfg.model.checkpoint_activations is True
    assert cfg.model.remat_policy == "save-attn"


def test_base_batch32_is_conservative():
    # batch 32 no-remat was never proven to fit; the bytes model must land
    # on the safe side of the measured 16-fits / 64-OOMs boundary
    cfg = _cfg(batch=32)
    resolve_remat_policy(cfg, n_data_shards=1, hbm_bytes=HBM_V5E)
    assert cfg.model.checkpoint_activations is True


def test_data_shards_scale_per_chip_batch():
    # global batch 64 over dp=4 is per-chip batch 16 -> fits
    cfg = _cfg(batch=64)
    resolve_remat_policy(cfg, n_data_shards=4, hbm_bytes=HBM_V5E)
    assert cfg.model.checkpoint_activations is False


def test_supervised_branch_never_auto_disables():
    # the supervised loss backprops through the ResNet stem, which the
    # bytes model does not cover
    cfg = _cfg(batch=2)
    cfg.criterion.unsupervised_segmentation = False
    resolve_remat_policy(cfg, n_data_shards=1, hbm_bytes=HBM_V5E)
    assert cfg.model.checkpoint_activations is True
    assert cfg.model.remat_policy == "save-attn"


def test_explicit_policy_is_untouched():
    cfg = _cfg(batch=16)
    cfg.model.remat_policy = "save-attn-ffn"
    resolve_remat_policy(cfg, n_data_shards=1, hbm_bytes=HBM_V5E)
    assert cfg.model.remat_policy == "save-attn-ffn"
    assert cfg.model.checkpoint_activations is True


def test_explicit_checkpoint_off_is_untouched():
    cfg = _cfg(batch=64)
    cfg.model.checkpoint_activations = False
    resolve_remat_policy(cfg, n_data_shards=1, hbm_bytes=HBM_V5E)
    # user said no remat: auto must not re-enable it (they own the OOM)
    assert cfg.model.checkpoint_activations is False
    assert cfg.model.remat_policy == "save-attn"


def test_segofa_large_batch8_keeps_remat():
    cfg = _cfg(arch="segofa_large", batch=8)
    resolve_remat_policy(cfg, n_data_shards=1, hbm_bytes=HBM_V5E)
    assert cfg.model.checkpoint_activations is True


def test_bytes_model_monotone_in_batch():
    m = model_config_for_arch("segofa_base")
    b16 = estimate_train_hbm_bytes(m, 16)
    b64 = estimate_train_hbm_bytes(m, 64)
    assert b64 > b16
    # the fixed (params/opt) part must not scale with batch
    assert b64 - b16 < 4 * (b16 - estimate_train_hbm_bytes(m, 1)) * 64 / 15
