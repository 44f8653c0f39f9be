"""LayerDrop and --finetune-from-model semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ifseg_tpu.config import Config, ModelConfig
from ifseg_tpu.models.segofa import SegOFAVariables


def _tiny(**kw):
    base = dict(
        encoder_embed_dim=64, encoder_ffn_embed_dim=128, encoder_layers=2,
        encoder_attention_heads=4, decoder_embed_dim=64,
        decoder_ffn_embed_dim=128, decoder_layers=2,
        decoder_attention_heads=4, resnet_type="resnet50",
        patch_image_size=64, orig_patch_image_size=64, num_seg_tokens=5,
        dtype="float32",
    )
    base.update(kw)
    return ModelConfig(**base)


def _forward(cfg, params, model, det, seed=0):
    rng = np.random.default_rng(0)
    b, s = 2, cfg.patch_image_size
    logits, _ = model.apply(
        {"params": params},
        src_tokens=jnp.asarray(rng.integers(4, 100, size=(b, 6)), jnp.int32),
        patch_images=jnp.asarray(rng.normal(size=(b, s, s, 3)), jnp.float32),
        bos_tokens=jnp.zeros((b, 1), jnp.int32),
        deterministic=det,
        rngs=None if det else {"dropout": jax.random.PRNGKey(seed)},
    )
    return np.asarray(logits, np.float32)


def test_layerdrop_off_at_eval_and_stochastic_in_train():
    cfg = _tiny(encoder_layerdrop=0.5, decoder_layerdrop=0.5, dropout=0.0,
                encoder_drop_path_rate=0.0, decoder_drop_path_rate=0.0)
    model, params = SegOFAVariables.init(cfg, jax.random.PRNGKey(0))
    # eval: layerdrop must not fire — identical to a layerdrop=0 model
    cfg0 = _tiny(encoder_layerdrop=0.0, decoder_layerdrop=0.0, dropout=0.0,
                 encoder_drop_path_rate=0.0, decoder_drop_path_rate=0.0)
    model0, _ = SegOFAVariables.init(cfg0, jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        _forward(cfg, params, model, det=True),
        _forward(cfg0, params, model0, det=True),
        rtol=1e-6,
    )
    # train mode: different dropout keys must produce different layer subsets
    outs = {np.round(_forward(cfg, params, model, det=False, seed=s), 4).tobytes()
            for s in range(4)}
    assert len(outs) > 1


def test_finetune_from_model_rejects_reset_flags(tmp_path):
    from ifseg_tpu.cli.train import maybe_restore_pretrained

    cfg = Config()
    cfg.checkpoint.finetune_from_model = str(tmp_path / "x.pt")
    cfg.checkpoint.reset_optimizer = True
    with pytest.raises(ValueError, match="finetune-from-model"):
        maybe_restore_pretrained(cfg, trainer=None)
