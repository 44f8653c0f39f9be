"""Torch-checkpoint conversion: name mapping, layout transposes, vocab surgery.

No real ofa_base.pt is available offline, so a synthetic torch-style state
dict is generated from a freshly-initialized model via the inverse name
mapping; conversion must reproduce the original tree exactly.  Numerical
layout is additionally spot-checked against torch.nn.functional (a torch
Linear with weight W equals a flax Dense with kernel W.T, a torch Conv2d with
weight (O,I,kh,kw) equals flax kernel (kh,kw,I,O)).
"""

import numpy as np
import pytest

import jax

from ifseg_tpu.checkpoint.convert import convert_torch_state_dict
from ifseg_tpu.config import model_config_for_arch
from ifseg_tpu.models.segofa import SegOFAVariables


def tiny_cfg(num_seg=5):
    return model_config_for_arch(
        "segofa_tiny",
        encoder_embed_dim=32,
        encoder_ffn_embed_dim=64,
        encoder_layers=2,
        encoder_attention_heads=4,
        decoder_embed_dim=32,
        decoder_ffn_embed_dim=64,
        decoder_layers=2,
        decoder_attention_heads=4,
        resnet_type="resnet50",
        patch_image_size=64,
        orig_patch_image_size=64,
        num_seg_tokens=num_seg,
    )


# the inverse name mapping moved into the library (it also powers the
# --dry-weights fabricator); round-trip tests exercise the shared code
from ifseg_tpu.checkpoint.convert import flax_to_torch_state_dict as flax_to_torch_sd  # noqa: E402


@pytest.fixture(scope="module")
def fresh():
    cfg = tiny_cfg()
    _, params = SegOFAVariables.init(cfg, jax.random.PRNGKey(0))
    return cfg, jax.device_get(params)


def test_round_trip_exact(fresh):
    cfg, params = fresh
    sd = flax_to_torch_sd(params)
    out = convert_torch_state_dict(sd, cfg.vocab_size, reference_params=params)
    flat_out = jax.tree_util.tree_leaves_with_path(out)
    flat_ref = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(params)
    )
    assert len(flat_out) == len(flat_ref)
    mismatched = []
    for path, v in flat_out:
        key = jax.tree_util.keystr(path)
        if not np.array_equal(np.asarray(v), np.asarray(flat_ref[key])):
            mismatched.append(key)
    assert not mismatched, f"converted values differ: {mismatched[:10]}"


def test_vocab_surgery_appends_row(fresh):
    cfg, params = fresh
    sd = flax_to_torch_sd(params)
    v = cfg.vocab_size
    # simulate a checkpoint one row short (the ofa_base.pt case)
    sd["encoder.embed_tokens.weight"] = sd["encoder.embed_tokens.weight"][: v - 1]
    sd["decoder.embed_tokens.weight"] = sd["decoder.embed_tokens.weight"][: v - 1]
    out = convert_torch_state_dict(sd, v, reference_params=params)
    assert out["embed_tokens"]["embedding"].shape[0] == v


def test_shape_mismatch_keeps_fresh(fresh):
    cfg, params = fresh
    sd = flax_to_torch_sd(params)
    # seg head from a different num_seg -> must fall back to fresh init
    sd["decoder.seg_embed_tokens.weight"] = np.zeros((99, 32), np.float32)
    out = convert_torch_state_dict(sd, cfg.vocab_size, reference_params=params)
    np.testing.assert_array_equal(
        out["decoder"]["seg_embed_tokens"], params["decoder"]["seg_embed_tokens"]
    )


def test_linear_layout_matches_torch(fresh):
    """torch F.linear(x, W, b) == x @ converted_kernel + b."""
    torch = pytest.importorskip("torch")
    cfg, params = fresh
    node = params["encoder"]["layers_0"]["self_attn"]["q_proj"]
    w_torch = torch.tensor(np.asarray(node["kernel"]).T)
    b_torch = torch.tensor(np.asarray(node["bias"]))
    x = np.random.default_rng(0).normal(size=(3, 32)).astype(np.float32)
    want = torch.nn.functional.linear(torch.tensor(x), w_torch, b_torch).numpy()
    got = x @ np.asarray(node["kernel"]) + np.asarray(node["bias"])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv_layout_matches_torch(fresh):
    """torch conv2d == flax conv with the converted kernel layout."""
    torch = pytest.importorskip("torch")
    cfg, params = fresh
    node = params["encoder"]["embed_images"]["conv1"]
    kernel = np.asarray(node["kernel"])  # (7,7,3,64)
    w_torch = torch.tensor(kernel.transpose(3, 2, 0, 1))
    x = np.random.default_rng(0).normal(size=(1, 16, 16, 3)).astype(np.float32)
    want = torch.nn.functional.conv2d(
        torch.tensor(x.transpose(0, 3, 1, 2)), w_torch, stride=2, padding=3
    ).numpy().transpose(0, 2, 3, 1)

    import jax.numpy as jnp
    from jax import lax

    got = lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(kernel),
        window_strides=(2, 2), padding=[(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_dry_weights_full_loader(tmp_path):
    """--dry-weights smoke (VERDICT #6): fabricate an ofa_base-SHAPED torch
    .pt (one vocab row short, no seg tensors, fairseq envelope) and restore
    it through the FULL torch-file loader path used by cli/train.py —
    torch.save file -> load_torch_checkpoint -> convert -> vocab surgery ->
    _reconcile backfill (ref utils/checkpoint_utils.py:191-295)."""
    pytest.importorskip("torch")
    import dataclasses

    from ifseg_tpu.checkpoint.convert import fabricate_ofa_base_checkpoint
    from ifseg_tpu.cli.train import maybe_restore_pretrained
    from ifseg_tpu.config import Config

    mcfg = tiny_cfg()
    path = str(tmp_path / "ofa_dry.pt")
    fabricate_ofa_base_checkpoint(path, mcfg)

    cfg = Config()
    cfg = cfg.replace(
        model=mcfg,
        checkpoint=dataclasses.replace(cfg.checkpoint, restore_file=path),
    )
    params = maybe_restore_pretrained(cfg, trainer=None)
    assert params is not None
    # surgery appended the missing vocab row
    assert params["embed_tokens"]["embedding"].shape[0] == mcfg.vocab_size
    # seg-specific tensors were backfilled with fresh init and exist
    assert "seg_embed_tokens" in params["decoder"]
    # the restored tree must run the full forward
    import jax.numpy as jnp

    model, ref = SegOFAVariables.init(mcfg, jax.random.PRNGKey(1))
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        jax.device_get(ref)
    )
    logits, _ = model.apply(
        {"params": params},
        src_tokens=jnp.zeros((1, 8), jnp.int32),
        patch_images=jnp.zeros((1, 64, 64, 3), jnp.float32),
        patch_masks=jnp.ones((1,), bool),
        bos_tokens=jnp.zeros((1, 1), jnp.int32),
    )
    assert np.isfinite(np.asarray(logits, np.float32)).all()


def test_prune_layers_renumbers_and_loads():
    """LayerDrop pruning: '0,2' of a 4-layer model becomes layers 0,1 of a
    2-layer model, and the pruned tree runs under the shallower config."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ifseg_tpu.checkpoint.convert import prune_layers
    from ifseg_tpu.config import model_config_for_arch
    from ifseg_tpu.models.segofa import SegOFAVariables

    kw = dict(
        encoder_embed_dim=32, encoder_ffn_embed_dim=64,
        encoder_attention_heads=4, decoder_embed_dim=32,
        decoder_ffn_embed_dim=64, decoder_attention_heads=4,
        resnet_type="resnet50", patch_image_size=32,
        orig_patch_image_size=32, num_seg_tokens=3, dropout=0.0,
        encoder_drop_path_rate=0.0, decoder_drop_path_rate=0.0,
    )
    deep_cfg = model_config_for_arch(
        "segofa_tiny", encoder_layers=4, decoder_layers=4, **kw
    )
    _, deep = SegOFAVariables.init(deep_cfg, jax.random.PRNGKey(0), image_size=32)

    pruned = prune_layers(
        deep, encoder_layers_to_keep="0,2", decoder_layers_to_keep="1,3"
    )
    assert set(
        k for k in pruned["encoder"] if k.startswith("layers_")
    ) == {"layers_0", "layers_1"}
    # renumbered layer 1 is the deep model's layer 2 (encoder) / 3 (decoder)
    np.testing.assert_array_equal(
        pruned["encoder"]["layers_1"]["self_attn"]["q_proj"]["kernel"],
        deep["encoder"]["layers_2"]["self_attn"]["q_proj"]["kernel"],
    )
    np.testing.assert_array_equal(
        pruned["decoder"]["layers_1"]["self_attn"]["q_proj"]["kernel"],
        deep["decoder"]["layers_3"]["self_attn"]["q_proj"]["kernel"],
    )

    shallow_cfg = model_config_for_arch(
        "segofa_tiny", encoder_layers=2, decoder_layers=2, **kw
    )
    shallow_model, ref = SegOFAVariables.init(
        shallow_cfg, jax.random.PRNGKey(1), image_size=32
    )
    jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: a.shape == b.shape, pruned, ref)
    )
    logits, _ = shallow_model.apply(
        {"params": pruned},
        src_tokens=jnp.zeros((1, 8), jnp.int32),
        patch_images=jnp.zeros((1, 32, 32, 3), jnp.float32),
        patch_masks=jnp.ones((1,), bool),
        bos_tokens=jnp.zeros((1, 1), jnp.int32),
    )
    assert np.isfinite(np.asarray(logits, np.float32)).all()
