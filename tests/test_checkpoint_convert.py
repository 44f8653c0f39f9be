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


def flax_to_torch_sd(params, num_layers=2):
    """Inverse of the converter's name mapping, for round-trip testing."""
    sd = {}
    emb = np.asarray(params["embed_tokens"]["embedding"])
    sd["encoder.embed_tokens.weight"] = emb
    sd["decoder.embed_tokens.weight"] = emb

    def put_linear(tname, node):
        sd[f"{tname}.weight"] = np.asarray(node["kernel"]).T
        if "bias" in node:
            sd[f"{tname}.bias"] = np.asarray(node["bias"])

    def put_ln(tname, node):
        sd[f"{tname}.weight"] = np.asarray(node["scale"])
        sd[f"{tname}.bias"] = np.asarray(node["bias"])

    def put_embed(tname, node):
        sd[f"{tname}.weight"] = np.asarray(node["embedding"])

    for side in ("encoder", "decoder"):
        p = params[side]
        for name in ("pos_ln", "image_pos_ln", "layernorm_embedding", "layer_norm"):
            if name in p:
                put_ln(f"{side}.{name}", p[name])
        for name in ("pos_q_linear", "pos_k_linear"):
            if name in p:
                put_linear(f"{side}.{name}", p[name])
        for name in ("embed_positions", "embed_image_positions"):
            if name in p:
                put_embed(f"{side}.{name}", p[name])
        # stacked rel tables -> per-layer ModuleList entries
        for ours, theirs in (
            ("token_rel_pos_table", "token_rel_pos_table_list"),
            ("image_rel_pos_table", "image_rel_pos_table_list"),
            ("seg_rel_pos_table", "seg_rel_pos_table_list"),
        ):
            if ours in p:
                table = np.asarray(p[ours])
                for i in range(table.shape[0]):
                    sd[f"{side}.{theirs}.{i}.weight"] = table[i]
        for i in range(num_layers):
            lp = p[f"layers_{i}"]
            base = f"{side}.layers.{i}"
            for attn in ("self_attn", "encoder_attn"):
                if attn not in lp:
                    continue
                for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                    put_linear(f"{base}.{attn}.{proj}", lp[attn][proj])
                if "c_attn" in lp[attn]:
                    sd[f"{base}.{attn}.c_attn"] = np.asarray(lp[attn]["c_attn"])
            for ln_name in (
                "self_attn_layer_norm", "encoder_attn_layer_norm",
                "final_layer_norm", "attn_ln", "self_attn_ln", "cross_attn_ln",
            ):
                if ln_name in lp:
                    put_ln(f"{base}.{ln_name}", lp[ln_name])
            put_linear(f"{base}.fc1", lp["ffn"]["fc1"])
            put_linear(f"{base}.fc2", lp["ffn"]["fc2"])
            if "ffn_layernorm" in lp["ffn"]:
                put_ln(f"{base}.ffn_layernorm", lp["ffn"]["ffn_layernorm"])
            if "w_resid" in lp:
                sd[f"{base}.w_resid"] = np.asarray(lp["w_resid"])

    # encoder extras
    enc = params["encoder"]
    put_embed("encoder.type_embedding", enc["type_embedding"])
    put_ln("encoder.patch_layernorm_embedding", enc["patch_layernorm_embedding"])
    put_linear("encoder.image_proj", enc["image_proj"])
    # resnet stem
    stem = enc["embed_images"]

    def put_conv(tname, node):
        sd[f"{tname}.weight"] = np.asarray(node["kernel"]).transpose(3, 2, 0, 1)

    def put_bn(tname, node):
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{tname}.{leaf}"] = np.asarray(node[leaf])

    put_conv("encoder.embed_images.conv1", stem["conv1"])
    put_bn("encoder.embed_images.bn1", stem["bn1"])
    for key, node in stem.items():
        if not key.startswith("layer"):
            continue
        stage, idx = key[5], key.split("_")[1]
        base = f"encoder.embed_images.layer{stage}.{idx}"
        for sub in ("conv1", "conv2", "conv3"):
            put_conv(f"{base}.{sub}", node[sub])
        for sub in ("bn1", "bn2", "bn3"):
            put_bn(f"{base}.{sub}", node[sub])
        if "downsample_conv" in node:
            put_conv(f"{base}.downsample.0", node["downsample_conv"])
            put_bn(f"{base}.downsample.1", node["downsample_bn"])

    # decoder extras
    dec = params["decoder"]
    put_ln("decoder.seg_pos_ln", dec["seg_pos_ln"])
    put_embed("decoder.embed_seg_positions", dec["embed_seg_positions"])
    for name in (
        "self_pos_q_linear", "self_pos_k_linear",
        "cross_pos_q_linear", "cross_pos_k_linear",
    ):
        put_linear(f"decoder.{name}", dec[name])
    sd["decoder.seg_embed_tokens.weight"] = np.asarray(dec["seg_embed_tokens"])
    return sd


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
