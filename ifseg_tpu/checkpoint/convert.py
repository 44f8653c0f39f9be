"""Torch `ofa_base.pt` -> JAX pytree converter with vocab surgery.

This is the gateway to end-to-end parity (SURVEY.md §7 step 4).  It implements
as a *pure translation step* what the reference does imperatively during
``load_checkpoint``:
  - vocab surgery (models/segofa/segofa.py:247-290): if the loaded embedding
    has one extra row vs len(dict)-num_seg and no <mask> -> truncate; if it is
    short -> append N(0, d^-0.5) rows (the IFSeg case: +1 row for the extra
    seg/unknown symbol accounting, see config.ModelConfig.vocab_size)
  - shape-mismatch deletion (encoder_module.py:966-985,
    decoder_module.py:892-938): checkpoint tensors whose shape differs from
    the model (seg heads, seg position tables from a different
    patch_image_size) are dropped and the fresh initialization is kept
  - missing keys keep their fresh init (e.g. seg_embed_tokens, seg_projection
    which do not exist in ofa_base.pt)

Layout translation (torch -> flax):
  Linear  weight (out, in)        -> kernel (in, out)      [transpose]
  Conv2d  weight (out, in, kh, kw)-> kernel (kh, kw, in, out)
  Embedding weight                -> embedding             [as-is]
  LayerNorm weight/bias           -> scale/bias
  per-layer rel-pos ModuleLists   -> one stacked (L, ...) table
"""

import logging
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a fairseq .pt checkpoint's model state as numpy (cpu, fp32)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    sd = state.get("model", state)
    return {k: v.float().numpy() for k, v in sd.items() if hasattr(v, "numpy")}


def _vocab_surgery(sd: Dict[str, np.ndarray], target_vocab: int, rng=None):
    """segofa.py:247-290. Adjust embed_tokens rows to ``target_vocab``."""
    key = "encoder.embed_tokens.weight"
    if key not in sd:
        return sd
    loaded = sd[key].shape[0]
    d = sd[key].shape[1]
    if loaded == target_vocab + 1:
        # truncate the trailing <mask> row (finetune-on-translation case)
        for k in (
            "encoder.embed_tokens.weight",
            "decoder.embed_tokens.weight",
            "encoder.output_projection.weight",
            "decoder.output_projection.weight",
        ):
            if k in sd:
                sd[k] = sd[k][:-1]
    elif loaded < target_vocab:
        n_add = target_vocab - loaded
        rng = rng or np.random.default_rng(0)
        new_rows = rng.normal(0.0, d ** -0.5, size=(n_add, d)).astype(
            sd[key].dtype
        )
        logger.info("vocab surgery: appending %d embedding rows", n_add)
        for k in ("encoder.embed_tokens.weight", "decoder.embed_tokens.weight"):
            if k in sd:
                sd[k] = np.concatenate([sd[k], new_rows], axis=0)
    return sd


# ------------------------------------------------------------- name mapping

_LN = lambda: {"weight": "scale", "bias": "bias"}


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _map_linear(tree, dst, w, b=None):
    _set(tree, dst + ("kernel",), np.ascontiguousarray(w.T))
    if b is not None:
        _set(tree, dst + ("bias",), b)


def _map_conv(tree, dst, w):
    _set(tree, dst + ("kernel",), np.ascontiguousarray(w.transpose(2, 3, 1, 0)))


def _map_ln(tree, dst, w, b):
    _set(tree, dst + ("scale",), w)
    _set(tree, dst + ("bias",), b)


def _resnet_paths(torch_name: str) -> Optional[Tuple[Tuple[str, ...], str]]:
    """encoder.embed_images.<torch resnet name> -> our ResNetStem path.

    torch: conv1, bn1, layer{1..3}.{i}.{conv1..3,bn1..3,downsample.0,downsample.1}
    ours : conv1, bn1, layer{s}_{i}/{conv*,bn*,downsample_conv,downsample_bn}
    """
    m = re.match(r"(conv1|bn1)\.(.*)", torch_name)
    if m:
        return (m.group(1),), m.group(2)
    m = re.match(r"layer(\d)\.(\d+)\.(conv\d|bn\d)\.(.*)", torch_name)
    if m:
        return (f"layer{m.group(1)}_{m.group(2)}", m.group(3)), m.group(4)
    m = re.match(r"layer(\d)\.(\d+)\.downsample\.(0|1)\.(.*)", torch_name)
    if m:
        sub = "downsample_conv" if m.group(3) == "0" else "downsample_bn"
        return (f"layer{m.group(1)}_{m.group(2)}", sub), m.group(4)
    return None


def _convert_side(
    sd: Dict[str, np.ndarray],
    side: str,
    tree: Dict[str, Any],
    skipped: Optional[list] = None,
):
    """Convert encoder.* or decoder.* keys into our nested layout.  Keys with
    no destination are recorded in ``skipped`` (never silently dropped —
    a checkpoint carrying e.g. adapter weights must surface them)."""
    prefix = side + "."
    sub: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        if k.startswith(prefix):
            sub[k[len(prefix):]] = v

    out = tree.setdefault(side, {})

    # stacked per-layer rel-pos tables
    for list_name, our_name in (
        ("token_rel_pos_table_list", "token_rel_pos_table"),
        ("image_rel_pos_table_list", "image_rel_pos_table"),
        ("seg_rel_pos_table_list", "seg_rel_pos_table"),
    ):
        idx = 0
        rows = []
        while f"{list_name}.{idx}.weight" in sub:
            rows.append(sub.pop(f"{list_name}.{idx}.weight"))
            idx += 1
        if rows:
            out[our_name] = np.stack(rows, axis=0)

    simple_embeds = {
        "embed_positions.weight": "embed_positions",
        "embed_image_positions.weight": "embed_image_positions",
        "embed_seg_positions.weight": "embed_seg_positions",
        "type_embedding.weight": "type_embedding",
    }
    lns = (
        "layernorm_embedding",
        "patch_layernorm_embedding",
        "code_layernorm_embedding",
        "pos_ln",
        "image_pos_ln",
        "seg_pos_ln",
        "layer_norm",
    )
    linears = (
        "pos_q_linear",
        "pos_k_linear",
        "self_pos_q_linear",
        "self_pos_k_linear",
        "cross_pos_q_linear",
        "cross_pos_k_linear",
        "image_proj",
    )

    for tk, ours in simple_embeds.items():
        if tk in sub:
            _set(out, (ours, "embedding"), sub.pop(tk))
    for name in lns:
        if f"{name}.weight" in sub:
            _map_ln(out, (name,), sub.pop(f"{name}.weight"), sub.pop(f"{name}.bias"))
    for name in linears:
        if f"{name}.weight" in sub:
            _map_linear(
                out, (name,), sub.pop(f"{name}.weight"), sub.pop(f"{name}.bias", None)
            )

    # prefix-tuning prompt encoder (encoder_module.py:989-1027):
    # <side>_prompt_encoder.{embedding.weight, trans.0.*, trans.2.*}
    pe_prefix = f"{side}_prompt_encoder."
    for k in [k for k in list(sub) if k.startswith(pe_prefix)]:
        v = sub.pop(k)
        leaf = k[len(pe_prefix):]
        if leaf == "embedding.weight":
            _set(out, ("prompt_encoder", "embedding", "embedding"), v)
        elif leaf in ("trans.0.weight", "trans.2.weight"):
            dst = "trans_0" if leaf.startswith("trans.0") else "trans_2"
            _map_linear(out, ("prompt_encoder", dst), v)
        elif leaf in ("trans.0.bias", "trans.2.bias"):
            dst = "trans_0" if leaf.startswith("trans.0") else "trans_2"
            _set(out, ("prompt_encoder", dst, "bias"), v)

    if "seg_embed_tokens.weight" in sub:
        out["seg_embed_tokens"] = sub.pop("seg_embed_tokens.weight")
    if "seg_projection.weight" in sub:
        out["seg_projection"] = sub.pop("seg_projection.weight")

    # resnet stem
    for k in [k for k in list(sub) if k.startswith("embed_images.")]:
        mapped = _resnet_paths(k[len("embed_images."):])
        v = sub.pop(k)
        if mapped is None:
            continue
        path, leaf = mapped
        path = ("embed_images",) + path
        if leaf == "weight" and v.ndim == 4:
            _map_conv(out, path, v)
        elif v.ndim == 1:  # bn weight/bias/running_mean/running_var
            name = k.rsplit(".", 1)[-1]
            _set(out, path + (name,), v)

    # transformer layers
    layer_keys = [k for k in list(sub) if k.startswith("layers.")]
    for k in layer_keys:
        v = sub.pop(k)
        m = re.match(r"layers\.(\d+)\.(.*)", k)
        i, rest = int(m.group(1)), m.group(2)
        lp = (f"layers_{i}",)
        # attention projections
        am = re.match(r"(self_attn|encoder_attn)\.(q_proj|k_proj|v_proj|out_proj)\.(weight|bias)", rest)
        if am:
            attn, proj, leaf = am.groups()
            if leaf == "weight":
                _map_linear(out, lp + (attn, proj), v)
            else:
                _set(out, lp + (attn, proj, "bias"), v)
            continue
        cm = re.match(r"(self_attn|encoder_attn)\.c_attn", rest)
        if cm:
            _set(out, lp + (cm.group(1), "c_attn"), v)
            continue
        fm = re.match(r"(fc1|fc2)\.(weight|bias)", rest)
        if fm:
            name, leaf = fm.groups()
            if leaf == "weight":
                _map_linear(out, lp + ("ffn", name), v)
            else:
                _set(out, lp + ("ffn", name, "bias"), v)
            continue
        nm = re.match(
            r"(self_attn_layer_norm|encoder_attn_layer_norm|final_layer_norm|attn_ln|self_attn_ln|cross_attn_ln)\.(weight|bias)",
            rest,
        )
        if nm:
            name, leaf = nm.groups()
            tgt = "scale" if leaf == "weight" else "bias"
            _set(out, lp + (name, tgt), v)
            continue
        fl = re.match(r"ffn_layernorm\.(weight|bias)", rest)
        if fl:
            tgt = "scale" if fl.group(1) == "weight" else "bias"
            _set(out, lp + ("ffn", "ffn_layernorm", tgt), v)
            continue
        if rest == "w_resid":
            _set(out, lp + ("w_resid",), v)
            continue
        adm = re.match(r"adapter\.(down_proj|up_proj)\.(weight|bias)", rest)
        if adm:
            name, leaf = adm.groups()
            if leaf == "weight":
                _map_linear(out, lp + ("adapter", name), v)
            else:
                _set(out, lp + ("adapter", name, "bias"), v)
            continue
        if skipped is not None:
            skipped.append(f"{side}.{k}")
    # anything left in ``sub`` found no destination either (embed_tokens and
    # version markers are consumed by the caller and are not errors)
    if skipped is not None:
        for k in sub:
            if k not in ("embed_tokens.weight", "version", "output_projection.weight"):
                skipped.append(f"{side}.{k}")
    return out


def prune_layers(
    params: Dict[str, Any],
    encoder_layers_to_keep: Optional[str] = None,
    decoder_layers_to_keep: Optional[str] = None,
) -> Dict[str, Any]:
    """LayerDrop pruning (utils/checkpoint_utils.py:692-784): keep only the
    listed layer indices (comma string, e.g. "0,2,4") on each side and
    renumber them consecutively, so a shallower model config can load a
    deeper checkpoint.  Non-layer entries pass through unchanged."""

    def prune_side(side_tree: Dict[str, Any], keep: str) -> Dict[str, Any]:
        keep_idx = sorted(int(s) for s in keep.split(","))
        n_layers = sum(1 for k in side_tree if k.startswith("layers_"))
        bad = [i for i in keep_idx if not 0 <= i < n_layers]
        if bad:
            raise ValueError(
                f"layers-to-keep indices {bad} out of range for a "
                f"{n_layers}-layer checkpoint"
            )
        out = {}
        for name, sub in side_tree.items():
            if name.startswith("layers_"):
                i = int(name[len("layers_"):])
                if i in keep_idx:
                    out[f"layers_{keep_idx.index(i)}"] = sub
            elif name.endswith("rel_pos_table"):
                # per-layer bias tables are packed (nlayers, ...) at the
                # side level (encoder.py:80-91) — slice the layer axis
                assert sub.shape[0] == n_layers, (name, sub.shape)
                out[name] = sub[np.asarray(keep_idx)]
            else:
                out[name] = sub
        return out

    params = dict(params)
    if encoder_layers_to_keep and "encoder" in params:
        params["encoder"] = prune_side(params["encoder"], encoder_layers_to_keep)
    if decoder_layers_to_keep and "decoder" in params:
        params["decoder"] = prune_side(params["decoder"], decoder_layers_to_keep)
    return params


def convert_torch_state_dict(
    sd: Dict[str, np.ndarray],
    target_vocab: int,
    reference_params: Optional[Any] = None,
) -> Dict[str, Any]:
    """Full conversion.  With ``reference_params`` (a freshly-initialized
    params tree), shape-mismatched or missing tensors fall back to the fresh
    values (the reference's deletion/backfill semantics) and the result is
    guaranteed to be loadable."""
    sd = dict(sd)
    sd = _vocab_surgery(sd, target_vocab)

    tree: Dict[str, Any] = {}
    # shared token embedding: encoder's copy wins (they are tied)
    if "encoder.embed_tokens.weight" in sd:
        tree["embed_tokens"] = {"embedding": sd["encoder.embed_tokens.weight"]}
    skipped: list = []
    _convert_side(sd, "encoder", tree, skipped)
    _convert_side(sd, "decoder", tree, skipped)
    # the torch tree nests embed_tokens under encoder/decoder; ours is shared
    for side in ("encoder", "decoder"):
        tree.get(side, {}).pop("embed_tokens", None)
    if skipped:
        logger.warning(
            "checkpoint conversion skipped %d parameter(s) with no "
            "destination in the model: %s%s",
            len(skipped),
            ", ".join(skipped[:8]),
            " …" if len(skipped) > 8 else "",
        )

    if reference_params is not None:
        tree = _reconcile(tree, reference_params)
    return tree


def _reconcile(tree, ref, path=""):
    """Keep loaded values where shapes match; fresh init otherwise
    (encoder_module.py:966-985: mismatched keys deleted, missing backfilled)."""
    import jax

    out = {}
    if isinstance(ref, dict) or hasattr(ref, "items"):
        for k, rv in ref.items():
            lv = tree.get(k) if isinstance(tree, dict) else None
            out[k] = _reconcile(lv if lv is not None else {}, rv, f"{path}/{k}")
        # warn about loaded keys we have no slot for
        if isinstance(tree, dict):
            for k in tree:
                if k not in out:
                    logger.info("checkpoint key unused: %s/%s", path, k)
        return out
    # leaf
    if tree is None or isinstance(tree, dict):
        logger.info("missing from checkpoint, keeping fresh init: %s", path)
        return ref
    loaded = np.asarray(tree)
    if loaded.shape != tuple(ref.shape):
        logger.warning(
            "shape mismatch %s: ckpt %s vs model %s — keeping fresh init",
            path, loaded.shape, tuple(ref.shape),
        )
        return ref
    return loaded.astype(np.asarray(ref).dtype if hasattr(ref, "dtype") else np.float32)


# -------------------------------------------------- inverse mapping / smoke

def flax_to_torch_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of the converter's name mapping: flax params -> torch-named
    state dict.  Used for round-trip tests and for fabricating an
    ofa_base-shaped .pt when no real weights are on disk (--dry-weights)."""
    sd: Dict[str, np.ndarray] = {}
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
        num_layers = sum(1 for k in p if k.startswith("layers_"))
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

    # decoder extras (seg-specific; absent from a real ofa_base.pt)
    dec = params["decoder"]
    if "seg_pos_ln" in dec:
        put_ln("decoder.seg_pos_ln", dec["seg_pos_ln"])
    if "embed_seg_positions" in dec:
        put_embed("decoder.embed_seg_positions", dec["embed_seg_positions"])
    for name in (
        "self_pos_q_linear", "self_pos_k_linear",
        "cross_pos_q_linear", "cross_pos_k_linear",
    ):
        if name in dec:
            put_linear(f"decoder.{name}", dec[name])
    if "seg_embed_tokens" in dec:
        sd["decoder.seg_embed_tokens.weight"] = np.asarray(dec["seg_embed_tokens"])
    return sd


_SEG_ONLY_KEYS = (
    "seg_embed_tokens", "seg_projection", "embed_seg_positions",
    "seg_pos_ln", "seg_rel_pos_table_list",
)


def fabricate_ofa_base_checkpoint(path: str, model_cfg, seed: int = 0) -> str:
    """--dry-weights: write a fairseq-envelope torch ``.pt`` whose model
    state has exactly the SHAPES of a pretrained ``ofa_base.pt`` relative to
    this config — token embedding one row short of the target vocab (the
    extra seg/unknown accounting row the surgery appends) and no seg-specific
    tensors — so the FULL torch-file loader (load_torch_checkpoint ->
    convert_torch_state_dict -> vocab surgery -> _reconcile backfill) can be
    smoke-tested end to end before real weights exist
    (ref utils/checkpoint_utils.py:191-295; run_scripts/IFSeg/coco_unseen.sh:80).
    """
    import jax as _jax
    import torch

    from ifseg_tpu.models.segofa import SegOFAVariables

    _, fresh = SegOFAVariables.init(model_cfg, _jax.random.PRNGKey(seed))
    sd = flax_to_torch_state_dict(_jax.device_get(fresh))
    # ofa_base.pt is one row short of the extended IFSeg vocab …
    for k in ("encoder.embed_tokens.weight", "decoder.embed_tokens.weight"):
        sd[k] = sd[k][:-1]
    # … and has no seg-specific parameters
    sd = {
        k: v for k, v in sd.items()
        if not any(seg in k for seg in _SEG_ONLY_KEYS)
    }
    state = {
        "args": None,
        "cfg": {},
        "model": {k: torch.from_numpy(np.array(v)) for k, v in sd.items()},
        "extra_state": {},
        "optimizer_history": [],
    }
    torch.save(state, path)
    logger.warning(
        "--dry-weights: fabricated ofa_base-shaped checkpoint at %s "
        "(%d tensors) — randomly initialized, for loader smoke only", path, len(sd),
    )
    return path
