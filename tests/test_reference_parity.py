"""Golden-tensor parity against the reference SegOFA model math.

A minimal, self-contained torch oracle (hand-ported, no fairseq imports) of
the reference's forward math:

  - MultiheadAttention with attn_bias / attn_scale_factor / c_attn
    (models/segofa/unify_multihead_attention.py:117-523)
  - pre-LN encoder/decoder layers with attn_ln / ffn_layernorm / w_resid
    (models/segofa/unify_transformer_layer.py:110-614)
  - ResNet stem with FrozenBatchNorm2d (models/segofa/resnet.py:90-229,
    frozen_bn.py:27-57)
  - the three positional-bias systems: abs pos q·k bias, token log-bucket rel
    bias, 2-D image rel bias with double bilinear interpolation
    (models/segofa/encoder_module.py:71-104, :313-331, :499-851)
  - the surrogate decoder with seg pos/rel bias + BOS threading
    (models/segofa/decoder_module.py:312-404, :486-677)

Both sides run on identical weights: a randomized flax tree is exported to a
reference-named torch state dict (the converter's inverse mapping), the torch
oracle consumes that dict directly, and the JAX model consumes the tree the
converter produces from it — so the test covers the converter too.  Any drift
in the bias chains (SURVEY §7's #1 hard part) fails this test.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ifseg_tpu.checkpoint.convert import convert_torch_state_dict  # noqa: E402
from ifseg_tpu.config import model_config_for_arch  # noqa: E402
from ifseg_tpu.models.segofa import SegOFA, SegOFAVariables  # noqa: E402

from test_checkpoint_convert import flax_to_torch_sd  # noqa: E402

pytestmark = [pytest.mark.slow, pytest.mark.oracle]

PAD = 1


# --------------------------------------------------------------------- config


class A:
    """Reference args namespace (run-script values, coco_unseen.sh:29-52,:89-135)."""

    embed_dim = 32
    ffn_dim = 64
    heads = 4
    layers = 2
    attn_scale_factor = 2.0
    scale_attn = True
    scale_fc = True
    scale_heads = True
    scale_resids = True
    token_bucket_size = 256
    image_bucket_size = 42
    patch_image_size = 64
    orig_patch_image_size = 32
    num_seg = 5
    resnet_layers = (3, 4, 6)  # resnet50

    @property
    def seg_bucket_size(self):
        return self.patch_image_size // 16


def tiny_cfg():
    a = A()
    return model_config_for_arch(
        "segofa_tiny",
        encoder_embed_dim=a.embed_dim,
        encoder_ffn_embed_dim=a.ffn_dim,
        encoder_layers=a.layers,
        encoder_attention_heads=a.heads,
        decoder_embed_dim=a.embed_dim,
        decoder_ffn_embed_dim=a.ffn_dim,
        decoder_layers=a.layers,
        decoder_attention_heads=a.heads,
        resnet_type="resnet50",
        patch_image_size=a.patch_image_size,
        orig_patch_image_size=a.orig_patch_image_size,
        num_seg_tokens=a.num_seg,
        scale_resids=True,
        # the oracle checks the reference-exact erf gelu (torch F.gelu);
        # the production default is gelu_tanh (see config.ModelConfig)
        activation_fn="gelu",
        dtype="float32",
        use_flash_attention=False,
        checkpoint_activations=False,
        dropout=0.0,
        attention_dropout=0.0,
        encoder_drop_path_rate=0.0,
        decoder_drop_path_rate=0.0,
    )


def randomize(params, seed=0):
    """Perturb a fresh init so every parity-critical leaf is non-degenerate
    (rel-pos tables and biases init to zero, which would hide index bugs)."""
    rng = np.random.default_rng(seed)

    def fill(path, leaf):
        name = jax.tree_util.keystr(path[-1:]).strip("[]'\"")
        shape = np.asarray(leaf).shape
        if name == "running_var":
            return rng.uniform(0.5, 1.5, shape).astype(np.float32)
        if name == "running_mean":
            return rng.normal(0.0, 0.1, shape).astype(np.float32)
        if name in ("scale", "c_attn", "w_resid"):
            return (1.0 + 0.1 * rng.normal(size=shape)).astype(np.float32)
        if name == "bias" or name.endswith("rel_pos_table"):
            return rng.normal(0.0, 0.05, shape).astype(np.float32)
        return np.asarray(leaf, np.float32)

    return jax.tree_util.tree_map_with_path(fill, params)


# --------------------------------------------- torch oracle: building blocks


def t(sd, k):
    return torch.tensor(np.asarray(sd[k]), dtype=torch.float32)


def o_linear(sd, p, x):
    b = t(sd, p + ".bias") if p + ".bias" in sd else None
    return F.linear(x, t(sd, p + ".weight"), b)


def o_ln(sd, p, x):
    return F.layer_norm(x, x.shape[-1:], t(sd, p + ".weight"), t(sd, p + ".bias"), 1e-5)


def o_embed(sd, p, ids):
    return F.embedding(ids, t(sd, p + ".weight"))


def o_mha(sd, p, a, query, key, attn_bias=None, key_padding_mask=None, attn_mask=None):
    """unify_multihead_attention.py:117-523, standard same-batch branch.
    query/key are (T, B, D) as in the reference."""
    tgt_len, bsz, embed_dim = query.shape
    head_dim = embed_dim // a.heads
    scaling = float(head_dim * a.attn_scale_factor) ** -0.5
    q = o_linear(sd, p + ".q_proj", query) * scaling
    k = o_linear(sd, p + ".k_proj", key)
    v = o_linear(sd, p + ".v_proj", key)
    q = q.contiguous().view(tgt_len, bsz * a.heads, head_dim).transpose(0, 1)
    k = k.contiguous().view(-1, bsz * a.heads, head_dim).transpose(0, 1)
    v = v.contiguous().view(-1, bsz * a.heads, head_dim).transpose(0, 1)
    src_len = k.size(1)
    attn_weights = torch.bmm(q, k.transpose(1, 2))
    if attn_bias is not None:
        attn_weights[:, :, -src_len:] += attn_bias[:, :, -src_len:]
    if attn_mask is not None:  # (T, T) additive -inf causal mask
        attn_weights += attn_mask.unsqueeze(0)
    if key_padding_mask is not None:
        attn_weights = attn_weights.view(bsz, a.heads, tgt_len, src_len)
        attn_weights = attn_weights.masked_fill(
            key_padding_mask.unsqueeze(1).unsqueeze(2).to(torch.bool), float("-inf")
        )
        attn_weights = attn_weights.view(bsz * a.heads, tgt_len, src_len)
    probs = F.softmax(attn_weights, dim=-1)
    attn = torch.bmm(probs, v)
    attn = attn.transpose(0, 1).contiguous().view(tgt_len, bsz, embed_dim)
    if a.scale_heads:
        attn = attn.view(tgt_len, bsz, a.heads, head_dim)
        attn = torch.einsum("tbhd,h->tbhd", attn, t(sd, p + ".c_attn"))
        attn = attn.reshape(tgt_len, bsz, embed_dim)
    return o_linear(sd, p + ".out_proj", attn)


def o_ffn(sd, p, a, x):
    x = F.gelu(o_linear(sd, p + ".fc1", x))
    if a.scale_fc:
        x = o_ln(sd, p + ".ffn_layernorm", x)
    return o_linear(sd, p + ".fc2", x)


def o_encoder_layer(sd, p, a, x, padding_mask, bias):
    """unify_transformer_layer.py:222-292, normalize_before=True."""
    residual = x
    x = o_ln(sd, p + ".self_attn_layer_norm", x)
    x = o_mha(sd, p + ".self_attn", a, x, x, attn_bias=bias, key_padding_mask=padding_mask)
    if a.scale_attn:
        x = o_ln(sd, p + ".attn_ln", x)
    x = residual + x
    residual = x
    x = o_ln(sd, p + ".final_layer_norm", x)
    x = o_ffn(sd, p, a, x)
    if a.scale_resids:
        residual = residual * t(sd, p + ".w_resid")
    return residual + x


def o_decoder_layer(sd, p, a, x, enc, enc_pad, self_mask, self_bias, cross_bias):
    """unify_transformer_layer.py:431-581."""
    residual = x
    x = o_ln(sd, p + ".self_attn_layer_norm", x)
    x = o_mha(sd, p + ".self_attn", a, x, x, attn_bias=self_bias, attn_mask=self_mask)
    if a.scale_attn:
        x = o_ln(sd, p + ".self_attn_ln", x)
    x = residual + x
    residual = x
    x = o_ln(sd, p + ".encoder_attn_layer_norm", x)
    x = o_mha(
        sd, p + ".encoder_attn", a, x, enc, attn_bias=cross_bias,
        key_padding_mask=enc_pad,
    )
    if a.scale_attn:
        x = o_ln(sd, p + ".cross_attn_ln", x)
    x = residual + x
    residual = x
    x = o_ln(sd, p + ".final_layer_norm", x)
    x = o_ffn(sd, p, a, x)
    if a.scale_resids:
        residual = residual * t(sd, p + ".w_resid")
    return residual + x


# ------------------------------------------------- torch oracle: ResNet stem


def o_frozen_bn(sd, p, x):
    """frozen_bn.py:36-45."""
    scale = t(sd, p + ".weight") * (t(sd, p + ".running_var") + 1e-5).rsqrt()
    bias = t(sd, p + ".bias") - t(sd, p + ".running_mean") * scale
    return x * scale.reshape(1, -1, 1, 1) + bias.reshape(1, -1, 1, 1)


def o_bottleneck(sd, p, x, stride, downsample):
    """resnet.py:90-137 (V1.5: stride on the 3x3)."""
    out = F.conv2d(x, t(sd, p + ".conv1.weight"))
    out = F.relu(o_frozen_bn(sd, p + ".bn1", out))
    out = F.conv2d(out, t(sd, p + ".conv2.weight"), stride=stride, padding=1)
    out = F.relu(o_frozen_bn(sd, p + ".bn2", out))
    out = F.conv2d(out, t(sd, p + ".conv3.weight"))
    out = o_frozen_bn(sd, p + ".bn3", out)
    identity = x
    if downsample:
        identity = o_frozen_bn(
            sd, p + ".downsample.1",
            F.conv2d(x, t(sd, p + ".downsample.0.weight"), stride=stride),
        )
    return F.relu(identity + out)


def o_resnet(sd, p, a, x):
    """resnet.py:215-226 truncated after layer3 (stride 16, 1024 ch)."""
    x = F.conv2d(x, t(sd, p + ".conv1.weight"), stride=2, padding=3)
    x = F.relu(o_frozen_bn(sd, p + ".bn1", x))
    x = F.max_pool2d(x, 3, 2, 1)
    for stage, (blocks, stride) in enumerate(zip(a.resnet_layers, (1, 2, 2)), 1):
        for i in range(blocks):
            x = o_bottleneck(
                sd, f"{p}.layer{stage}.{i}", x,
                stride if i == 0 else 1, i == 0,
            )
    return x


# ----------------------------------------------- torch oracle: bucket tables


def o_token_bucket(bucket_size, max_position=1024):
    """encoder_module.py:71-84."""
    import math

    context = torch.arange(max_position, dtype=torch.long)[:, None]
    memory = torch.arange(max_position, dtype=torch.long)[None, :]
    rel = context - memory
    sign = torch.sign(rel)
    mid = bucket_size // 2
    abs_pos = torch.where((rel < mid) & (rel > -mid), torch.tensor(mid - 1), torch.abs(rel))
    log_pos = (
        torch.ceil(torch.log(abs_pos / mid) / math.log((max_position - 1) / mid) * (mid - 1)) + mid
    ).int()
    bucket = torch.where(abs_pos.le(mid), rel, (log_pos * sign).long())
    return bucket + bucket_size - 1


def o_image_bucket(bucket_size, num_rel_dis):
    """encoder_module.py:87-104."""
    coords = torch.stack(
        torch.meshgrid(torch.arange(bucket_size), torch.arange(bucket_size), indexing="ij")
    )
    flat = torch.flatten(coords, 1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += bucket_size - 1
    rel[:, :, 1] += bucket_size - 1
    rel[:, :, 0] *= 2 * bucket_size - 1
    index = torch.zeros((bucket_size * bucket_size + 1,) * 2, dtype=rel.dtype)
    index[1:, 1:] = rel.sum(-1)
    index[0, 0:] = num_rel_dis - 3
    index[0:, 0] = num_rel_dis - 2
    index[0, 0] = num_rel_dis - 1
    return index


def o_grid_ids(h, w, bucket):
    """encoder_module.py:339-341: row-major grid ids, row*bucket + col + 1."""
    return (
        torch.arange(w).unsqueeze(0).expand(h, w)
        + torch.arange(h).unsqueeze(1) * bucket
        + 1
    ).reshape(-1)


# ------------------------------------------------------ torch oracle: encoder


def _abs_pos_bias(sd, prefix, a, pos_embed, qname="pos_q_linear", kname="pos_k_linear"):
    """encoder_module.py:611-621 / decoder get_pos_info :335-366."""
    bsz, L, _ = pos_embed.shape
    pos_scaling = float(a.embed_dim / a.heads * a.attn_scale_factor) ** -0.5
    pos_q = (
        o_linear(sd, f"{prefix}.{qname}", pos_embed)
        .view(bsz, L, a.heads, -1).transpose(1, 2) * pos_scaling
    )
    pos_k = (
        o_linear(sd, f"{prefix}.{kname}", pos_embed)
        .view(bsz, L, a.heads, -1).transpose(1, 2)
    )
    return torch.matmul(pos_q, pos_k.transpose(2, 3))


def _interp_image_rel_bias(bias, oh, ow, h, w):
    """Double bilinear interp of the image rel bias, encoder_module.py:802-807
    (einops rearranges expressed as reshape/permute)."""
    B, D = bias.shape[:2]
    v = bias.reshape(B, D, oh, ow, oh, ow).permute(0, 2, 3, 1, 4, 5).reshape(B * oh * ow, D, oh, ow)
    v = F.interpolate(v, size=(h, w), mode="bilinear")
    v = v.reshape(B, oh, ow, D, h, w).permute(0, 4, 5, 3, 1, 2).reshape(B * h * w, D, oh, ow)
    v = F.interpolate(v, size=(h, w), mode="bilinear")
    v = v.reshape(B, h, w, D, h, w).permute(0, 3, 4, 5, 1, 2).reshape(B, D, h * w, h * w)
    return v


def oracle_encode(sd, a, src_tokens, patch_images=None, grid_embed=None):
    """encoder_module.py `encode` (:677-851) when ``patch_images`` is given, or
    `encode_with_artificial_image` (:499-675) when ``grid_embed`` (B, hw, D)
    precomputed EmbeddingBag means are given."""
    bsz, T = src_tokens.shape
    if patch_images is not None:
        feats = o_resnet(sd, "encoder.embed_images", a, patch_images)  # (B,1024,h,w)
        h, w = feats.shape[-2:]
        image_embed = feats.flatten(2).transpose(1, 2)  # (B, hw, 1024)
        image_embed_before_scale = o_linear(sd, "encoder.image_proj", image_embed)
    else:
        image_embed_before_scale = grid_embed
        h = w = a.patch_image_size // 16
    hw = h * w

    orig_hw = a.orig_patch_image_size // 16
    if hw > orig_hw * orig_hw:
        # bilinear interp of the orig-grid pos embed (:358-368 / :554-562)
        old_ids = o_grid_ids(orig_hw, orig_hw, a.image_bucket_size)
        old_pe = o_embed(sd, "encoder.embed_image_positions", old_ids)
        old_pe = old_pe.reshape(1, orig_hw, orig_hw, -1).permute(0, 3, 1, 2)
        image_pos_embed = F.interpolate(old_pe, size=(h, w), mode="bilinear")
        image_pos_embed = (
            image_pos_embed.permute(0, 2, 3, 1).reshape(1, hw, -1).expand(bsz, -1, -1)
        )
    else:
        ids = o_grid_ids(h, w, a.image_bucket_size)[None, :].expand(bsz, hw)
        image_pos_embed = o_embed(sd, "encoder.embed_image_positions", ids)

    encoder_padding_mask = torch.cat(
        [torch.zeros(bsz, hw, dtype=torch.bool), src_tokens.eq(PAD)], dim=1
    )
    has_pads = bool(encoder_padding_mask.any())

    pos_embed = o_embed(
        sd, "encoder.embed_positions",
        torch.arange(T)[None, :].expand(bsz, T),
    )
    # forward_embedding (:388-446 / :573-602); embed_scale = 1 (no_scale_embedding)
    x = o_embed(sd, "encoder.embed_tokens", src_tokens)
    x = x + o_embed(sd, "encoder.type_embedding", torch.zeros_like(src_tokens))
    x = o_ln(sd, "encoder.layernorm_embedding", x)
    image_x = image_embed_before_scale + o_embed(
        sd, "encoder.type_embedding", torch.ones(bsz, hw, dtype=torch.long)
    )
    image_x = o_ln(sd, "encoder.patch_layernorm_embedding", image_x)
    x = torch.cat([image_x, x], dim=1)
    if has_pads:
        x = x * (1 - encoder_padding_mask.unsqueeze(-1).type_as(x))
    x = x.transpose(0, 1)  # T-major

    pos_embed = o_ln(sd, "encoder.pos_ln", pos_embed)
    image_pos_embed = o_ln(sd, "encoder.image_pos_ln", image_pos_embed)
    pos_embed = torch.cat([image_pos_embed, pos_embed], dim=1)
    abs_bias = _abs_pos_bias(sd, "encoder", a, pos_embed)

    token_rp = o_token_bucket(a.token_bucket_size)[:T, :T]
    num_rel = (2 * a.image_bucket_size - 1) ** 2 + 3
    image_table_bucket = o_image_bucket(a.image_bucket_size, num_rel)

    L = hw + T
    for idx in range(a.layers):
        bias = abs_bias.clone()
        tok = F.embedding(token_rp, t(sd, f"encoder.token_rel_pos_table_list.{idx}.weight"))
        tok = tok.unsqueeze(0).expand(bsz, -1, -1, -1).permute(0, 3, 1, 2)
        bias[:, :, -T:, -T:] += tok
        if patch_images is not None:
            # rel bias always built on the ORIG grid then interpolated (:782-808)
            ids = o_grid_ids(orig_hw, orig_hw, a.image_bucket_size)[None, :].expand(
                bsz, orig_hw * orig_hw
            )
        else:
            # artificial path: actual grid ids, no interpolation (:546-549, :635)
            ids = o_grid_ids(h, w, a.image_bucket_size)[None, :].expand(bsz, hw)
        n = ids.shape[1]
        rp = (
            image_table_bucket.unsqueeze(0)
            .expand(bsz, *image_table_bucket.shape)
            .gather(1, ids[:, :, None].expand(bsz, n, image_table_bucket.size(1)))
            .gather(2, ids[:, None, :].expand(bsz, n, n))
        )
        img_bias = F.embedding(rp, t(sd, f"encoder.image_rel_pos_table_list.{idx}.weight"))
        img_bias = img_bias.permute(0, 3, 1, 2)
        if patch_images is not None:
            img_bias = _interp_image_rel_bias(img_bias, orig_hw, orig_hw, h, w)
        bias[:, :, :hw, :hw] += img_bias
        bias = bias.reshape(-1, L, L)
        x = o_encoder_layer(
            sd, f"encoder.layers.{idx}", a, x,
            encoder_padding_mask if has_pads else None, bias,
        )
    x = o_ln(sd, "encoder.layer_norm", x)
    return {
        "encoder_out": x,  # (L, B, D)
        "encoder_padding_mask": encoder_padding_mask,
        "position_embeddings": pos_embed,
        "image_embed_before_scale": image_embed_before_scale,
        "image_embed_shape": (h, w),
    }


# ---------------------------------------------- torch oracle: surrogate decode


def _interp_seg_axis(v, sb, h, w):
    """One BOS-threaded interpolation pass over the trailing axis
    (decoder_module.py:605-612): split [1, sb²], bilinear the grid block."""
    bos, seg = torch.split(v, [1, sb * sb], dim=-1)
    n, c = seg.shape[:2]
    seg = seg.reshape(n, c, sb, sb)
    seg = F.interpolate(seg, size=(h, w), mode="bilinear")
    seg = seg.reshape(n, c, h * w)
    return torch.cat([bos, seg], dim=-1)


def oracle_decode_surrogate(sd, a, bos_tokens, enc, full_context_alignment=False):
    """decoder_module.py extract_features_scriptable_surrogate (:486-677) +
    seg_projection output layer (:290-294, :864-870)."""
    h, w = enc["image_embed_shape"]
    hw = h * w
    tgt_len = hw + 1
    bsz = bos_tokens.size(0)
    sb = a.seg_bucket_size

    # decoder_input_type == encoder_output (:534-535)
    image_feats = enc["encoder_out"][:hw].transpose(0, 1)  # (B, hw, D)
    x = torch.cat([o_embed(sd, "decoder.embed_tokens", bos_tokens), image_feats], dim=1)

    # seg pos embed: grid ids r*sb + c + 1 interpolated to (h, w) (:541-550)
    old_ids = (
        torch.arange(sb).unsqueeze(0).expand(sb, sb)
        + torch.arange(sb).unsqueeze(1) * sb + 1
    )
    old_pe = o_embed(sd, "decoder.embed_seg_positions", old_ids)
    old_pe = old_pe.reshape(1, sb, sb, -1).permute(0, 3, 1, 2)
    image_pos_embed = F.interpolate(old_pe, size=(h, w), mode="bilinear")
    image_pos_embed = image_pos_embed.permute(0, 2, 3, 1).reshape(1, hw, -1).expand(bsz, -1, -1)
    bos_pe = o_embed(sd, "decoder.embed_seg_positions", torch.tensor([0]))
    tgt_pos_embed = torch.cat([bos_pe.unsqueeze(0).expand(bsz, -1, -1), image_pos_embed], dim=1)

    # self/cross abs pos bias with seg_pos_ln (:552-558, get_pos_info :335-366)
    tgt_pos_ln = o_ln(sd, "decoder.seg_pos_ln", tgt_pos_embed)
    pos_scaling = float(a.embed_dim / a.heads * a.attn_scale_factor) ** -0.5
    q = (
        o_linear(sd, "decoder.self_pos_q_linear", tgt_pos_ln)
        .view(bsz, tgt_len, a.heads, -1).transpose(1, 2) * pos_scaling
    )
    k = (
        o_linear(sd, "decoder.self_pos_k_linear", tgt_pos_ln)
        .view(bsz, tgt_len, a.heads, -1).transpose(1, 2)
    )
    self_abs = torch.matmul(q, k.transpose(2, 3))
    src_pos = enc["position_embeddings"]
    src_len = src_pos.size(1)
    cq = (
        o_linear(sd, "decoder.cross_pos_q_linear", tgt_pos_ln)
        .view(bsz, tgt_len, a.heads, -1).transpose(1, 2) * pos_scaling
    )
    ck = (
        o_linear(sd, "decoder.cross_pos_k_linear", src_pos)
        .view(bsz, src_len, a.heads, -1).transpose(1, 2)
    )
    cross_bias = torch.matmul(cq, ck.transpose(2, 3)).reshape(-1, tgt_len, src_len)

    # disable_entangle run-script flag => no tgt_pos add (:572-573)
    x = o_ln(sd, "decoder.layernorm_embedding", x)
    x = x.transpose(0, 1)  # T-major

    if full_context_alignment:
        self_mask = None
    else:
        self_mask = torch.triu(
            torch.full((tgt_len, tgt_len), float("-inf")), diagonal=1
        )

    seg_num_rel = (2 * sb - 1) ** 2 + 3
    seg_bucket = o_image_bucket(sb, seg_num_rel)

    enc_pad = enc["encoder_padding_mask"]
    for idx in range(a.layers):
        # per-layer seg rel bias with BOS threading + double interp (:601-627)
        table = t(sd, f"decoder.seg_rel_pos_table_list.{idx}.weight")
        old = F.embedding(seg_bucket, table).permute(2, 0, 1).unsqueeze(0)  # (1,c,N,N)
        c = old.size(1)
        v = old.permute(0, 3, 1, 2).reshape(sb * sb + 1, c, sb * sb + 1)  # (hw2, c, hw1)
        v = _interp_seg_axis(v, sb, h, w)  # interp query axis -> (hw2, c, tgt)
        v = v.reshape(1, sb * sb + 1, c, tgt_len).permute(0, 3, 2, 1).reshape(tgt_len, c, sb * sb + 1)
        v = _interp_seg_axis(v, sb, h, w)  # interp key axis -> (tgt, c, tgt)
        rel = v.reshape(1, tgt_len, c, tgt_len).permute(0, 2, 1, 3)  # (1,c,tgt,tgt)
        self_bias = (self_abs + rel).reshape(-1, tgt_len, tgt_len)
        x = o_decoder_layer(
            sd, f"decoder.layers.{idx}", a, x,
            enc["encoder_out"], enc_pad, self_mask, self_bias, cross_bias,
        )
    x = o_ln(sd, "decoder.layer_norm", x)
    x = x.transpose(0, 1)  # (B, T, D)
    # tied seg projection (:128-137)
    return F.linear(x, t(sd, "decoder.seg_embed_tokens.weight"))


# ----------------------------------------------------------------- the tests


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    _, fresh = SegOFAVariables.init(cfg, jax.random.PRNGKey(0))
    params = randomize(jax.device_get(fresh))
    sd = flax_to_torch_sd(params)
    jax_params = convert_torch_state_dict(sd, cfg.vocab_size, reference_params=params)
    model = SegOFA(cfg)
    return cfg, model, jax_params, sd


def _inputs(cfg, image_size, seed=1):
    rng = np.random.default_rng(seed)
    b, T = 2, 7
    src = rng.integers(4, 2000, size=(b, T)).astype(np.int32)
    src[0, 5:] = PAD  # exercise key-padding masking
    src[1, 6:] = PAD
    images = rng.normal(0, 0.5, size=(b, image_size, image_size, 3)).astype(np.float32)
    bos = np.zeros((b, 1), np.int32)
    return src, images, bos


def _run_jax(model, params, src, images, bos):
    logits, extra = model.apply(
        {"params": params},
        src_tokens=jnp.asarray(src),
        patch_images=jnp.asarray(images),
        bos_tokens=jnp.asarray(bos),
        deterministic=True,
    )
    return np.asarray(logits), extra["encoder_returns"]


def _run_oracle(sd, a, src, images, bos):
    enc = oracle_encode(
        sd, a, torch.tensor(src, dtype=torch.long),
        patch_images=torch.tensor(images).permute(0, 3, 1, 2),
    )
    logits = oracle_decode_surrogate(sd, a, torch.tensor(bos, dtype=torch.long), enc)
    return logits.numpy(), enc


@pytest.mark.parametrize("image_size", [64, 96])
def test_real_image_forward_parity(setup, image_size):
    """Full encoder+surrogate-decoder vs the torch oracle.

    image_size=64 -> 4x4 grid: encoder rel-bias interp 2->4, seg interp is
    identity (sb=4).  image_size=96 -> 6x6 grid: encoder interp 2->6 AND seg
    interp 4->6 with BOS threading — the ragged native-resolution eval case.
    """
    cfg, model, jax_params, sd = setup
    a = A()
    src, images, bos = _inputs(cfg, image_size)

    with torch.no_grad():
        want_logits, want_enc = _run_oracle(sd, a, src, images, bos)
    got_logits, got_enc = _run_jax(model, jax_params, src, images, bos)

    want_enc_out = want_enc["encoder_out"].transpose(0, 1).numpy()  # (B, L, D)
    got_enc_out = np.asarray(got_enc["encoder_out"])
    np.testing.assert_allclose(got_enc_out, want_enc_out, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(got_logits, want_logits, atol=5e-4, rtol=1e-3)


def test_artificial_image_forward_parity(setup):
    """Image-free training branch: EmbeddingBag grid vs class-mean gather
    (encoder_module.py:499-675) + surrogate decode."""
    cfg, model, jax_params, sd = setup
    a = A()
    rng = np.random.default_rng(2)
    b = 2
    hw = (cfg.patch_image_size // 16) ** 2
    n_class = cfg.num_seg_tokens + 1
    class_tokens = rng.integers(4, 2000, size=(n_class, 3)).astype(np.int32)
    class_lengths = rng.integers(1, 4, size=(n_class,)).astype(np.int32)
    for i in range(n_class):  # zero out padding so the oracle mean is well-defined
        class_tokens[i, class_lengths[i]:] = PAD
    grid_ids = rng.integers(0, n_class, size=(b, hw)).astype(np.int32)
    src = rng.integers(4, 2000, size=(b, 6)).astype(np.int32)
    src[0, 4:] = PAD
    bos = np.zeros((b, 1), np.int32)

    # oracle: per-cell mean over the cell's class-name tokens (the semantics
    # the reference's flattened EmbeddingBag offsets implement, :529-542)
    with torch.no_grad():
        weight = t(sd, "encoder.embed_tokens.weight")
        cell_embeds = []
        for i in range(n_class):
            toks = torch.tensor(class_tokens[i, : class_lengths[i]], dtype=torch.long)
            cell_embeds.append(weight[toks].mean(0))
        cell_embeds = torch.stack(cell_embeds)  # (C, D)
        grid_embed = cell_embeds[torch.tensor(grid_ids, dtype=torch.long)]
        enc = oracle_encode(
            sd, a, torch.tensor(src, dtype=torch.long), grid_embed=grid_embed
        )
        want = oracle_decode_surrogate(
            sd, a, torch.tensor(bos, dtype=torch.long), enc
        ).numpy()

    _, extra = model.apply(
        {"params": jax_params},
        bos_tokens=jnp.asarray(bos),
        aux_grid_ids=jnp.asarray(grid_ids),
        aux_src_tokens=jnp.asarray(src),
        class_tokens=jnp.asarray(class_tokens),
        class_lengths=jnp.asarray(class_lengths),
        deterministic=True,
    )
    got = np.asarray(extra["aux_output"])
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_full_context_alignment_parity(setup):
    """Surrogate decode without the causal mask (full_context_alignment)."""
    cfg, model, jax_params, sd = setup
    a = A()
    src, images, bos = _inputs(cfg, 64, seed=3)
    with torch.no_grad():
        enc = oracle_encode(
            sd, a, torch.tensor(src, dtype=torch.long),
            patch_images=torch.tensor(images).permute(0, 3, 1, 2),
        )
        want = oracle_decode_surrogate(
            sd, a, torch.tensor(bos, dtype=torch.long), enc,
            full_context_alignment=True,
        ).numpy()
    logits, _ = model.apply(
        {"params": jax_params},
        src_tokens=jnp.asarray(src),
        patch_images=jnp.asarray(images),
        bos_tokens=jnp.asarray(bos),
        full_context_alignment=True,
        deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(logits), want, atol=5e-4, rtol=1e-3)


# --------------------------------------- adapters + prefix prompts (round 2)


def o_adapter(sd, p, x):
    """unify_transformer_layer.py:49-94 Adapter_Layer (scale=1.0, no dropout):
    x + up_proj(relu(down_proj(x)))."""
    down = F.relu(o_linear(sd, p + ".down_proj", x))
    return x + o_linear(sd, p + ".up_proj", down)


def test_adapter_layer_parity():
    """Encoder layer with --adapter vs the torch expression (adapter applied
    to the FFN output before the residual, ref :285-289)."""
    from ifseg_tpu.models.layers import EncoderLayer

    a = A()
    rng = np.random.default_rng(11)
    b, l, d = 2, 6, a.embed_dim
    layer = EncoderLayer(
        embed_dim=d, ffn_dim=a.ffn_dim, num_heads=a.heads,
        attn_scale_factor=a.attn_scale_factor, scale_attn=True, scale_fc=True,
        scale_heads=True, scale_resids=True, dropout=0.0,
        use_adapter=True, adapter_dim=8,
    )
    x = jnp.asarray(rng.normal(size=(b, l, d)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(a.heads, l, l)), jnp.float32)
    params = jax.device_get(layer.init(jax.random.PRNGKey(0), x, None, bias)["params"])
    params = randomize(params, seed=12)

    # flatten the flax layer params into the torch oracle's naming
    sd = {}
    for attn in ("self_attn",):
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"L.{attn}.{proj}.weight"] = params[attn][proj]["kernel"].T
            sd[f"L.{attn}.{proj}.bias"] = params[attn][proj]["bias"]
        sd["L.self_attn.c_attn"] = params[attn]["c_attn"]
    for ln in ("self_attn_layer_norm", "attn_ln", "final_layer_norm"):
        sd[f"L.{ln}.weight"] = params[ln]["scale"]
        sd[f"L.{ln}.bias"] = params[ln]["bias"]
    sd["L.fc1.weight"] = params["ffn"]["fc1"]["kernel"].T
    sd["L.fc1.bias"] = params["ffn"]["fc1"]["bias"]
    sd["L.fc2.weight"] = params["ffn"]["fc2"]["kernel"].T
    sd["L.fc2.bias"] = params["ffn"]["fc2"]["bias"]
    sd["L.ffn_layernorm.weight"] = params["ffn"]["ffn_layernorm"]["scale"]
    sd["L.ffn_layernorm.bias"] = params["ffn"]["ffn_layernorm"]["bias"]
    sd["L.adapter.down_proj.weight"] = params["adapter"]["down_proj"]["kernel"].T
    sd["L.adapter.down_proj.bias"] = params["adapter"]["down_proj"]["bias"]
    sd["L.adapter.up_proj.weight"] = params["adapter"]["up_proj"]["kernel"].T
    sd["L.adapter.up_proj.bias"] = params["adapter"]["up_proj"]["bias"]
    sd["L.w_resid"] = params["w_resid"]

    got = layer.apply({"params": params}, x, None, bias, True)

    a2 = A()
    xt = torch.tensor(np.asarray(x)).transpose(0, 1)  # (T, B, D)
    bias_t = torch.tensor(np.asarray(bias)).repeat(b, 1, 1)  # (B*H, L, L)
    with torch.no_grad():
        # o_encoder_layer without adapter, then re-derive with adapter inline
        residual = xt
        y = o_ln(sd, "L.self_attn_layer_norm", xt)
        y = o_mha(sd, "L.self_attn", a2, y, y, attn_bias=bias_t)
        y = o_ln(sd, "L.attn_ln", y)
        xt2 = residual + y
        residual = xt2
        y = o_ln(sd, "L.final_layer_norm", xt2)
        y = o_ffn(sd, "L", a2, y)
        y = o_adapter(sd, "L.adapter", y)
        residual = residual * t(sd, "L.w_resid")
        want = (residual + y).transpose(0, 1).numpy()

    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def test_prompt_kv_oracle_parity():
    """MultiheadAttention prompt-KV prepend vs the reference's semantics
    (unify_multihead_attention.py:453-459: prompt rows prepended to K/V
    after projection; attn_bias applies to the trailing src_len keys)."""
    from ifseg_tpu.models.attention import MultiheadAttention

    a = A()
    rng = np.random.default_rng(13)
    b, l, d, p_len = 2, 6, a.embed_dim, 3
    hd = d // a.heads
    x = jnp.asarray(rng.normal(size=(b, l, d)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(a.heads, l, l)), jnp.float32)
    prompt_kv = jnp.asarray(rng.normal(size=(2, a.heads, p_len, hd)), jnp.float32)

    mha = MultiheadAttention(d, a.heads, scale_factor=a.attn_scale_factor,
                             scale_heads=True)
    params = jax.device_get(mha.init(jax.random.PRNGKey(0), x, bias=bias)["params"])
    got = mha.apply({"params": params}, x, bias=bias, prompt_kv=prompt_kv)

    sd = {}
    for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
        sd[f"M.{proj}.weight"] = params[proj]["kernel"].T
        sd[f"M.{proj}.bias"] = params[proj]["bias"]
    sd["M.c_attn"] = params["c_attn"]

    with torch.no_grad():
        xt = torch.tensor(np.asarray(x)).transpose(0, 1)  # (T, B, D)
        tgt_len, bsz, _ = xt.shape
        scaling = float(hd * a.attn_scale_factor) ** -0.5
        q = o_linear(sd, "M.q_proj", xt) * scaling
        k = o_linear(sd, "M.k_proj", xt)
        v = o_linear(sd, "M.v_proj", xt)
        q = q.contiguous().view(tgt_len, bsz * a.heads, hd).transpose(0, 1)
        k = k.contiguous().view(-1, bsz * a.heads, hd).transpose(0, 1)
        v = v.contiguous().view(-1, bsz * a.heads, hd).transpose(0, 1)
        src_len = k.size(1)  # BEFORE the prompt prepend (ref :383)
        # prompt_kv (2, H, P, hd) -> (B*H, P, hd) rows shared across batch
        pk = torch.tensor(np.asarray(prompt_kv[0])).repeat(bsz, 1, 1)
        pv = torch.tensor(np.asarray(prompt_kv[1])).repeat(bsz, 1, 1)
        k = torch.cat([pk, k], dim=1)
        v = torch.cat([pv, v], dim=1)
        w = torch.bmm(q, k.transpose(1, 2))
        bias_t = torch.tensor(np.asarray(bias)).repeat(bsz, 1, 1)
        w[:, :, -src_len:] += bias_t  # ref :464-465
        probs = F.softmax(w, dim=-1)
        attn = torch.bmm(probs, v)
        attn = attn.transpose(0, 1).contiguous().view(tgt_len, bsz, d)
        attn = attn.view(tgt_len, bsz, a.heads, hd)
        attn = torch.einsum("tbhd,h->tbhd", attn, t(sd, "M.c_attn"))
        attn = attn.reshape(tgt_len, bsz, d)
        want = o_linear(sd, "M.out_proj", attn).transpose(0, 1).numpy()

    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


# ----------------------------------------- full-dims parity (OFA-Base scale)


class ABase(A):
    """OFA-Base dims (segofa.py:422-431): the scale the real checkpoint runs
    at — d=768, 12 heads, 6+6 layers, ResNet-101, 1024 image tokens (512px).
    orig_patch_image_size=384 forces the encoder pos-embed interpolation and
    the double-bilinear image rel-bias interp (encoder_module.py:358-368,
    :799-808) on the 24->32 grid, i.e. the exact native-resolution-eval code
    path real-checkpoint inference exercises."""

    embed_dim = 768
    ffn_dim = 3072
    heads = 12
    layers = 6
    patch_image_size = 512
    orig_patch_image_size = 384
    resnet_layers = (3, 4, 23)  # resnet101


def test_full_dims_forward_parity():
    """One fp32 forward (b=1) at OFA-Base dims vs the torch oracle.

    The toy-dims suite above pins the bias-chain *logic*; this pins the
    *numerics at scale* (d=768, L=1040, 6+6 layers) where accumulated error
    or a wrong normalization would hide at embed-32.  Budgeted to a single
    forward (VERDICT r3 item 2b); ~1e11 FLOPs per side, minutes on one CPU
    core — 'oracle' tier.
    """
    a = ABase()
    cfg = model_config_for_arch(
        "segofa_base",
        patch_image_size=a.patch_image_size,
        orig_patch_image_size=a.orig_patch_image_size,
        num_seg_tokens=a.num_seg,
        scale_resids=True,
        activation_fn="gelu",
        dtype="float32",
        use_flash_attention=False,
        checkpoint_activations=False,
        dropout=0.0,
        attention_dropout=0.0,
        encoder_drop_path_rate=0.0,
        decoder_drop_path_rate=0.0,
    )
    _, fresh = SegOFAVariables.init(cfg, jax.random.PRNGKey(0))
    params = randomize(jax.device_get(fresh))
    sd = flax_to_torch_sd(params)
    jax_params = convert_torch_state_dict(sd, cfg.vocab_size, reference_params=params)
    model = SegOFA(cfg)

    rng = np.random.default_rng(7)
    b, T = 1, 16
    src = rng.integers(4, 40000, size=(b, T)).astype(np.int32)
    src[0, 13:] = PAD
    images = rng.normal(0, 0.5, size=(b, a.patch_image_size, a.patch_image_size, 3)).astype(np.float32)
    bos = np.zeros((b, 1), np.int32)

    with torch.no_grad():
        want_logits, want_enc = _run_oracle(sd, a, src, images, bos)
    got_logits, got_enc = _run_jax(model, jax_params, src, images, bos)

    want_enc_out = want_enc["encoder_out"].transpose(0, 1).numpy()
    got_enc_out = np.asarray(got_enc["encoder_out"])
    # fp32 at depth 12 over L=1040: allow accumulated-rounding headroom while
    # still catching any bias/normalization mistake (those shift logits O(1))
    np.testing.assert_allclose(got_enc_out, want_enc_out, atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(got_logits, want_logits, atol=5e-3, rtol=2e-3)
    # and the prediction itself must agree everywhere
    assert np.array_equal(
        np.argmax(got_logits, axis=-1), np.argmax(want_logits, axis=-1)
    )
