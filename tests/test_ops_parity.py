"""Numerical parity of resize / bucket / histogram ops against torch oracles.

The reference relies on exact torch semantics for bilinear (align_corners=False)
and torchvision legacy-nearest resizes and on two bucket-position formulas; any
mismatch silently degrades mIoU (SURVEY.md §7 "hard parts").
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from ifseg_tpu.ops.resize import (
    bilinear_matrix,
    nearest_indices,
    resize_bilinear,
    resize_nearest_np,
)
from ifseg_tpu.ops.histogram import confusion_areas
from ifseg_tpu.models.position import (
    make_image_bucket_position,
    make_token_bucket_position,
)


@pytest.mark.parametrize("in_hw,out_hw", [((32, 32), (512, 512)), ((32, 32), (43, 57)), ((6, 9), (3, 4)), ((5, 5), (5, 5))])
def test_bilinear_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, *in_hw)).astype(np.float32)  # NCHW for torch
    ref = F.interpolate(torch.from_numpy(x), size=out_hw, mode="bilinear", align_corners=False).numpy()
    got = resize_bilinear(jnp.asarray(x.transpose(0, 2, 3, 1)), out_hw, h_axis=1, w_axis=2)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((32, 32), (512, 512)), ((7, 13), (3, 4)), ((1, 33), (32, 32)), ((4, 4), (32, 32))])
def test_nearest_matches_torchvision(in_hw, out_hw):
    # torchvision.transforms.Resize(NEAREST) on tensors delegates to
    # F.interpolate(mode="nearest") (legacy nearest); torchvision itself is not
    # in this image, so the oracle is the underlying torch op.
    rng = np.random.default_rng(1)
    x = rng.integers(0, 20, size=in_hw).astype(np.int64)
    ref = (
        F.interpolate(torch.from_numpy(x)[None, None].float(), size=out_hw, mode="nearest")
        .numpy()[0, 0]
        .astype(np.int64)
    )
    got = resize_nearest_np(x, out_hw)
    np.testing.assert_array_equal(got, ref)


def test_token_bucket_matches_torch_formula():
    import math

    bucket_size, max_position = 256, 1024
    context = torch.arange(max_position, dtype=torch.long)[:, None]
    memory = torch.arange(max_position, dtype=torch.long)[None, :]
    rel = context - memory
    sign = torch.sign(rel)
    mid = bucket_size // 2
    abs_pos = torch.where((rel < mid) & (rel > -mid), mid - 1, torch.abs(rel))
    log_pos = (
        torch.ceil(
            torch.log(abs_pos / mid) / math.log((max_position - 1) / mid) * (mid - 1)
        )
        + mid
    ).int()
    ref = torch.where(abs_pos.le(mid), rel, (log_pos * sign).long()) + bucket_size - 1
    got = make_token_bucket_position(bucket_size, max_position)
    np.testing.assert_array_equal(got, ref.numpy())


def test_image_bucket_matches_torch_formula():
    bucket_size = 8
    num_rel = (2 * bucket_size - 1) ** 2 + 3
    coords = torch.stack(
        torch.meshgrid([torch.arange(bucket_size), torch.arange(bucket_size)], indexing="ij")
    )
    flat = torch.flatten(coords, 1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += bucket_size - 1
    rel[:, :, 1] += bucket_size - 1
    rel[:, :, 0] *= 2 * bucket_size - 1
    ref = torch.zeros((bucket_size**2 + 1,) * 2, dtype=rel.dtype)
    ref[1:, 1:] = rel.sum(-1)
    ref[0, 0:] = num_rel - 3
    ref[0:, 0] = num_rel - 2
    ref[0, 0] = num_rel - 1
    got = make_image_bucket_position(bucket_size, num_rel)
    np.testing.assert_array_equal(got, ref.numpy())


def test_confusion_areas_matches_histc():
    rng = np.random.default_rng(2)
    c = 7
    pred = rng.integers(0, c, size=500)
    tgt = rng.integers(0, c, size=500)
    inter, ap, al, au = confusion_areas(jnp.asarray(pred), jnp.asarray(tgt), c)
    p, t = torch.from_numpy(pred).float(), torch.from_numpy(tgt).float()
    ref_inter = torch.histc(p[pred == tgt], bins=c, min=0, max=c - 1).numpy()
    ref_ap = torch.histc(p, bins=c, min=0, max=c - 1).numpy()
    ref_al = torch.histc(t, bins=c, min=0, max=c - 1).numpy()
    np.testing.assert_allclose(np.asarray(inter), ref_inter)
    np.testing.assert_allclose(np.asarray(ap), ref_ap)
    np.testing.assert_allclose(np.asarray(al), ref_al)
    np.testing.assert_allclose(np.asarray(au), ref_ap + ref_al - ref_inter)


def test_class_mean_embeddings_matches_embeddingbag():
    from ifseg_tpu.models.encoder import class_mean_embeddings

    rng = np.random.default_rng(3)
    v, d = 50, 16
    table = rng.standard_normal((v, d)).astype(np.float32)
    lengths = np.array([1, 3, 2, 4], dtype=np.int64)
    tokens_flat = rng.integers(0, v, size=lengths.sum())
    offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    bag = torch.nn.EmbeddingBag.from_pretrained(torch.from_numpy(table), mode="mean")
    ref = bag(torch.from_numpy(tokens_flat), offsets=torch.from_numpy(offsets)).numpy()

    tmax = lengths.max()
    padded = np.zeros((len(lengths), tmax), dtype=np.int64)
    for i, (off, ln) in enumerate(zip(offsets, lengths)):
        padded[i, :ln] = tokens_flat[off : off + ln]
    got = class_mean_embeddings(jnp.asarray(table), jnp.asarray(padded), jnp.asarray(lengths))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-6)


def test_grid_gather_backward_matches_plain():
    """gather_grid_bias_all_layers: the structure-aware backward (delta-class
    contraction, position.py) must match the plain gather's autodiff
    scatter-add exactly — image grid, BOS-prefixed seg grid, and a clipped
    padded grid."""
    import jax
    from ifseg_tpu.models.position import (
        gather_grid_bias_all_layers,
        gather_rel_bias_all_layers,
        image_num_rel_dis,
        image_rel_bucket_direct,
        image_rp_bucket_for_grid,
        make_image_bucket_position,
    )

    rng = np.random.default_rng(0)
    cases = [
        (image_rp_bucket_for_grid(4, 4, 8), (4, 4), False, image_num_rel_dis(8)),
        (make_image_bucket_position(4, 7 * 7 + 3), (4, 4), True, 7 * 7 + 3),
        # padded grid wider than the bucket: clipped deltas
        (image_rel_bucket_direct(6, 5, 4), (6, 5), False, 7 * 7),
    ]
    for rp, hw, bos, num_rel in cases:
        table = jnp.asarray(
            rng.standard_normal((3, num_rel, 2)).astype(np.float32)
        )
        cot = jnp.asarray(
            rng.standard_normal((3, 2) + rp.shape).astype(np.float32)
        )

        def loss_new(t):
            return jnp.vdot(gather_grid_bias_all_layers(t, rp, hw, bos=bos), cot)

        def loss_old(t):
            return jnp.vdot(gather_rel_bias_all_layers(t, rp), cot)

        fwd_new = gather_grid_bias_all_layers(table, rp, hw, bos=bos)
        fwd_old = gather_rel_bias_all_layers(table, rp)
        np.testing.assert_array_equal(np.asarray(fwd_new), np.asarray(fwd_old))
        g_new = jax.grad(loss_new)(table)
        g_old = jax.grad(loss_old)(table)
        np.testing.assert_allclose(
            np.asarray(g_new), np.asarray(g_old), rtol=1e-5, atol=1e-5
        )


def test_grid_gather_bf16_emission_exact():
    """dtype=bfloat16 emission must equal the fp32 expansion cast to bf16
    elementwise (each output element is a single one-hot product of a table
    value, so the expansion is exact in any dtype), and the table gradient
    must stay fp32 with fp32 accumulation."""
    import jax
    import jax.numpy as jnp
    from ifseg_tpu.models.position import (
        gather_grid_bias_all_layers,
        image_num_rel_dis,
        image_rp_bucket_for_grid,
        make_image_bucket_position,
    )

    rng = np.random.default_rng(1)
    cases = [
        (image_rp_bucket_for_grid(4, 4, 8), (4, 4), False, image_num_rel_dis(8)),
        (make_image_bucket_position(4, 7 * 7 + 3), (4, 4), True, 7 * 7 + 3),
    ]
    for rp, hw, bos, num_rel in cases:
        table = jnp.asarray(
            rng.standard_normal((3, num_rel, 2)).astype(np.float32)
        )
        f32 = gather_grid_bias_all_layers(table, rp, hw, bos=bos)
        b16 = gather_grid_bias_all_layers(
            table, rp, hw, bos=bos, dtype=jnp.bfloat16
        )
        assert b16.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(f32.astype(jnp.bfloat16)), np.asarray(b16)
        )

        cot16 = jnp.asarray(
            rng.standard_normal((3, 2) + rp.shape).astype(np.float32)
        ).astype(jnp.bfloat16)

        def loss16(t):
            return jnp.vdot(
                gather_grid_bias_all_layers(
                    t, rp, hw, bos=bos, dtype=jnp.bfloat16
                ).astype(jnp.float32),
                cot16.astype(jnp.float32),
            )

        def loss32(t):
            return jnp.vdot(
                gather_grid_bias_all_layers(t, rp, hw, bos=bos),
                cot16.astype(jnp.float32),
            )

        g16 = jax.grad(loss16)(table)
        g32 = jax.grad(loss32)(table)
        assert g16.dtype == jnp.float32
        # same bf16-quantized cotangent on both sides; the bf16 path reads it
        # natively but accumulates fp32, so grads agree to bf16 read-off error
        np.testing.assert_allclose(
            np.asarray(g16), np.asarray(g32), rtol=2e-2, atol=2e-2
        )
