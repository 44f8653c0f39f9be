"""Native-resolution mIoU evaluation under static XLA shapes.

Reference protocol (criterions/seg_criterion.py:195-217, :289-347): batch 1,
keep-ratio resized image, one surrogate decoder pass, optional ResNet label
propagation, logits bilinearly upsampled to the ORIGINAL resolution, per-class
confusion areas vs the original-resolution target.

TPU-native design (SURVEY.md §7 "ragged eval" hard part): images and targets
are zero-padded into shape buckets (multiples of ``BUCKET`` pixels); the model
runs a padded forward whose valid region bit-matches the unpadded math
(models/encoder.encode_padded), and the upsample-to-original uses
dynamic-valid interpolation matrices.  One compiled function per
(image-bucket, target-bucket) pair — a handful of compilations for a whole
val set, instead of one per unique image shape.
"""

import logging
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ifseg_tpu.config import Config
from ifseg_tpu.data.segmentation_dataset import EvalSample
from ifseg_tpu.models.segofa import SegOFA
from ifseg_tpu.ops.histogram import confusion_areas
from ifseg_tpu.ops.resize import bilinear_matrix_dyn

logger = logging.getLogger(__name__)

BUCKET = 256  # pixel granularity of shape buckets
ROW_CHUNK = 128  # original-resolution rows upsampled per scan step


def _bucket(n: int) -> int:
    return max(-(-n // BUCKET) * BUCKET, BUCKET)


def masked_label_propagation(probs, resnet_feats, key_valid, topk: int, iters: int):
    """ResNet top-k cosine label propagation (seg_criterion.py:197-213) with
    invalid (padded) cells excluded from the similarity graph."""
    f = resnet_feats.astype(jnp.float32)
    f = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-12)
    sim = jnp.einsum("bld,bmd->blm", f, f, preferred_element_type=jnp.float32)
    sim = jnp.where(key_valid[None, None, :], sim, -jnp.inf)
    _, topk_ind = jax.lax.top_k(sim, topk)

    def body(p, _):
        gathered = jnp.take_along_axis(
            p[:, None, :, :], topk_ind[:, :, :, None], axis=2
        )
        return jnp.mean(gathered, axis=2), None

    out, _ = jax.lax.scan(body, probs.astype(jnp.float32), None, length=iters)
    return out


class Evaluator:
    def __init__(self, cfg: Config, model: SegOFA, mesh=None):
        self.cfg = cfg
        self.model = model
        self.mesh = mesh
        self._fns: Dict[Tuple[int, int, int, int], callable] = {}

    # ---------------------------------------------------------- compiled core

    def _make_fn(self, img_hw: Tuple[int, int], ori_hw: Tuple[int, int]):
        cfg = self.cfg
        num_seg = cfg.model.num_seg_tokens
        crit = cfg.criterion
        Ho, Wo = ori_hw
        assert Ho % ROW_CHUNK == 0
        chunks = Ho // ROW_CHUNK

        def fn(params, src_tokens, image, img_h, img_w, bos, target, ori_h, ori_w):
            logits, enc = self.model.apply(
                {"params": params},
                src_tokens,
                image,
                img_h,
                img_w,
                bos,
                crit.full_context_alignment,
                method=SegOFA.eval_forward,
            )
            Hp, Wp = enc["image_embed_shape"]
            hp, wp = enc["valid_hw"]
            hw = Hp * Wp
            c = logits.shape[-1]
            grid = logits[:, :hw].reshape(1, Hp, Wp, c).astype(jnp.float32)

            post_grid = None
            if crit.resnet_iters > 0:
                probs = jax.nn.softmax(
                    logits[:, :hw].astype(jnp.float32) / crit.resnet_prob_temperature,
                    axis=-1,
                )
                probs = jnp.where(enc["grid_valid"][None, :, None], probs, 0.0)
                post = masked_label_propagation(
                    probs,
                    enc["image_embed_before_proj"],
                    enc["grid_valid"],
                    crit.resnet_topk,
                    crit.resnet_iters,
                )
                post_grid = post.reshape(1, Hp, Wp, c)

            # dynamic-valid upsample matrices: valid (hp, wp) grid -> original
            uh = bilinear_matrix_dyn(Hp, Ho, ori_h, in_valid=hp)
            uw = bilinear_matrix_dyn(Wp, Wo, ori_w, in_valid=wp)
            r = jnp.arange(Ho)[:, None]
            cc = jnp.arange(Wo)[None, :]
            in_bounds = (r < ori_h) & (cc < ori_w)
            valid = in_bounds[None] & (target != num_seg)

            areas, ce = _upsampled_areas_dyn(
                grid, target, valid, num_seg, uh, uw, chunks
            )
            out = {
                "area_intersect": areas[0],
                "area_pred_label": areas[1],
                "area_label": areas[2],
                "area_union": areas[3],
                "nll_loss": ce[0] / jnp.maximum(ce[1], 1.0),
            }
            out["loss"] = out["nll_loss"]
            if post_grid is not None:
                pareas, _ = _upsampled_areas_dyn(
                    post_grid, target, valid, num_seg, uh, uw, chunks
                )
                out.update(
                    {
                        "area_intersect_resnet_postprocess": pareas[0],
                        "area_pred_label_resnet_postprocess": pareas[1],
                        "area_label_resnet_postprocess": pareas[2],
                        "area_union_resnet_postprocess": pareas[3],
                    }
                )
            return out

        return jax.jit(fn)

    # ----------------------------------------------------------------- driver

    def eval_sample(self, params, sample: EvalSample) -> Dict[str, np.ndarray]:
        img = sample.patch_image
        seg = sample.ori_semantic_seg
        h, w = img.shape[:2]
        H, W = seg.shape[:2]
        Hb, Wb = _bucket(h), _bucket(w)
        Ho, Wo = _bucket(H), _bucket(W)
        key = (Hb, Wb, Ho, Wo)
        if key not in self._fns:
            logger.info("compiling eval fn for bucket %s", key)
            self._fns[key] = self._make_fn((Hb, Wb), (Ho, Wo))

        image = np.zeros((1, Hb, Wb, 3), np.float32)
        image[0, :h, :w] = img
        target = np.full((1, Ho, Wo), self.cfg.model.num_seg_tokens, np.int32)
        target[0, :H, :W] = seg

        out = self._fns[key](
            params,
            sample.src_tokens[None].astype(np.int32),
            image,
            np.int32(h),
            np.int32(w),
            sample.bos_token[None].astype(np.int32),
            target,
            np.int32(H),
            np.int32(W),
        )
        return jax.device_get(out)


def _upsampled_areas_dyn(grid, target, valid, num_classes, uh, uw, chunks):
    """Chunked upsample -> (areas, (ce_sum, ce_count)) with runtime matrices."""
    b, Hp, Wp, c = grid.shape
    Ho = uh.shape[0]
    rows = Ho // chunks
    tmp = jnp.einsum(
        "Wj,bhjc->bhWc", uw, grid, preferred_element_type=jnp.float32
    )
    uh_chunks = uh.reshape(chunks, rows, Hp)

    zeros = lambda: jnp.zeros((num_classes,), jnp.float32)
    init = (
        (zeros(), zeros(), zeros(), zeros()),
        (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)),
    )

    def body(carry, xs):
        i, uh_c = xs
        areas, (ce_sum, ce_cnt) = carry
        chunk = jnp.einsum(
            "rk,bkWc->brWc", uh_c, tmp, preferred_element_type=jnp.float32
        )
        tgt = jax.lax.dynamic_slice_in_dim(target, i * rows, rows, axis=1)
        vld = jax.lax.dynamic_slice_in_dim(valid, i * rows, rows, axis=1)
        pred = jnp.argmax(chunk, axis=-1)
        a = confusion_areas(pred, tgt, num_classes, valid=vld)
        logp = jax.nn.log_softmax(chunk, axis=-1)
        t = jnp.clip(tgt, 0, num_classes - 1)
        nll = -jnp.take_along_axis(logp, t[..., None], axis=-1)[..., 0]
        wv = vld.astype(jnp.float32)
        carry = (
            tuple(x + y for x, y in zip(areas, a)),
            (ce_sum + jnp.sum(nll * wv), ce_cnt + jnp.sum(wv)),
        )
        return carry, None

    (areas, ce), _ = jax.lax.scan(body, init, (jnp.arange(chunks), uh_chunks))
    return areas, ce
