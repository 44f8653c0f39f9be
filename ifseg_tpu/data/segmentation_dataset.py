"""Segmentation dataset: TSV rows -> fixed-shape numpy batches.

Mirrors data/mm_data/segmentation_dataset.py with a TPU-first data contract:
every training batch has identical shapes so the train step compiles once.

Per-row processing (ref :210-347):
  - base64-decode image + mask PNGs; grayscale -> RGB; image kept BGR through
    the augs (ref :218)
  - label shift: 0 -> 255 -> -1 -> unknown = num_seg (ref :230-234)
  - train augs: ResizeRatioRange(0.5, 2.0, min_size=s) + RandomCrop(s, 0.75) +
    RandomFlip(0.5) + PhotoMetricDistortion (ref :157-163); min_size guarantees
    the crop is always exactly (s, s) -> static shapes for free
  - eval: keep-ratio resize into (4s, s) (ref :169-173), ragged; bucketed by
    the eval collator
  - artificial image `rand_k-l-r`: (sh, sw) ~ U[l, r)^2 category grid,
    nearest-resized down to the (s/16)^2 token grid and up to the (s, s) pixel
    target (ref :303-321).  We emit raw class-id grids; the EmbeddingBag
    ids/offsets encoding is replaced by the class-mean-embedding gather inside
    the model (see models/encoder.py), which is the same mean-bag math.

Targets are class ids in [0, num_seg] (num_seg = unknown) rather than
`<seg_k>` dictionary ids; the criterion never needs the dictionary offset,
which removes the reference's seg2code round-trip (ref :189-190, :248-251).
"""

import base64
import logging
from dataclasses import dataclass, field
from io import BytesIO
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
from PIL import Image, ImageFile

from ifseg_tpu.config import TaskConfig
from ifseg_tpu.data.file_dataset import FileDataset
from ifseg_tpu.data.transforms import (
    KeepRatioResize,
    PhotoMetricDistortion,
    RandomCrop,
    RandomFlip,
    ResizeRatioRange,
)
from ifseg_tpu.ops.resize import resize_nearest_np
from ifseg_tpu.tokenization.dictionary import Dictionary
from ifseg_tpu.tokenization.gpt2_bpe import GPT2BPE

ImageFile.LOAD_TRUNCATED_IMAGES = True
Image.MAX_IMAGE_PIXELS = None

logger = logging.getLogger(__name__)

IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)


def encode_text(bpe: GPT2BPE, dictionary: Dictionary, text: str) -> np.ndarray:
    """BPE-encode per word with a leading space, then map to dict ids
    (ref segmentation_dataset.py:193-208, no bos/eos)."""
    line = " ".join(
        bpe.encode(" {}".format(word.strip())) for word in text.strip().split()
    )
    return dictionary.encode_line(line, append_eos=False)


def build_class_token_table(bpe, dictionary, categories: List[str]):
    """Padded (C, Tmax) token-id matrix + (C,) lengths for the category names
    (+ trailing 'unknown'), the EmbeddingBag inputs (ref :183-187)."""
    toks = [encode_text(bpe, dictionary, f" {c}") for c in categories]
    tmax = max(len(t) for t in toks)
    table = np.zeros((len(toks), tmax), np.int32)
    lengths = np.zeros((len(toks),), np.int32)
    for i, t in enumerate(toks):
        table[i, : len(t)] = t
        lengths[i] = len(t)
    return table, lengths


@dataclass
class SegBatch:
    """Fixed-shape training batch (numpy, NHWC)."""

    # patch_images/target/downsampled_target are None on the image-free fast
    # path (decode_real_images=False): the step never reads them
    patch_images: Optional[np.ndarray]  # (B, s, s, 3) uint8 RGB (normalized
    # on-device in the jitted step; fp32 pre-normalized accepted for tests)
    src_tokens: np.ndarray  # (B, L) int32
    bos_tokens: np.ndarray  # (B, 1) int32
    target: Optional[np.ndarray]  # (B, s, s) uint8 class ids (augmented gt;
    # int32 when num_seg+1 > 256 — the step computes in int32 either way)
    downsampled_target: Optional[np.ndarray]  # (B, (s/16)^2) int32
    aux_grid_ids: Optional[np.ndarray]  # (B, (s/16)^2) int32
    aux_target: Optional[np.ndarray]  # (B, s, s) uint8 (int32 fallback)
    ids: np.ndarray  # (B,)
    nsentences: int = 0
    ntokens: int = 0


def eval_mean_std(cfg) -> Tuple[Tuple[float, ...], Tuple[float, ...]]:
    """Normalization constants shared by the host train pipeline and the
    evaluator's ON-DEVICE normalize (eval ships uint8 over the wire — 4x
    fewer host->device bytes than normalized fp32)."""
    if cfg.imagenet_default_mean_and_std:
        return IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD
    return (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)


@dataclass
class EvalSample:
    """One ragged eval row (bucketing happens in eval/).

    ``patch_image`` is raw uint8 RGB (keep-ratio resized); normalization
    happens on-device inside the evaluator's compiled fn so the upload is
    1 byte/channel instead of 4 (fp32 arrays are also accepted and pass
    through un-normalized, for tests that fabricate already-normalized
    rows)."""

    patch_image: np.ndarray  # (h, w, 3) uint8 RGB, resized keep-ratio
    src_tokens: np.ndarray  # (L,)
    bos_token: np.ndarray  # (1,)
    ori_semantic_seg: np.ndarray  # (H, W) int32 class ids, original res
    ori_shape: Any
    id: Any = None


class SegmentationDataset:
    def __init__(
        self,
        split: str,
        dataset: FileDataset,
        bpe: GPT2BPE,
        dictionary: Dictionary,
        cfg: TaskConfig,
    ):
        self.split = split
        self.dataset = dataset
        self.bpe = bpe
        self.dict = dictionary
        self.cfg = cfg
        s = cfg.patch_image_size
        self.patch_image_size = s
        self.num_seg = cfg.num_seg_tokens

        self.mean, self.std = eval_mean_std(cfg)

        if split == "train":
            self.resize = ResizeRatioRange((s * 4, s), (0.5, 2.0), min_size=s)
            self.crop = RandomCrop((s, s), cat_max_ratio=0.75)
            self.flip = RandomFlip(0.5)
            self.distort = PhotoMetricDistortion()
        else:
            self.eval_resize = KeepRatioResize((s * 4, s))

        categories = cfg.categories + ["unknown"]
        assert len(categories) == self.num_seg + 1, (
            f"category_list has {len(categories) - 1} entries; expected {self.num_seg}"
        )
        self.class_tokens, self.class_lengths = build_class_token_table(
            bpe, dictionary, categories
        )

        # constant source sequence: [bos, prompt, class names..., eos]
        # (ref :272-281); identical for every sample -> a static batch input
        parts = [np.asarray([dictionary.bos()], np.int64)]
        if cfg.prompt_prefix:
            parts.append(encode_text(bpe, dictionary, f" {cfg.prompt_prefix.lstrip()}"))
        for i, c in enumerate(categories):
            parts.append(self.class_tokens[i, : self.class_lengths[i]].astype(np.int64))
        parts.append(np.asarray([dictionary.eos()], np.int64))
        self.src_item = np.concatenate(parts).astype(np.int32)

        self.artificial_image_type = cfg.artificial_image_type
        if self.artificial_image_type.startswith("rand_k"):
            pieces = self.artificial_image_type.split("-")
            if len(pieces) == 3:
                self.rand_l, self.rand_r = int(pieces[1]), int(pieces[2])
            else:
                self.rand_l, self.rand_r = 1, 33

        # image-free fast path (see TaskConfig.decode_real_images): only for
        # rand_k grids (they carry their own pixel target); norand_k derives
        # its target from the real mask, so it still decodes
        self.skip_real_images = (
            split == "train"
            and not cfg.decode_real_images
            and self.artificial_image_type.startswith("rand_k")
        )

    def __len__(self):
        return len(self.dataset)

    # ----------------------------------------------------------------- row ops

    def _decode_row(self, index: int):
        image_b64, seg_b64, uniq_id = self.dataset[index]
        image = Image.open(BytesIO(base64.urlsafe_b64decode(image_b64)))
        # NB: no .convert("RGB") — reference parity (segmentation_dataset.py
        # :213-217 decodes palette-mode PNGs as raw indices and channel-
        # replicates 2-D arrays; the conversion notebooks emit RGB PNGs)
        image_arr = np.asarray(image)
        if image_arr.ndim < 3:
            image_arr = np.repeat(image_arr[:, :, None], 3, axis=2)
        elif image_arr.shape[2] == 4:
            image_arr = image_arr[:, :, :3]
        image_arr = image_arr[:, :, ::-1].copy()  # to BGR (ref :218)
        seg = np.asarray(
            Image.open(BytesIO(base64.urlsafe_b64decode(seg_b64)))
        ).copy()
        # label shift (ref :230-234)
        seg = seg.astype(np.int32)
        seg[seg == 0] = 255
        seg = seg - 1
        seg[seg == 254] = self.num_seg
        return image_arr, seg, uniq_id

    def _artificial_grid(self, rng: np.random.Generator):
        """Random category grid -> (token-grid ids, pixel target) (ref :303-321)."""
        hw16 = self.patch_image_size // 16
        s = self.patch_image_size
        if self.artificial_image_type == "norand_k":
            ids = rng.integers(0, self.num_seg, size=hw16 * hw16).astype(np.int32)
            return ids, None
        sh, sw = rng.integers(self.rand_l, self.rand_r, size=2)
        rand = rng.integers(0, self.num_seg, size=(sh, sw)).astype(np.int32)
        grid_ids = resize_nearest_np(rand, (hw16, hw16)).reshape(-1)
        target = resize_nearest_np(rand, (s, s))
        return grid_ids, target

    def get_train_example(self, index: int, rng: np.random.Generator) -> Dict[str, Any]:
        if self.skip_real_images:
            # image-free fast path: the TSV row is read (iterator position /
            # resume semantics unchanged) but the base64 payloads are never
            # decoded and the aug chain never runs
            uniq_id = self.dataset[index][2]
            grid_ids, aux_target = self._artificial_grid(rng)
            return {
                "id": uniq_id,
                "aux_grid_ids": grid_ids,
                "aux_target": aux_target,
            }
        img_bgr, seg, uniq_id = self._decode_row(index)
        img_bgr, seg = self.resize(img_bgr, seg, rng)
        img_bgr, seg = self.crop(img_bgr, seg, rng)
        img_bgr, seg = self.flip(img_bgr, seg, rng)
        img_bgr = self.distort(img_bgr, rng)
        # raw uint8 RGB (the aug chain's native dtype): normalization runs
        # inside the jitted step (train/trainer.py _images) — 4x fewer
        # host->device bytes and no host fp32 pass
        img = np.ascontiguousarray(img_bgr[:, :, ::-1])

        hw16 = self.patch_image_size // 16
        down = resize_nearest_np(seg, (hw16, hw16)).reshape(-1)
        ex = {
            "id": uniq_id,
            "patch_image": img,
            "target": seg.astype(np.int32),
            "downsampled_target": down.astype(np.int32),
        }
        if self.artificial_image_type != "none":
            grid_ids, aux_target = self._artificial_grid(rng)
            ex["aux_grid_ids"] = grid_ids
            ex["aux_target"] = aux_target
        return ex

    def get_eval_sample(self, index: int) -> EvalSample:
        img_bgr, seg, uniq_id = self._decode_row(index)
        ori_shape = img_bgr.shape
        img_resized, _ = self.eval_resize(img_bgr)
        # raw uint8 RGB: normalization runs on-device (eval/evaluator.py),
        # quartering the host->device bytes and skipping the host fp32 pass
        return EvalSample(
            patch_image=np.ascontiguousarray(img_resized[:, :, ::-1]),
            src_tokens=self.src_item,
            bos_token=np.asarray([self.dict.bos()], np.int32),
            ori_semantic_seg=seg,
            ori_shape=ori_shape,
            id=uniq_id,
        )

    # ----------------------------------------------------------------- batches

    def collate_train(self, examples: List[Dict[str, Any]]) -> SegBatch:
        b = len(examples)
        stack = lambda k: np.stack([e[k] for e in examples])
        has_aux = "aux_grid_ids" in examples[0]
        has_real = "patch_image" in examples[0]  # False on the fast path
        # wire dtypes: targets ride uint8 when the class ids fit (the step
        # computes in int32; trainer._labels) — with the uint8 images this
        # cuts the per-step upload ~4x
        tgt = np.uint8 if self.num_seg + 1 <= 256 else np.int32
        return SegBatch(
            patch_images=stack("patch_image") if has_real else None,
            src_tokens=np.tile(self.src_item[None], (b, 1)),
            bos_tokens=np.full((b, 1), self.dict.bos(), np.int32),
            target=stack("target").astype(tgt) if has_real else None,
            downsampled_target=stack("downsampled_target") if has_real else None,
            aux_grid_ids=stack("aux_grid_ids") if has_aux else None,
            aux_target=(
                stack("aux_target").astype(tgt)
                if has_aux and examples[0].get("aux_target") is not None
                else None
            ),
            ids=np.asarray([e["id"] for e in examples]),
            nsentences=b,
            ntokens=int(
                sum(
                    (e["target"] if has_real else e["aux_target"]).size + 1
                    for e in examples
                )
            ),
        )
