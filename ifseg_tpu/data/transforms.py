"""Host-side augmentations with mmseg v0.28 semantics (numpy + cv2).

The reference training pipeline (data/mm_data/segmentation_dataset.py:157-173)
is mmseg's  Resize(img_scale=(4s, s), ratio_range=(0.5, 2.0), min_size=s) ->
RandomCrop(crop_size=(s, s), cat_max_ratio=0.75) -> RandomFlip(0.5) ->
PhotoMetricDistortion(), operating on BGR uint8 images; eval is
MultiScaleFlipAug(keep_ratio resize to (4s, s), no flip).  mmcv's image ops
are cv2-backed, so using cv2 here gives bitwise parity for the deterministic
eval path and behavioral parity for the stochastic train path.

All functions take/return plain numpy; randomness comes from an explicit
``numpy.random.Generator`` for reproducible, worker-independent streams
(the reference uses the global numpy/torch seeds: data/data_utils.py:132).
"""

from typing import Optional, Tuple

import cv2
import numpy as np


def imrescale_size(h: int, w: int, scale: Tuple[int, int]) -> Tuple[int, int]:
    """mmcv.imrescale target size: fit (h, w) inside max/min of ``scale``."""
    max_long, max_short = max(scale), min(scale)
    sf = min(max_long / max(h, w), max_short / min(h, w))
    return int(h * sf + 0.5), int(w * sf + 0.5)


def resize_image(img: np.ndarray, out_hw: Tuple[int, int], nearest=False) -> np.ndarray:
    interp = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
    return cv2.resize(img, (out_hw[1], out_hw[0]), interpolation=interp)


class ResizeRatioRange:
    """mmseg Resize with ratio_range + min_size, keep_ratio=True.

    Samples ratio ~ U(lo, hi); scale = (img_scale[0]*r, img_scale[1]*r); with
    min_size the scale is replaced by an aspect-exact (new_h, new_w) whose
    short side is max(min(scale), min_size) (mmseg Resize._resize_img).
    """

    def __init__(self, img_scale: Tuple[int, int], ratio_range=(0.5, 2.0),
                 min_size: Optional[int] = None):
        self.img_scale = img_scale
        self.ratio_range = ratio_range
        self.min_size = min_size

    def __call__(self, img, seg, rng: np.random.Generator):
        lo, hi = self.ratio_range
        ratio = rng.uniform(lo, hi)
        scale = (int(self.img_scale[0] * ratio), int(self.img_scale[1] * ratio))
        h, w = img.shape[:2]
        if self.min_size is not None:
            new_short = max(min(scale), self.min_size)
            if h > w:
                scale = (new_short * h / w, new_short)
            else:
                scale = (new_short, new_short * w / h)
        out_hw = imrescale_size(h, w, scale)
        img = resize_image(img, out_hw)
        seg = resize_image(seg, out_hw, nearest=True)
        return img, seg


class KeepRatioResize:
    """Eval resize: deterministic keep-ratio fit into img_scale
    (MultiScaleFlipAug + Resize(keep_ratio=True))."""

    def __init__(self, img_scale: Tuple[int, int]):
        self.img_scale = img_scale

    def __call__(self, img, seg=None):
        h, w = img.shape[:2]
        out_hw = imrescale_size(h, w, self.img_scale)
        img = resize_image(img, out_hw)
        if seg is not None:
            seg = resize_image(seg, out_hw, nearest=True)
        return img, seg


class RandomCrop:
    """mmseg RandomCrop with cat_max_ratio retry (10 attempts, ignore 255)."""

    def __init__(self, crop_size: Tuple[int, int], cat_max_ratio=0.75,
                 ignore_index=255):
        self.crop_size = crop_size
        self.cat_max_ratio = cat_max_ratio
        self.ignore_index = ignore_index

    def _bbox(self, shape, rng):
        margin_h = max(shape[0] - self.crop_size[0], 0)
        margin_w = max(shape[1] - self.crop_size[1], 0)
        oh = rng.integers(0, margin_h + 1)
        ow = rng.integers(0, margin_w + 1)
        return oh, oh + self.crop_size[0], ow, ow + self.crop_size[1]

    def __call__(self, img, seg, rng: np.random.Generator):
        bbox = self._bbox(img.shape, rng)
        if self.cat_max_ratio < 1.0:
            for _ in range(10):
                y1, y2, x1, x2 = bbox
                labels, cnt = np.unique(seg[y1:y2, x1:x2], return_counts=True)
                cnt = cnt[labels != self.ignore_index]
                if len(cnt) > 1 and np.max(cnt) / np.sum(cnt) < self.cat_max_ratio:
                    break
                bbox = self._bbox(img.shape, rng)
        y1, y2, x1, x2 = bbox
        return img[y1:y2, x1:x2], seg[y1:y2, x1:x2]


class RandomFlip:
    def __init__(self, prob=0.5):
        self.prob = prob

    def __call__(self, img, seg, rng: np.random.Generator):
        if rng.uniform() < self.prob:
            img = np.ascontiguousarray(img[:, ::-1])
            seg = np.ascontiguousarray(seg[:, ::-1])
        return img, seg


class PhotoMetricDistortion:
    """mmseg PhotoMetricDistortion on BGR uint8: random brightness, random
    contrast (before or after), saturation and hue jitter in HSV."""

    def __init__(self, brightness_delta=32, contrast_range=(0.5, 1.5),
                 saturation_range=(0.5, 1.5), hue_delta=18):
        self.brightness_delta = brightness_delta
        self.contrast_lower, self.contrast_upper = contrast_range
        self.saturation_lower, self.saturation_upper = saturation_range
        self.hue_delta = hue_delta

    @staticmethod
    def _convert(img, alpha=1.0, beta=0.0):
        img = img.astype(np.float32) * alpha + beta
        return np.clip(img, 0, 255).astype(np.uint8)

    def __call__(self, img, rng: np.random.Generator):
        if rng.integers(2):
            img = self._convert(
                img, beta=rng.uniform(-self.brightness_delta, self.brightness_delta)
            )
        mode = rng.integers(2)
        if mode == 1 and rng.integers(2):
            img = self._convert(
                img, alpha=rng.uniform(self.contrast_lower, self.contrast_upper)
            )
        # saturation
        if rng.integers(2):
            hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
            hsv[:, :, 1] = self._convert(
                hsv[:, :, 1],
                alpha=rng.uniform(self.saturation_lower, self.saturation_upper),
            )
            img = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)
        # hue
        if rng.integers(2):
            hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
            hsv[:, :, 0] = (
                hsv[:, :, 0].astype(int)
                + rng.integers(-self.hue_delta, self.hue_delta + 1)
            ) % 180
            img = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)
        if mode == 0 and rng.integers(2):
            img = self._convert(
                img, alpha=rng.uniform(self.contrast_lower, self.contrast_upper)
            )
        return img


def normalize_image(img_rgb_uint8: np.ndarray, mean, std) -> np.ndarray:
    """ToTensor + Normalize (segmentation_dataset.py:155-156), NHWC fp32."""
    x = img_rgb_uint8.astype(np.float32) / 255.0
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    return (x - mean) / std
