"""Host-side augmentation semantics (mmseg parity behaviors)."""

import numpy as np

from ifseg_tpu.data.transforms import (
    KeepRatioResize,
    PhotoMetricDistortion,
    RandomCrop,
    RandomFlip,
    ResizeRatioRange,
    imrescale_size,
    normalize_image,
)


def test_imrescale_size_fits_bounds():
    # 640x480 into (2048, 512): sf = min(2048/640, 512/480)
    h, w = imrescale_size(480, 640, (2048, 512))
    assert (h, w) == (int(480 * (512 / 480) + 0.5), int(640 * (512 / 480) + 0.5))
    assert max(h, w) <= 2048 and min(h, w) <= 512


def test_resize_ratio_range_min_size_guarantees_crop():
    """min_size=s ensures the short side is >= s for any sampled ratio, so
    the subsequent s x s crop always succeeds (mmseg Resize min_size)."""
    t = ResizeRatioRange((512 * 4, 512), (0.5, 2.0), min_size=512)
    rng = np.random.default_rng(0)
    for _ in range(10):
        hw = rng.integers(300, 1200, 2)
        img = np.zeros((hw[0], hw[1], 3), np.uint8)
        seg = np.zeros((hw[0], hw[1]), np.uint8)
        oi, os_ = t(img, seg, rng)
        assert min(oi.shape[:2]) >= 511  # rounding slack
        assert oi.shape[:2] == os_.shape[:2]
        # aspect approximately preserved
        a0 = hw[0] / hw[1]
        a1 = oi.shape[0] / oi.shape[1]
        assert abs(a0 - a1) / a0 < 0.02


def test_random_crop_size_and_cat_max_ratio():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, size=(600, 700, 3), dtype=np.uint8)
    # seg: left half class 0, right half class 1 -> a 512 crop can satisfy
    # cat_max_ratio 0.75 by spanning the boundary
    seg = np.zeros((600, 700), np.uint8)
    seg[:, 350:] = 1
    crop = RandomCrop((512, 512), cat_max_ratio=0.75)
    for _ in range(5):
        ci, cs = crop(img, seg, rng)
        assert ci.shape == (512, 512, 3) and cs.shape == (512, 512)
        _, counts = np.unique(cs, return_counts=True)
        assert counts.max() / counts.sum() < 0.75 + 1e-9


def test_random_flip_involution_and_pairing():
    rng_flip = np.random.default_rng(6)  # seed that flips on first call
    flip = RandomFlip(prob=1.0)
    img = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    seg = np.arange(8, dtype=np.uint8).reshape(2, 4)
    fi, fs = flip(img, seg, rng_flip)
    np.testing.assert_array_equal(fi, img[:, ::-1])
    np.testing.assert_array_equal(fs, seg[:, ::-1])


def test_photometric_stays_uint8_in_range():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
    pmd = PhotoMetricDistortion()
    for _ in range(10):
        out = pmd(img, rng)
        assert out.dtype == np.uint8
        assert out.shape == img.shape


def test_normalize_image_math():
    img = np.full((2, 2, 3), 255, np.uint8)
    out = normalize_image(img, (0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    np.testing.assert_allclose(out, 1.0)
    out0 = normalize_image(np.zeros((2, 2, 3), np.uint8), (0.5,) * 3, (0.5,) * 3)
    np.testing.assert_allclose(out0, -1.0)


def test_keep_ratio_resize_eval():
    t = KeepRatioResize((2048, 512))
    img = np.zeros((480, 640, 3), np.uint8)
    seg = np.zeros((480, 640), np.uint8)
    oi, os_ = t(img, seg)
    assert min(oi.shape[:2]) == 512
    assert os_.shape[:2] == oi.shape[:2]
