"""Dense CRF native backend: correctness against a brute-force reference.

The permutohedral lattice approximates Gaussian filtering; on tiny images the
mean-field update is compared against an exact O(N^2) numpy implementation of
the same algorithm (symmetric normalization, Potts compatibility) — the
approximation should agree closely, and the refinement behavior (label
smoothing inside color-homogeneous regions) must hold.
"""

import numpy as np
import pytest

from ifseg_tpu.ops.crf import dense_crf, rgb_dense_crf


def brute_force_crf(image_bgr, probs, n_iter, sxy_g, w_g, sxy_b, srgb, w_b):
    h, w, c = probs.shape
    n = h * w
    yy, xx = np.mgrid[0:h, 0:w]
    pos = np.stack([xx.ravel(), yy.ravel()], 1).astype(np.float64)
    col = image_bgr.reshape(n, 3).astype(np.float64)

    def kernel(feats):
        d2 = ((feats[:, None, :] - feats[None, :, :]) ** 2).sum(-1)
        return np.exp(-0.5 * d2)

    k_g = kernel(pos / sxy_g)
    k_b = kernel(np.concatenate([pos / sxy_b, col / srgb], 1))

    def sym_filter(k, q):
        norm = 1.0 / np.sqrt(k.sum(1) + 1e-20)
        return norm[:, None] * (k @ (q * norm[:, None]))

    u = -np.log(np.clip(probs.reshape(n, c), 1e-5, 1.0))
    q = np.exp(-u)
    q /= q.sum(1, keepdims=True)
    for _ in range(n_iter):
        logits = -u + w_g * sym_filter(k_g, q) + w_b * sym_filter(k_b, q)
        logits -= logits.max(1, keepdims=True)
        q = np.exp(logits)
        q /= q.sum(1, keepdims=True)
    return q.reshape(h, w, c)


def test_matches_brute_force():
    rng = np.random.default_rng(0)
    h, w, c = 10, 8, 3
    img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
    probs = rng.dirichlet(np.ones(c), size=(h, w)).astype(np.float32)

    got = dense_crf(img, probs, n_iter=3, sxy_gauss=1.0, compat_gauss=3.0,
                    sxy_bilateral=10.0, srgb_bilateral=13.0, compat_bilateral=4.0)
    want = brute_force_crf(img, probs, 3, 1.0, 3.0, 10.0, 13.0, 4.0)
    # permutohedral is an approximation of the exact Gaussian; argmax must
    # agree almost everywhere and probabilities closely
    agree = (got.argmax(-1) == want.argmax(-1)).mean()
    assert agree > 0.9, agree
    assert np.abs(got - want).mean() < 0.05


def test_smooths_speckle_noise():
    """A speckled label map inside a flat-color image collapses to the
    majority label after CRF — the qualitative behavior the reference uses it
    for (visualize_segmentation_web.ipynb)."""
    rng = np.random.default_rng(1)
    h, w, c = 32, 32, 2
    img = np.full((h, w, 3), 128, np.uint8)  # uniform color
    probs = np.full((h, w, c), 0.0, np.float32)
    probs[..., 0] = 0.7  # dominant class
    probs[..., 1] = 0.3
    # speckle: 15% of pixels flipped to prefer class 1
    mask = rng.uniform(size=(h, w)) < 0.15
    probs[mask] = [0.3, 0.7]

    out = dense_crf(img, probs, n_iter=10)
    assert (out.argmax(-1) == 0).mean() > 0.99


def test_reference_signature_channel_first():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, size=(6, 7, 3), dtype=np.uint8)
    probs_cf = rng.dirichlet(np.ones(4), size=(6, 7)).astype(np.float32).transpose(2, 0, 1)
    out = rgb_dense_crf(img, probs_cf, max_iter=2)
    assert out.shape == probs_cf.shape
    np.testing.assert_allclose(out.sum(0), np.ones((6, 7)), atol=1e-5)
