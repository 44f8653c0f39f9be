"""On-device (JAX) dense CRF vs the C++ lattice and the exact brute force.

Three-way check: the JAX permutohedral lattice filter must match the C++
lattice (csrc/permutohedral.h — same algorithm, so near-exact agreement),
and the full mean-field must track the exact O(N^2) reference like
tests/test_crf.py does for the C++ backend."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ifseg_tpu.ops.crf_jax import (
    build_lattice,
    dense_crf_jax,
    lattice_filter,
    spatial_filter,
)

pytestmark = pytest.mark.slow


# numpy port of permutohedral.h (exact reference)
def np_lattice(feats):
    n, d = feats.shape
    inv_std = np.sqrt(2.0/3.0) * (d+1)
    scale = np.array([1.0/np.sqrt((i+2)*(i+1))*inv_std for i in range(d)], np.float32)
    hash_ = {}
    keys_list = []
    offsets = np.zeros((n, d+1), np.int64)
    barys = np.zeros((n, d+1), np.float32)
    for k in range(n):
        f = feats[k]
        elevated = np.zeros(d+1, np.float32)
        sm = 0.0
        for j in range(d, 0, -1):
            cf = f[j-1]*scale[j-1]
            elevated[j] = sm - j*cf
            sm += cf
        elevated[0] = sm
        down, up = 1.0/(d+1), float(d+1)
        rem0 = np.zeros(d+1, np.float32)
        s = 0
        for i in range(d+1):
            rd = int(round(down*elevated[i]))
            rem0[i] = rd*up
            s += rd
        rank = np.zeros(d+1, np.int32)
        for i in range(d):
            for j in range(i+1, d+1):
                if elevated[i]-rem0[i] < elevated[j]-rem0[j]:
                    rank[i] += 1
                else:
                    rank[j] += 1
        for i in range(d+1):
            rank[i] += s
            if rank[i] < 0:
                rank[i] += d+1; rem0[i] += d+1
            elif rank[i] > d:
                rank[i] -= d+1; rem0[i] -= d+1
        bary = np.zeros(d+2, np.float32)
        for i in range(d+1):
            v = (elevated[i]-rem0[i])*down
            bary[d-rank[i]] += v
            bary[d-rank[i]+1] -= v
        bary[0] += 1.0 + bary[d+1]
        for r in range(d+1):
            key = tuple(
                int(rem0[i]) + r - ((d+1) if rank[i] > d-r else 0)
                for i in range(d)
            )
            if key not in hash_:
                hash_[key] = len(keys_list); keys_list.append(key)
            offsets[k, r] = hash_[key]
            barys[k, r] = bary[r]
    return offsets, barys, keys_list, hash_

def np_filter(offsets, barys, keys_list, hash_, x, d):
    nv = len(keys_list)
    c = x.shape[1]
    vals = np.zeros((nv+1, c), np.float32)
    n = x.shape[0]
    for k in range(n):
        for r in range(d+1):
            vals[offsets[k, r]] += barys[k, r]*x[k]
    for j in range(d+1):
        new = np.zeros_like(vals)
        for i, key in enumerate(keys_list):
            n1 = list(key); n2 = list(key)
            for mm in range(d):
                n1[mm] -= 1; n2[mm] += 1
            if j < d:
                n1[j] = key[j]+d; n2[j] = key[j]-d
            i1 = hash_.get(tuple(n1), nv)
            i2 = hash_.get(tuple(n2), nv)
            new[i] = vals[i] + 0.5*(vals[i1]+vals[i2])
        vals = new
    alpha = 1.0/(1.0+2.0**(-d))
    out = np.zeros_like(x)
    for k in range(n):
        for r in range(d+1):
            out[k] += barys[k, r]*vals[offsets[k, r]]*alpha
    return out


def test_lattice_matches_numpy_oracle():
    """The jnp lattice bit-matches a direct numpy port of permutohedral.h
    (same elevation, ranking, keying, blur-neighbor and slice math)."""
    rng = np.random.default_rng(0)
    n, d, c = 60, 5, 3
    feats = rng.normal(0, 1.5, size=(n, d)).astype(np.float32)
    x = rng.normal(size=(n, c)).astype(np.float32)

    off_np, bary_np, keys_list, hash_ = np_lattice(feats)
    want = np_filter(off_np, bary_np, keys_list, hash_, x, d)

    off, bary, blur, nv = jax.jit(build_lattice)(jnp.asarray(feats))
    got = np.asarray(jax.jit(lattice_filter)(off, bary, blur, jnp.asarray(x)))
    assert int(nv) == len(keys_list)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_lattice_matches_cpp_lattice():
    """The jnp lattice IS the C++ lattice: same splat/blur/slice plan, so the
    filtered outputs agree to float tolerance."""
    cpp = pytest.importorskip("ifseg_tpu.ops.crf")
    rng = np.random.default_rng(1)
    h, w, c = 12, 10, 4
    image = rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
    probs_np = rng.dirichlet(np.ones(c), size=h * w).astype(np.float32)
    probs = probs_np.reshape(h, w, c)

    # one mean-field iteration comparison through the full pipelines would
    # mix in the exact-vs-lattice spatial kernel difference; compare the
    # BILATERAL lattice filter alone by running both with compat_gauss=0
    got = np.asarray(
        dense_crf_jax(
            jnp.asarray(image, jnp.float32), jnp.asarray(probs), h, w,
            n_iter=2, compat_gauss=0.0, sxy_bilateral=8.0, srgb_bilateral=4.0,
            compat_bilateral=4.0,
        )
    )
    want = cpp.dense_crf(
        image, probs, n_iter=2, sxy_gauss=1.0, compat_gauss=0.0,
        sxy_bilateral=8.0, srgb_bilateral=4.0, compat_bilateral=4.0,
    )
    np.testing.assert_allclose(got, want, atol=2e-3)
    # same argmax decisions
    assert (got.argmax(-1) == want.argmax(-1)).mean() > 0.99


def test_dense_crf_jax_full_pipeline():
    """Full defaults (reference crf.py): refinement sharpens probabilities in
    color-homogeneous regions and preserves normalization."""
    rng = np.random.default_rng(2)
    h, w, c = 16, 16, 3
    image = np.zeros((h, w, 3), np.float32)
    image[:, : w // 2] = 30.0
    image[:, w // 2 :] = 220.0
    # noisy probabilities, mostly class 0 left, class 1 right
    probs = np.full((h, w, c), 0.2, np.float32)
    probs[:, : w // 2, 0] = 0.6
    probs[:, w // 2 :, 1] = 0.6
    probs += rng.uniform(0, 0.05, size=probs.shape).astype(np.float32)
    probs /= probs.sum(-1, keepdims=True)

    out = np.asarray(
        dense_crf_jax(jnp.asarray(image), jnp.asarray(probs), h, w, n_iter=5)
    )
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-4)
    assert (out[:, : w // 2].argmax(-1) == 0).mean() > 0.95
    assert (out[:, w // 2 :].argmax(-1) == 1).mean() > 0.95
    # sharper than the input in the homogeneous interiors
    assert out[:, : w // 4, 0].mean() > probs[:, : w // 4, 0].mean()


def test_spatial_filter_exact():
    rng = np.random.default_rng(3)
    h, w, c = 9, 7, 2
    x = rng.normal(size=(h * w, c)).astype(np.float32)
    got = np.asarray(spatial_filter(jnp.asarray(x), h, w, sigma=1.0))
    yy, xx = np.mgrid[0:h, 0:w]
    pos = np.stack([xx.ravel(), yy.ravel()], 1).astype(np.float64)
    # separable truncated kernel == full 2-D truncated kernel
    r = 4
    d2 = ((pos[:, None] - pos[None]) ** 2)
    kx = np.where(np.abs(pos[:, None, 0] - pos[None, :, 0]) <= r,
                  np.exp(-0.5 * d2[..., 0]), 0.0)
    ky = np.where(np.abs(pos[:, None, 1] - pos[None, :, 1]) <= r,
                  np.exp(-0.5 * d2[..., 1]), 0.0)
    want = (kx * ky) @ x
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
