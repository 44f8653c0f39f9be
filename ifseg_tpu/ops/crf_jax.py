"""Dense CRF mean-field inference on device (batched JAX).

The reference post-processes with the external pydensecrf C++ package
(reference crf.py:11-37); csrc/densecrf.cpp is this repo's host-side C++
equivalent.  This module is the TPU-native version (SURVEY §2.3 plan:
"reimplement as a batched JAX op"):

  - spatial (Gaussian) pairwise message: exact separable depthwise
    convolution (sxy=1 -> a tiny kernel; exact, not lattice-approximated)
  - bilateral (position+color) message: a permutohedral lattice
    (Adams/Baek/Davis 2010) built entirely in jnp with static shapes —
    simplex elevation, rank/barycentric computation, key dedup by sort,
    neighbor lookup by binary search on packed keys, splat -> (d+1)
    [1,2,1]/2 blur passes -> slice
  - mean field: Q <- softmax(-U + w_g*filt_g(Q) + w_b*filt_b(Q)), symmetric
    normalization, Potts compatibility — the same update as densecrf.cpp

Everything is jittable; the lattice plan depends on pixel features so it is
(re)built inside the jit per image, with all shapes static in N = H*W.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ------------------------------------------------------------------ lattice


def _elevate(feats, d):
    """(N, d) -> (N, d+1) on the sum-zero hyperplane (permutohedral.h:46-68)."""
    inv_std = np.sqrt(2.0 / 3.0) * (d + 1)
    scale = np.array(
        [1.0 / np.sqrt((i + 2) * (i + 1)) * inv_std for i in range(d)], np.float32
    )
    cf = feats * scale[None, :]  # (N, d)
    # elevated[j] = sum(cf[j:]) - j * cf[j-1]  (j>=1);  elevated[0] = sum(cf)
    suffix = jnp.cumsum(cf[:, ::-1], axis=1)[:, ::-1]  # suffix sums
    suffix = jnp.concatenate([suffix, jnp.zeros_like(cf[:, :1])], axis=1)
    j = jnp.arange(1, d + 1, dtype=jnp.float32)
    elev_tail = suffix[:, 1:] - j[None, :] * cf
    return jnp.concatenate([suffix[:, :1], elev_tail], axis=1)


def build_lattice(feats):
    """Static-shape lattice plan for (N, d) features.

    Returns (offsets (N, d+1) int32 into M+1 slots, barycentric (N, d+1),
    blur neighbor tables (d+1, M, 2) int32 where M = N*(d+1) slots and index
    M means "missing").  Mirrors permutohedral.h init()."""
    n, d = feats.shape
    m = n * (d + 1)
    elevated = _elevate(feats, d)  # (N, d+1)

    down = 1.0 / (d + 1)
    up = float(d + 1)
    rd = jnp.round(down * elevated)
    rem0 = rd * up  # (N, d+1)
    ssum = jnp.sum(rd, axis=1).astype(jnp.int32)  # (N,)

    # pairwise rank (permutohedral.h:81-88): for i<j, res_i < res_j -> rank[i]++
    # so rank[i] = #{j>i: res_i < res_j} + #{j<i: res_j >= res_i}
    res = elevated - rem0
    gt = (res[:, :, None] < res[:, None, :]).astype(jnp.int32)  # gt[i,j]: res_i < res_j
    iu = np.triu(np.ones((d + 1, d + 1), np.int32), 1)  # iu[a,b]=1 iff a<b
    rank = jnp.sum(gt * iu[None], axis=2) + jnp.sum((1 - gt) * iu[None], axis=1)

    rank = rank + ssum[:, None]
    low = rank < 0
    high = rank > d
    rank = jnp.where(low, rank + (d + 1), jnp.where(high, rank - (d + 1), rank))
    rem0 = jnp.where(low, rem0 + (d + 1), jnp.where(high, rem0 - (d + 1), rem0))

    # barycentric (permutohedral.h:104-111)
    v = (elevated - rem0) * down  # (N, d+1)
    idx0 = d - rank  # in [0, d]
    bary = jnp.zeros((n, d + 2), jnp.float32)
    bary = bary.at[jnp.arange(n)[:, None], idx0].add(v)
    bary = bary.at[jnp.arange(n)[:, None], idx0 + 1].add(-v)
    bary = bary.at[:, 0].add(1.0 + bary[:, d + 1])
    bary = bary[:, : d + 1]  # (N, d+1) weight per remainder

    # keys per simplex corner (permutohedral.h:114-118): (N, d+1, d)
    r = jnp.arange(d + 1)[None, :, None].astype(jnp.int32)  # remainder
    base = rem0[:, None, :d].astype(jnp.int32) + r
    keys = base - jnp.where(
        rank[:, None, :d] > d - r, jnp.int32(d + 1), jnp.int32(0)
    )

    packed = _pack(keys.reshape(m, d), d)  # (M, W) int32 words

    order = jnp.lexsort(tuple(packed[:, i] for i in range(packed.shape[1]))[::-1])
    sp = packed[order]  # (M, W) lexicographically sorted
    is_new = jnp.concatenate(
        [jnp.ones((1,), bool), jnp.any(sp[1:] != sp[:-1], axis=1)], axis=0
    )
    vid_sorted = jnp.cumsum(is_new.astype(jnp.int32)) - 1  # vertex id per slot
    offsets = jnp.zeros((m,), jnp.int32).at[order].set(vid_sorted)

    # unique packed keys per vertex id (M slots; unused slots = int32 max)
    big = jnp.iinfo(jnp.int32).max
    vkeys = jnp.full((m, packed.shape[1]), big, jnp.int32).at[vid_sorted].set(sp)
    ukeys = jnp.zeros((m, d), jnp.int32).at[vid_sorted].set(
        keys.reshape(m, d)[order]
    )
    n_vertices = vid_sorted[-1] + 1

    # blur neighbors (permutohedral.h:136-158): along direction j,
    # n1 = key - 1 (except coord j: +d), n2 = key + 1 (except coord j: -d)
    def neighbors(j):
        delta1 = jnp.full((d,), -1, jnp.int32)
        delta2 = jnp.full((d,), 1, jnp.int32)
        if j < d:
            delta1 = delta1.at[j].set(d)
            delta2 = delta2.at[j].set(-d)
        n1 = _lookup(vkeys, _pack(ukeys + delta1[None, :], d), n_vertices, m)
        n2 = _lookup(vkeys, _pack(ukeys + delta2[None, :], d), n_vertices, m)
        return jnp.stack([n1, n2], axis=1)  # (M, 2)

    blur = jnp.stack([neighbors(j) for j in range(d + 1)])  # (d+1, M, 2)
    return offsets.reshape(n, d + 1), bary, blur, n_vertices


_COORDS_PER_WORD = 2  # 15 bits per coordinate (|coord| < 16384)


def _pack(keys, d):
    """(.., d) int32 lattice coords -> (.., W) int32 words, lexicographically
    comparable word-by-word.  Two 15-bit coordinates per word keeps every
    realistic CRF coordinate range (|coord| < 16384) without int64 (which JAX
    truncates unless x64 is enabled)."""
    w = -(-d // _COORDS_PER_WORD)
    bits = 31 // _COORDS_PER_WORD
    offset = 1 << (bits - 1)
    words = []
    for wi in range(w):
        acc = jnp.zeros(keys.shape[:-1], jnp.int32)
        for i in range(wi * _COORDS_PER_WORD, min((wi + 1) * _COORDS_PER_WORD, d)):
            acc = (acc << bits) | (keys[..., i] + offset)
        words.append(acc)
    return jnp.stack(words, axis=-1)


def _lookup(sorted_keys, queries, n_valid, m):
    """Vectorized lexicographic binary search of ``queries`` (Q, W) in
    ``sorted_keys`` (M, W); returns vertex index, or ``m`` (the zero-pad
    slot) when absent."""
    mq = queries.shape[0]
    msz = sorted_keys.shape[0]

    def lex_less(a, b):  # a < b over trailing word axis
        lt = a < b
        eq = a == b
        out = lt[..., -1]
        for i in range(a.shape[-1] - 2, -1, -1):
            out = lt[..., i] | (eq[..., i] & out)
        return out

    lo = jnp.zeros((mq,), jnp.int32)
    hi = jnp.full((mq,), msz, jnp.int32)
    for _ in range(int(np.ceil(np.log2(max(msz, 2)))) + 1):
        mid = (lo + hi) // 2
        midc = jnp.clip(mid, 0, msz - 1)
        less = lex_less(sorted_keys[midc], queries)  # key[mid] < query
        lo = jnp.where(less, mid + 1, lo)
        hi = jnp.where(less, hi, mid)
    pos = jnp.clip(lo, 0, msz - 1)
    hit = jnp.all(sorted_keys[pos] == queries, axis=-1) & (pos < n_valid)
    return jnp.where(hit, pos, m).astype(jnp.int32)


def lattice_filter(offsets, bary, blur, x):
    """Symmetric-kernel Gaussian filtering via the lattice: splat -> blur ->
    slice (permutohedral.h compute()).  x: (N, C) -> (N, C)."""
    n, dp1 = offsets.shape
    d = dp1 - 1
    m = n * dp1
    c = x.shape[1]

    # splat: values[o] += b * x[k]
    values = jnp.zeros((m + 1, c), jnp.float32)
    values = values.at[offsets.reshape(-1)].add(
        (bary[..., None] * x[:, None, :]).reshape(m, c)
    )

    # blur: d+1 sequential [1, 2, 1]/2 passes along each lattice direction
    for j in range(dp1):
        n1 = blur[j, :, 0]
        n2 = blur[j, :, 1]
        mixed = values[:m] + 0.5 * (values[n1] + values[n2])
        values = jnp.concatenate([mixed, jnp.zeros((1, c), jnp.float32)], axis=0)

    # slice (alpha undoes the blur gain)
    alpha = 1.0 / (1.0 + 2.0 ** (-d))
    gathered = values[offsets.reshape(-1)].reshape(n, dp1, c)
    return jnp.sum(bary[..., None] * gathered, axis=1) * alpha


# --------------------------------------------------- spatial gaussian (exact)


def _gauss_kernel1d(sigma: float, radius: int):
    xs = np.arange(-radius, radius + 1, dtype=np.float32)
    return jnp.asarray(np.exp(-0.5 * (xs / sigma) ** 2))


def spatial_filter(x, h, w, sigma: float):
    """Separable 2-D Gaussian over (H*W, C), exact up to a 4-sigma cutoff —
    two depthwise convolutions (zero boundary, like the lattice's implicit
    zero exterior)."""
    radius = max(int(np.ceil(4 * sigma)), 1)
    k = _gauss_kernel1d(sigma, radius)
    c = x.shape[1]
    img = x.reshape(1, h, w, c)
    kh = jnp.broadcast_to(k.reshape(-1, 1, 1, 1), (2 * radius + 1, 1, 1, c))
    img = jax.lax.conv_general_dilated(
        img, kh, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    kw = jnp.broadcast_to(k.reshape(1, -1, 1, 1), (1, 2 * radius + 1, 1, c))
    img = jax.lax.conv_general_dilated(
        img, kw, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    return img.reshape(h * w, c)


# ----------------------------------------------------------------- mean field


@partial(jax.jit, static_argnames=("h", "w", "n_iter", "sxy_gauss",
                                   "compat_gauss", "sxy_bilateral",
                                   "srgb_bilateral", "compat_bilateral"))
def dense_crf_jax(
    image_bgr,  # (H, W, 3) float in [0, 255]
    probs,  # (H, W, C) softmax probabilities
    h: int,
    w: int,
    n_iter: int = 10,
    sxy_gauss: float = 1.0,
    compat_gauss: float = 3.0,
    sxy_bilateral: float = 67.0,
    srgb_bilateral: float = 3.0,
    compat_bilateral: float = 4.0,
):
    """On-device mean-field dense CRF (reference crf.py:11-37 defaults).

    Matches csrc/densecrf.cpp: unary = -log(clip(probs, 1e-5, 1)); per
    iteration Q <- softmax(-U + w_g * filt_g(Q) + w_b * filt_b(Q)) with
    symmetric normalization (norm = 1/sqrt(filt(1)))."""
    n = h * w
    c = probs.shape[-1]
    p = probs.reshape(n, c)

    yy, xx = jnp.mgrid[0:h, 0:w]
    pos = jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=1).astype(jnp.float32)
    col = image_bgr.reshape(n, 3).astype(jnp.float32)

    feat_b = jnp.concatenate(
        [pos / sxy_bilateral, col / srgb_bilateral], axis=1
    )
    off_b, bary_b, blur_b, _ = build_lattice(feat_b)

    ones = jnp.ones((n, 1), jnp.float32)
    norm_b = 1.0 / jnp.sqrt(
        lattice_filter(off_b, bary_b, blur_b, ones) + 1e-20
    )
    norm_g = 1.0 / jnp.sqrt(spatial_filter(ones, h, w, sxy_gauss) + 1e-20)

    unary = -jnp.log(jnp.clip(p, 1e-5, 1.0))
    neg_u = -unary
    q = jax.nn.softmax(neg_u, axis=-1)

    def step(q, _):
        msg_g = norm_g * spatial_filter(norm_g * q, h, w, sxy_gauss)
        msg_b = norm_b * lattice_filter(off_b, bary_b, blur_b, norm_b * q)
        logits = neg_u + compat_gauss * msg_g + compat_bilateral * msg_b
        return jax.nn.softmax(logits, axis=-1), None

    q, _ = jax.lax.scan(step, q, None, length=n_iter)
    return q.reshape(h, w, c)
