"""Padded native-resolution eval must match the exact-shape forward.

The evaluator (ifseg_tpu/eval) runs images zero-padded into shape buckets with
the valid extent threaded through as traced scalars.  These tests verify the
core claim: valid-region outputs of the padded forward equal the unpadded
forward (which itself was parity-tested against the reference math), for both
the position-gather branch (small grids) and the interpolation branch (grids
larger than the orig 32x32-analog grid).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ifseg_tpu.config import model_config_for_arch
from ifseg_tpu.models.segofa import SegOFA, SegOFAVariables


def tiny_model(num_seg=5, image_size=64):
    cfg = model_config_for_arch(
        "segofa_tiny",
        encoder_embed_dim=32,
        encoder_ffn_embed_dim=64,
        encoder_layers=2,
        encoder_attention_heads=4,
        decoder_embed_dim=32,
        decoder_ffn_embed_dim=64,
        decoder_layers=2,
        decoder_attention_heads=4,
        resnet_type="resnet50",
        patch_image_size=image_size,
        orig_patch_image_size=image_size,
        num_seg_tokens=num_seg,
        dropout=0.0,
        encoder_drop_path_rate=0.0,
        decoder_drop_path_rate=0.0,
        dtype="float32",  # parity check: avoid bf16 rounding differences
    )
    model, params = SegOFAVariables.init(cfg, jax.random.PRNGKey(0))
    return cfg, model, params


@pytest.fixture(scope="module")
def setup():
    return tiny_model()


def _run_exact(model, params, src, img, bos):
    def f(p, s, im, bo):
        logits, extra = model.apply(
            {"params": p}, src_tokens=s, patch_images=im, bos_tokens=bo,
            deterministic=True,
        )
        return logits

    return jax.jit(f)(params, src, img, bos)


def _run_padded(model, params, src, img_padded, h, w, bos):
    def f(p, s, im, bo, hh, ww):
        logits, enc = model.apply(
            {"params": p}, s, im, hh, ww, bo, False, method=SegOFA.eval_forward
        )
        return logits

    return jax.jit(f)(params, src, img_padded, bos, jnp.int32(h), jnp.int32(w))


@pytest.mark.parametrize(
    "hw,pad_hw",
    [
        ((48, 64), (96, 96)),   # 3x4=12 <= 16 grid cells -> gather branch
        ((80, 80), (96, 128)),  # 5x5=25 > 16 -> interpolation branch
    ],
)
def test_padded_matches_exact(setup, hw, pad_hw):
    cfg, model, params = setup
    h, w = hw
    Hb, Wb = pad_hw
    rng = np.random.default_rng(0)
    img = rng.normal(size=(1, h, w, 3)).astype(np.float32)
    padded = np.zeros((1, Hb, Wb, 3), np.float32)
    padded[:, :h, :w] = img
    src = rng.integers(4, 100, size=(1, 10)).astype(np.int32)
    bos = np.zeros((1, 1), np.int32)

    exact = np.asarray(_run_exact(model, params, src, img, bos))
    padded_out = np.asarray(_run_padded(model, params, src, padded, h, w, bos))

    hp, wp = -(-h // 16), -(-w // 16)
    Hp, Wp = Hb // 16, Wb // 16
    # map valid padded grid positions back to the compact grid
    exact_grid = exact[0, 1 : 1 + hp * wp].reshape(hp, wp, -1)
    padded_grid = padded_out[0, 1 : 1 + Hp * Wp].reshape(Hp, Wp, -1)
    np.testing.assert_allclose(
        padded_grid[:hp, :wp], exact_grid, rtol=2e-4, atol=2e-4
    )
    # BOS slot too
    np.testing.assert_allclose(padded_out[0, 0], exact[0, 0], rtol=2e-4, atol=2e-4)


def test_evaluator_smoke(setup, monkeypatch):
    """Evaluator end-to-end on a tiny sample: areas are consistent."""
    import ifseg_tpu.eval.evaluator as ev

    monkeypatch.setattr(ev, "BUCKET", 64)
    monkeypatch.setattr(ev, "ROW_CHUNK", 32)

    cfg, model, params = setup
    from ifseg_tpu.config import Config

    full_cfg = Config()
    full_cfg = full_cfg.replace(model=cfg)
    full_cfg.criterion.resnet_iters = 2
    full_cfg.criterion.resnet_topk = 2

    rng = np.random.default_rng(1)
    from ifseg_tpu.data.segmentation_dataset import EvalSample

    sample = EvalSample(
        patch_image=rng.normal(size=(48, 80, 3)).astype(np.float32),
        src_tokens=rng.integers(4, 100, size=(10,)).astype(np.int32),
        bos_token=np.zeros((1,), np.int32),
        ori_semantic_seg=rng.integers(0, 5, size=(100, 160)).astype(np.int32),
        ori_shape=(100, 160, 3),
    )
    evaluator = ev.Evaluator(full_cfg, model)
    out = evaluator.eval_sample(params, sample)
    ai, au = out["area_intersect"], out["area_union"]
    assert ai.shape == (5,)
    assert np.isfinite(out["nll_loss"])
    assert (ai <= au + 1e-6).all()
    # total label area equals the number of (non-unknown) original pixels
    assert np.isclose(out["area_label"].sum(), 100 * 160)
    assert "area_intersect_resnet_postprocess" in out


def test_evaluator_mixed_shapes(setup, monkeypatch):
    """Several distinct image/target shapes through one Evaluator: bucket
    cache reuse, both orientation paddings, consistent area totals."""
    import ifseg_tpu.eval.evaluator as ev

    monkeypatch.setattr(ev, "BUCKET", 64)
    monkeypatch.setattr(ev, "ROW_CHUNK", 32)

    cfg, model, params = setup
    from ifseg_tpu.config import Config
    from ifseg_tpu.data.segmentation_dataset import EvalSample

    full_cfg = Config().replace(model=cfg)
    evaluator = ev.Evaluator(full_cfg, model)
    rng = np.random.default_rng(3)
    shapes = [((48, 80), (96, 160)), ((80, 48), (200, 120)), ((48, 80), (90, 150))]
    for (h, w), (H, W) in shapes:
        sample = EvalSample(
            patch_image=rng.normal(size=(h, w, 3)).astype(np.float32),
            src_tokens=rng.integers(4, 100, size=(10,)).astype(np.int32),
            bos_token=np.zeros((1,), np.int32),
            ori_semantic_seg=rng.integers(0, 5, size=(H, W)).astype(np.int32),
            ori_shape=(H, W, 3),
        )
        out = evaluator.eval_sample(params, sample)
        assert np.isclose(out["area_label"].sum(), H * W), (H, W)
        assert np.isfinite(out["nll_loss"])
    # first and third shapes share buckets -> only 2 compiled fns
    assert len(evaluator._fns) == 2


def test_eval_dataset_batched_matches_per_sample(setup, monkeypatch):
    """--batch-size-valid: grouped padded forward sums the same per-class
    areas as sample-at-a-time evaluation (VERDICT round-1 item 7)."""
    import ifseg_tpu.eval.evaluator as ev

    monkeypatch.setattr(ev, "BUCKET", 64)
    monkeypatch.setattr(ev, "ROW_CHUNK", 32)

    cfg, model, params = setup
    from ifseg_tpu.config import Config
    from ifseg_tpu.data.segmentation_dataset import EvalSample

    full_cfg = Config().replace(model=cfg)
    rng = np.random.default_rng(5)

    samples = []
    # 3 samples share one exact shape (batched as a padded group of 4),
    # 1 sample has another shape (its own group)
    for h, w, H, W in ((48, 80, 96, 160),) * 3 + ((80, 48, 120, 100),):
        samples.append(EvalSample(
            patch_image=rng.normal(size=(h, w, 3)).astype(np.float32),
            src_tokens=rng.integers(4, 100, size=(10,)).astype(np.int32),
            bos_token=np.zeros((1,), np.int32),
            ori_semantic_seg=rng.integers(0, 5, size=(H, W)).astype(np.int32),
            ori_shape=(H, W, 3),
        ))

    class ListDS:
        def __len__(self):
            return len(samples)

        def get_eval_sample(self, i):
            return samples[i]

    evaluator = ev.Evaluator(full_cfg, model)
    per = [evaluator.eval_sample(params, s) for s in samples]
    want = sum(np.asarray(o["area_intersect"]) for o in per)
    want_label = sum(np.asarray(o["area_label"]) for o in per)

    logs = evaluator.eval_dataset(params, ListDS(), batch_size=4)
    assert len(logs) == 2  # one group of 3 (padded to 4), one singleton
    got = sum(np.asarray(o["area_intersect"]) for o in logs)
    got_label = sum(np.asarray(o["area_label"]) for o in logs)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    np.testing.assert_allclose(got_label, want_label, rtol=1e-5)


def test_eval_dataset_bucket_groups_mixed_exact_shapes(setup, monkeypatch):
    """Samples with DIFFERENT exact pixel shapes batch together when they
    share ceil-16 patch extents (the group-shared forward builds positions/
    biases once per group), and split when the ceil extents differ.  Either
    way the summed areas must match per-sample eval (VERDICT round-2
    item 4: keep-ratio resize makes exact shapes unique, so grouping must
    be coarser than exact shapes)."""
    import ifseg_tpu.eval.evaluator as ev

    monkeypatch.setattr(ev, "BUCKET", 64)
    monkeypatch.setattr(ev, "ROW_CHUNK", 32)

    cfg, model, params = setup
    from ifseg_tpu.config import Config
    from ifseg_tpu.data.segmentation_dataset import EvalSample

    full_cfg = Config().replace(model=cfg)
    rng = np.random.default_rng(7)

    # four distinct exact shapes inside the (64,128)/(128,192) buckets;
    # the first three share ceil-16 extents (3, 5) -> one group, the last
    # is (4, 6) -> its own group
    shapes = [
        ((48, 80), (96, 160)),
        ((47, 79), (100, 150)),
        ((45, 77), (90, 170)),
        ((64, 96), (128, 190)),
    ]
    samples = []
    for (h, w), (H, W) in shapes:
        samples.append(EvalSample(
            patch_image=rng.normal(size=(h, w, 3)).astype(np.float32),
            src_tokens=rng.integers(4, 100, size=(10,)).astype(np.int32),
            bos_token=np.zeros((1,), np.int32),
            ori_semantic_seg=rng.integers(0, 5, size=(H, W)).astype(np.int32),
            ori_shape=(H, W, 3),
        ))

    class ListDS:
        def __len__(self):
            return len(samples)

        def get_eval_sample(self, i):
            return samples[i]

    evaluator = ev.Evaluator(full_cfg, model)
    per = [evaluator.eval_sample(params, s) for s in samples]
    want = sum(np.asarray(o["area_intersect"]) for o in per)
    want_label = sum(np.asarray(o["area_label"]) for o in per)

    evaluator2 = ev.Evaluator(full_cfg, model)
    logs = evaluator2.eval_dataset(params, ListDS(), batch_size=4)
    assert len(logs) == 2, (
        "three shapes share ceil extents (3,5) -> one group; (64,96) -> its own"
    )
    got = sum(np.asarray(o["area_intersect"]) for o in logs)
    got_label = sum(np.asarray(o["area_label"]) for o in logs)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    np.testing.assert_allclose(got_label, want_label, rtol=1e-5)


def test_bucket_batching_forms_groups(monkeypatch):
    """--batch-size-valid must form REAL batches under keep-ratio shape
    spread: unique exact shapes, a handful of 256px buckets (VERDICT r3
    item 5).  _run_group is stubbed so this asserts pure grouping logic."""
    from ifseg_tpu.config import Config
    from ifseg_tpu.data.segmentation_dataset import EvalSample
    from ifseg_tpu.eval.evaluator import Evaluator

    rng = np.random.default_rng(0)
    shapes = [(480, 640), (640, 480), (427, 640), (480, 640), (375, 500),
              (640, 426), (481, 640), (333, 500)]
    samples = []
    for i in range(24):
        h, w = shapes[i % len(shapes)]
        samples.append(
            EvalSample(
                patch_image=np.zeros((h, w, 3), np.float32),
                src_tokens=np.zeros((12,), np.int32),
                bos_token=np.zeros((1,), np.int32),
                ori_semantic_seg=rng.integers(0, 3, size=(h, w)).astype(np.int32),
                ori_shape=(h, w),
                id=i,
            )
        )

    class DS:
        def __len__(self):
            return len(samples)

        def get_eval_sample(self, i):
            return samples[i]

    ev = Evaluator(Config(), None)
    monkeypatch.setattr(
        ev, "_run_group", lambda params, group: {"n": np.asarray(len(group))}
    )
    stats = {}
    outs = ev.eval_dataset(None, DS(), batch_size=8, stats_out=stats)
    assert sum(stats["group_sizes"]) == 24  # every sample evaluated once
    assert max(stats["group_sizes"]) >= 4  # real batching formed
    assert sum(o["n"] for o in outs) == 24


def test_eval_uint8_wire_matches_host_normalized(setup, monkeypatch):
    """The uint8 wire format (raw RGB shipped, normalize on device —
    evaluator.py _make_fn) must produce the same areas/nll as shipping the
    host-normalized fp32 image (the pre-round-5 format, still accepted for
    fabricated test rows)."""
    import ifseg_tpu.eval.evaluator as ev
    from ifseg_tpu.data.segmentation_dataset import EvalSample, eval_mean_std
    from ifseg_tpu.data.transforms import normalize_image

    monkeypatch.setattr(ev, "BUCKET", 64)
    monkeypatch.setattr(ev, "ROW_CHUNK", 32)

    cfg, model, params = setup
    from ifseg_tpu.config import Config

    full_cfg = Config().replace(model=cfg)
    rng = np.random.default_rng(11)
    raw = rng.integers(0, 256, size=(48, 80, 3)).astype(np.uint8)
    seg = rng.integers(0, 5, size=(100, 160)).astype(np.int32)
    mean, std = eval_mean_std(full_cfg.task)

    def mk(img):
        return EvalSample(
            patch_image=img,
            src_tokens=rng.integers(4, 100, size=(10,)).astype(np.int32),
            bos_token=np.zeros((1,), np.int32),
            ori_semantic_seg=seg,
            ori_shape=(100, 160, 3),
        )

    rng = np.random.default_rng(11)  # identical src tokens for both rows
    s_u8 = mk(raw)
    rng = np.random.default_rng(11)
    s_f32 = mk(normalize_image(raw, mean, std))

    ev_u8 = ev.Evaluator(full_cfg, model).eval_sample(params, s_u8)
    ev_f32 = ev.Evaluator(full_cfg, model).eval_sample(params, s_f32)
    # the two compiled programs fuse the normalize differently, so fp32
    # noise can flip argmax at decision boundaries (a random tiny model has
    # near-zero margins everywhere); the contract is equivalence up to a
    # small pixel budget, plus tight agreement of the smooth nll
    n_px = float(ev_f32["area_label"].sum())
    for k in ("area_intersect", "area_union", "area_label"):
        drift = np.abs(ev_u8[k] - ev_f32[k]).sum()
        assert drift <= 0.01 * n_px, (k, drift, n_px)
    np.testing.assert_allclose(ev_u8["nll_loss"], ev_f32["nll_loss"], rtol=1e-3)
