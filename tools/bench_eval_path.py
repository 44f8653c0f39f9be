"""End-to-end native-resolution eval throughput (VERDICT r3 item 5).

Reference protocol: MultiScaleFlipAug keep-ratio resize, eval batch 1
(coco_unseen.sh:87,106; segmentation_dataset.py:169-173).  Here the
bucket-batched evaluator (--batch-size-valid) runs the same protocol in real
batches; this tool measures images/sec over a synthetic multi-shape TSV with
COCO-val-like aspect ratios and prints the bucket-group histogram proving
>=4-way batching actually forms.

  python tools/bench_eval_path.py [--arch=segofa_base] [--rows=24]
      [--batch-size-valid=8] [--patch-image-size=512]

Two passes over the data: pass 1 compiles each bucket's program (excluded),
pass 2 is timed.  Prints one JSON line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_tpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

# COCO-val-like original shapes (keep-ratio resize clusters these into a few
# 256px buckets at patch 512)
SHAPES = [(480, 640), (640, 480), (427, 640), (480, 640), (375, 500),
          (640, 426), (480, 640), (333, 500)]


def make_tsv(path: str, rows: int, num_seg: int = 16, seed: int = 0):
    from utils import png_b64  # tests/utils.py

    rng = np.random.default_rng(seed)
    with open(path, "w") as fp:
        for i in range(rows):
            h, w = SHAPES[i % len(SHAPES)]
            img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
            seg = rng.integers(0, num_seg + 1, size=(h, w)).astype(np.uint8)
            fp.write(f"{png_b64(img)}\t{png_b64(seg)}\t{i}\n")
    return path


def _sync(x):
    """Honest device sync: read back one scalar (block_until_ready can return
    early through the axon relay)."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(leaf).ravel()[0])


def itemize(evaluator, ds, params, batch_size: int):
    """Time each phase of the dominant bucket group separately (VERDICT r4
    item 2: attribute the 3 img/s before attacking it)."""
    import jax.numpy as jnp

    from ifseg_tpu.eval.evaluator import _bucket, _upsampled_areas_dyn
    from ifseg_tpu.models.segofa import SegOFA
    from ifseg_tpu.ops.resize import bilinear_matrix_dyn

    # ---- host decode (keep-ratio resize + normalize, cv2) ----
    t0 = time.perf_counter()
    samples = [ds.get_eval_sample(i) for i in range(len(ds))]
    host_ms = 1e3 * (time.perf_counter() - t0) / len(ds)

    # dominant group (bucket + shared ceil-16 extents), filled to batch_size
    groups = {}
    for s in samples:
        key = (_bucket(s.patch_image.shape[0]), _bucket(s.patch_image.shape[1]),
               _bucket(s.ori_semantic_seg.shape[0]),
               _bucket(s.ori_semantic_seg.shape[1]),
               -(-s.patch_image.shape[0] // 16),
               -(-s.patch_image.shape[1] // 16))
        groups.setdefault(key, []).append(s)
    key, grp = max(groups.items(), key=lambda kv: len(kv[1]))
    grp = (grp * batch_size)[:batch_size]
    n = len(grp)
    key = key[:4]
    print(f"itemizing bucket {key} at group size {n}")

    def timed(name, fn, iters=4):
        fn()  # compile/warm
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        if out is not None:
            _sync(out)
        ms = 1e3 * (time.perf_counter() - t0) / iters
        print(f"  {name:<26} {ms:9.1f} ms  ({ms / n:6.1f} ms/img)")
        return ms

    rows = {"host_decode": host_ms * n}
    print(f"  {'host_decode':<26} {host_ms * n:9.1f} ms  ({host_ms:6.1f} ms/img)")
    rows["pack"] = timed("pack (host)", lambda: evaluator._pack_group(grp))
    _, args = evaluator._pack_group(grp)
    rows["h2d"] = timed(
        "H2D upload", lambda: jax.device_put(args), iters=2
    )
    dev_args = jax.device_put(args)

    # forward only: the batched group-shared padded forward (per-row pixel
    # extents for the stem mask, positions/biases built once per group),
    # no upsample/areas
    model = evaluator.model
    crit = evaluator.cfg.criterion

    from ifseg_tpu.data.segmentation_dataset import eval_mean_std

    mean, std = eval_mean_std(evaluator.cfg.task)
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)

    def fwd_batch(p, src, image, ih, iw, bos):
        if image.dtype == jnp.uint8:
            image = (image.astype(jnp.float32) / 255.0 - mean_a) / std_a
        logits, enc = model.apply(
            {"params": p}, src, image, ih, iw, bos,
            crit.full_context_alignment, method=SegOFA.eval_forward,
        )
        return logits.sum()

    fwd = jax.jit(fwd_batch)
    src, image, bos, _tgt, meta = dev_args
    img_h, img_w = meta[0], meta[1]
    rows["forward"] = timed(
        "model forward", lambda: fwd(params, src, image, img_h, img_w, bos)
    )

    # upsample + confusion areas only, from a random on-device grid
    Hb, Wb, Ho, Wo = key
    Hp, Wp = Hb // 16, Wb // 16
    num_seg = evaluator.cfg.model.num_seg_tokens
    grid = jnp.asarray(
        np.random.default_rng(0).normal(size=(n, Hp, Wp, num_seg)), jnp.float32
    )
    target = _tgt.astype(jnp.int32)
    ori_h, ori_w = meta[2], meta[3]
    from ifseg_tpu.eval.evaluator import ROW_CHUNK

    def up_single(g, tgt, oh, ow, ih, iw):
        hp, wp = -(-ih // 16), -(-iw // 16)
        uh = bilinear_matrix_dyn(Hp, Ho, oh, in_valid=hp)
        uw = bilinear_matrix_dyn(Wp, Wo, ow, in_valid=wp)
        r = jnp.arange(Ho)[:, None]
        cc = jnp.arange(Wo)[None, :]
        valid = ((r < oh) & (cc < ow) & (tgt != num_seg))[None]
        areas, ce = _upsampled_areas_dyn(
            g[None], tgt[None], valid, num_seg, uh, uw, Ho // ROW_CHUNK
        )
        return areas[0]

    up = jax.jit(jax.vmap(up_single, in_axes=(0, 0, 0, 0, 0, 0)))
    rows["upsample_areas"] = timed(
        "upsample+areas",
        lambda: up(grid, target, ori_h, ori_w, img_h, img_w),
    )

    full = evaluator._fns.get(key)
    if full is None:
        full = evaluator._make_fn(key[:2], key[2:])
        evaluator._fns[key] = full
    rows["full_fn"] = timed("full eval fn", lambda: full(params, *dev_args))
    unattributed = rows["full_fn"] - rows["forward"] - rows["upsample_areas"]
    print(f"  {'full - fwd - upsample':<26} {unattributed:9.1f} ms  "
          f"(bias construction & co)")
    return key, dev_args, full


def trace_group(params, dev_args, full_fn, out_dir="/tmp/ifseg_eval_trace"):
    """Per-op device attribution of one group execution."""
    _sync(full_fn(params, *dev_args))  # warm
    with jax.profiler.trace(out_dir):
        for _ in range(2):
            _sync(full_fn(params, *dev_args))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from profile_trace import summarize

    summarize(out_dir, iters=2)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="segofa_base")
    p.add_argument("--rows", type=int, default=24)
    p.add_argument("--batch-size-valid", type=int, default=8)
    p.add_argument("--patch-image-size", type=int, default=512)
    p.add_argument("--num-seg", type=int, default=16)
    p.add_argument("--resnet-iters", type=int, default=0)
    p.add_argument("--itemize", action="store_true",
                   help="per-phase timing of the dominant bucket group")
    p.add_argument("--trace", action="store_true",
                   help="with --itemize: per-op trace of the full eval fn")
    args = p.parse_args()

    from ifseg_tpu.config import Config, model_config_for_arch
    from ifseg_tpu.eval.evaluator import Evaluator
    from ifseg_tpu.models.segofa import SegOFA, SegOFAVariables
    from ifseg_tpu.tasks.segmentation import SegmentationTask

    tsv = make_tsv("/tmp/eval_bench.tsv", args.rows, args.num_seg)
    cfg = Config()
    cfg = cfg.replace(
        model=model_config_for_arch(
            args.arch,
            num_seg_tokens=args.num_seg,
            patch_image_size=args.patch_image_size,
            orig_patch_image_size=args.patch_image_size,
        )
    )
    cfg.task.num_seg_tokens = args.num_seg
    cfg.task.patch_image_size = args.patch_image_size
    cfg.task.data = tsv
    cfg.task.category_list = ", ".join(f"class{i}" for i in range(args.num_seg))
    cfg.criterion.resnet_iters = args.resnet_iters

    task = SegmentationTask.setup_task(cfg)
    ds = task.load_dataset("valid")
    _, params = SegOFAVariables.init(cfg.model, jax.random.PRNGKey(0))
    evaluator = Evaluator(cfg, SegOFA(cfg.model))

    if args.itemize:
        key, dev_args, full_fn = itemize(
            evaluator, ds, params, args.batch_size_valid
        )
        if args.trace:
            trace_group(params, dev_args, full_fn)
        return

    # pass 1: compile every bucket program (and warm the host caches)
    stats = {}
    evaluator.eval_dataset(params, ds, batch_size=args.batch_size_valid,
                           stats_out=stats)
    print("buckets:", {str(k): v for k, v in stats["buckets"].items()})
    print("group sizes (compile pass):", stats["group_sizes"])

    # pass 2: timed
    stats = {}
    t0 = time.perf_counter()
    evaluator.eval_dataset(params, ds, batch_size=args.batch_size_valid,
                           stats_out=stats)
    dt = time.perf_counter() - t0
    ips = len(ds) / dt
    max_group = max(stats["group_sizes"])
    print(
        json.dumps(
            {
                "metric": "native_res_eval_throughput",
                "value": round(ips, 2),
                "unit": "images/sec/chip",
                "rows": len(ds),
                "batch_size_valid": args.batch_size_valid,
                "group_sizes": stats["group_sizes"],
                "max_group": max_group,
                "resnet_iters": args.resnet_iters,
            }
        )
    )
    assert max_group >= 4, (
        f"bucket batching degenerated (max group {max_group}) — "
        "--batch-size-valid is not forming real batches"
    )


if __name__ == "__main__":
    main()
