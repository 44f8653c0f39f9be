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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="segofa_base")
    p.add_argument("--rows", type=int, default=24)
    p.add_argument("--batch-size-valid", type=int, default=8)
    p.add_argument("--patch-image-size", type=int, default=512)
    p.add_argument("--num-seg", type=int, default=16)
    p.add_argument("--resnet-iters", type=int, default=0)
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
