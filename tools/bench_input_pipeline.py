"""Host input-pipeline throughput vs the train step's consumption (VERDICT r3
item 6).

Measures the full host path at the reference config — TSV row read ->
base64/PNG decode -> mmseg-semantics augs (Resize ratio-range, RandomCrop,
Flip, PhotoMetricDistortion) -> artificial-grid synthesis -> fixed-shape
collate — and (on TPU) the device upload via trainer.prepare_batch, in
rows/sec.  Compare against the train step's measured consumption
(bench.py --train img_per_s, 53 img/s on v5e) to know how many host cores a
deployment needs; the train loop's ``data_wait_ms``/``data_stalls`` meters
(cli/train.py) report the same thing live.

  python tools/bench_input_pipeline.py [--rows=96] [--batch=16]
      [--workers=0,2] [--no-device]

Prints one JSON line per worker setting.  Reference analog: BufferedIterator
background thread + plasma feed (fairseq/data/iterators.py:551-641,
data/plasma_utils.py) — also never measured there.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def make_tsv(path: str, rows: int, num_seg: int, size=(512, 512), seed=0):
    from utils import png_b64  # tests/utils.py

    rng = np.random.default_rng(seed)
    h, w = size
    with open(path, "w") as fp:
        for i in range(rows):
            img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
            seg = rng.integers(0, num_seg + 1, size=(h, w)).astype(np.uint8)
            fp.write(f"{png_b64(img)}\t{png_b64(seg)}\t{i}\n")
    return path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=96)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--num-seg", type=int, default=150)
    p.add_argument("--workers", default="0")
    p.add_argument("--patch-image-size", type=int, default=512)
    p.add_argument("--no-device", action="store_true",
                   help="skip the prepare_batch upload (no TPU needed)")
    p.add_argument("--image-free", action="store_true",
                   help="measure the fast path (decode_real_images=false): "
                        "grid synthesis only, no PNG decode / augs")
    args = p.parse_args()

    from ifseg_tpu.config import Config, model_config_for_arch
    from ifseg_tpu.tasks.segmentation import SegmentationTask

    tsv = make_tsv("/tmp/input_bench.tsv", args.rows, min(args.num_seg, 200))
    cfg = Config()
    cfg = cfg.replace(
        model=model_config_for_arch(
            "segofa_base",
            num_seg_tokens=args.num_seg,
            patch_image_size=args.patch_image_size,
            orig_patch_image_size=args.patch_image_size,
        )
    )
    cfg.task.num_seg_tokens = args.num_seg
    cfg.task.patch_image_size = args.patch_image_size
    cfg.task.data = tsv
    cfg.task.category_list = ", ".join(f"c{i}" for i in range(args.num_seg))
    if args.image_free:
        cfg.task.decode_real_images = False

    task = SegmentationTask.setup_task(cfg)
    task.load_dataset("train")

    prepare = None
    if not args.no_device:
        import jax

        from ifseg_tpu.parallel.mesh import MeshConfig, build_mesh
        from ifseg_tpu.train.trainer import Trainer

        mesh = build_mesh(MeshConfig(1, 1, 1), devices=jax.devices()[:1])
        trainer = Trainer(cfg, mesh, total_num_updates=1)
        prepare = trainer.prepare_batch

    for workers in [int(w) for w in args.workers.split(",")]:
        cfg.task.num_workers = workers
        itr = task.get_batch_iterator("train", batch_size=args.batch, seed=7)
        # warm epoch: offset index, cv2 thread pools, worker spawn
        for batch in itr.next_epoch_itr():
            if prepare is not None:
                prepare(batch)
        # timed epoch measures PRODUCTION, not buffer drain: the clock starts
        # before the first batch so rows pre-computed by prefetch workers
        # during a warm-up wait cannot flatter the number (they cost wall
        # time inside the window too)
        n = 0
        t0 = time.perf_counter()
        for batch in itr.next_epoch_itr():
            if prepare is not None:
                prepare(batch)  # async upload enqueue, like the train loop
            n += args.batch
        dt = time.perf_counter() - t0
        rows_per_s = n / dt
        print(
            json.dumps(
                {
                    "metric": "input_pipeline_throughput",
                    "value": round(rows_per_s, 2),
                    "unit": "rows/sec/host",
                    "workers": workers,
                    "rows": n - args.batch,
                    "image_free_fast_path": args.image_free,
                    "with_device_upload": prepare is not None,
                    "train_consumption_ref": "see bench.py --train img_per_s",
                }
            )
        )


if __name__ == "__main__":
    main()
