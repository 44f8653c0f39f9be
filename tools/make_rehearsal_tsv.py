"""Synthetic reference-format TSV for the full-scale dress rehearsal.

Generates `rows` TSV lines (base64 RGB PNG, base64 pre-shift label PNG,
row id — the exact column layout run_scripts/IFSeg expects via
--selected-cols=0,1,2) with COCO-val-like aspect ratios.  Images are
low-frequency blobs (PNG-compressible: a 1600-row file stays ~tens of MB
where random noise would be >1 GB) drawn from a small pool that is re-used
across rows with distinct ids, so generation is fast on a 1-core host;
labels are pre-shift (0 = ignore, 1..num_seg = classes, ref
segmentation_dataset label shift :230-234).

  python tools/make_rehearsal_tsv.py --out=dataset/coco/unseen_val2017.tsv \
      --rows=1600 --num-seg=15
"""

import argparse
import base64
import io
import os
import sys

import numpy as np
from PIL import Image


def _b64png(arr: np.ndarray) -> str:
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.urlsafe_b64encode(buf.getvalue()).decode()


# COCO-val-like original shapes (keep-ratio resize clusters these into a
# handful of 256px buckets at patch 512)
SHAPES = [(480, 640), (640, 480), (427, 640), (375, 500), (640, 426),
          (333, 500), (480, 640), (512, 512)]


def _blob_image(rng, h, w):
    """Low-frequency RGB blobs: upsample an 8x8 random field."""
    small = rng.integers(0, 255, size=(8, 8, 3), dtype=np.uint8)
    return np.asarray(
        Image.fromarray(small).resize((w, h), Image.BILINEAR), np.uint8
    )


def _blob_label(rng, h, w, num_seg):
    """Blocky label regions in [0, num_seg] (0 = ignore)."""
    small = rng.integers(0, num_seg + 1, size=(12, 12), dtype=np.uint8)
    return np.asarray(
        Image.fromarray(small).resize((w, h), Image.NEAREST), np.uint8
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--rows", type=int, default=1600)
    p.add_argument("--num-seg", type=int, default=15)
    p.add_argument("--pool", type=int, default=64,
                   help="unique (image, label) pairs re-used across rows")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    rng = np.random.default_rng(args.seed)
    pool = []
    for i in range(args.pool):
        h, w = SHAPES[i % len(SHAPES)]
        pool.append(
            (
                _b64png(_blob_image(rng, h, w)),
                _b64png(_blob_label(rng, h, w, args.num_seg)),
            )
        )

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as fp:
        for i in range(args.rows):
            img, seg = pool[i % args.pool]
            fp.write(f"{img}\t{seg}\t{i}\n")
    print(f"wrote {args.rows} rows ({os.path.getsize(args.out)/2**20:.1f} MiB) "
          f"-> {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
