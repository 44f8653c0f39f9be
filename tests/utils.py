"""Test fixtures (analog of custom_fairseq/tests/utils.py): synthetic TSV
segmentation datasets and tiny configs."""

import base64
import io
import os

import numpy as np
from PIL import Image


def png_b64(arr: np.ndarray) -> str:
    img = Image.fromarray(arr)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.urlsafe_b64encode(buf.getvalue()).decode()


def make_seg_tsv(path: str, rows: int = 4, num_seg: int = 3, size=(96, 80), seed=0):
    """TSV rows: base64 RGB PNG, base64 label PNG (pre-shift: 0=ignore,
    v=class v-1), uniq id — the reference's conversion-notebook format."""
    rng = np.random.default_rng(seed)
    h, w = size
    with open(path, "w") as fp:
        for i in range(rows):
            img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
            # blocky labels so cat_max_ratio crops behave
            seg = np.zeros((h, w), np.uint8)
            for _ in range(6):
                y, x = rng.integers(0, h), rng.integers(0, w)
                dy, dx = rng.integers(8, h // 2), rng.integers(8, w // 2)
                seg[y : y + dy, x : x + dx] = rng.integers(0, num_seg + 1)
            fp.write(f"{png_b64(img)}\t{png_b64(seg)}\t{i}\n")
    return path


def make_solid_seg_tsv(path: str, num_seg: int = 3, rows_per_class: int = 3,
                       size=(48, 48)):
    """Solid-color rows: class k <-> a saturated color; the mask is class k
    everywhere (pre-shift TSV encoding: v = class v-1, so write k+1).  A
    supervised run must learn color -> class to high mIoU — the learnability
    gate (VERDICT r3 item 2a)."""
    colors = [
        (255, 40, 40), (40, 255, 40), (40, 40, 255),
        (255, 255, 40), (255, 40, 255), (40, 255, 255),
    ]
    assert num_seg <= len(colors)
    h, w = size
    i = 0
    with open(path, "w") as fp:
        # INTERLEAVE classes: the train iterator serves contiguous batches in
        # file order (reference sequential-sampler semantics,
        # tasks/ofa_task.py:121-165), so class-sorted rows would make every
        # batch single-class and the optimization oscillate instead of learn
        for _ in range(rows_per_class):
            for k in range(num_seg):
                img = np.zeros((h, w, 3), np.uint8)
                img[:] = colors[k]
                seg = np.full((h, w), k + 1, np.uint8)
                fp.write(f"{png_b64(img)}\t{png_b64(seg)}\t{i}\n")
                i += 1
    return path
