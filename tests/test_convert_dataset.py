"""Dataset conversion maps + TSV round trip through the training loader."""

import numpy as np
import pytest

from ifseg_tpu.cli.convert_dataset import (
    COCO_FINE_MAP,
    MAPS,
    ade_map,
    unseen_map,
)

# the notebook's literal (convert_segmentation_coco.ipynb cell 1, pre-shift)
_NB_FINE_ID = {
    0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 6, 7: 7, 8: 8, 9: 9, 10: 10,
    12: 11, 13: 12, 14: 13, 15: 14, 16: 15, 17: 16, 18: 17, 19: 18, 20: 19,
    21: 20, 22: 21, 23: 22, 24: 23, 26: 24, 27: 25, 30: 26, 31: 27, 32: 28,
    33: 29, 34: 30, 35: 31, 36: 32, 37: 33, 38: 34, 39: 35, 40: 36, 41: 37,
    42: 38, 43: 39, 45: 40, 46: 41, 47: 42, 48: 43, 49: 44, 50: 45, 51: 46,
    52: 47, 53: 48, 54: 49, 55: 50, 56: 51, 57: 52, 58: 53, 59: 54, 60: 55,
    61: 56, 62: 57, 63: 58, 64: 59, 66: 60, 69: 61, 71: 62, 72: 63, 73: 64,
    74: 65, 75: 66, 76: 67, 77: 68, 78: 69, 79: 70, 80: 71, 81: 72, 83: 73,
    84: 74, 85: 75, 86: 76, 87: 77, 88: 78, 89: 79, 91: 80, 92: 81, 93: 82,
    94: 83, 95: 84, 96: 85, 97: 86, 98: 87, 99: 88, 100: 89, 101: 90,
    102: 91, 103: 92, 104: 93, 105: 94, 106: 95, 107: 96, 108: 97, 109: 98,
    110: 99, 111: 100, 112: 101, 113: 102, 114: 103, 115: 104, 116: 105,
    117: 106, 118: 107, 119: 108, 120: 109, 121: 110, 122: 111, 123: 112,
    124: 113, 125: 114, 126: 115, 127: 116, 128: 117, 129: 118, 130: 119,
    131: 120, 132: 121, 133: 122, 134: 123, 135: 124, 136: 125, 137: 126,
    138: 127, 139: 128, 140: 129, 141: 130, 142: 131, 143: 132, 144: 133,
    145: 134, 146: 135, 147: 136, 148: 137, 149: 138, 150: 139, 151: 140,
    152: 141, 153: 142, 154: 143, 155: 144, 156: 145, 157: 146, 158: 147,
    159: 148, 160: 149, 161: 150, 162: 151, 163: 152, 164: 153, 165: 154,
    166: 155, 167: 156, 168: 157, 169: 158, 170: 159, 171: 160, 172: 161,
    173: 162, 174: 163, 175: 164, 176: 165, 177: 166, 178: 167, 179: 168,
    180: 169, 181: 170, 255: 0,
}


def notebook_coco_map():
    """Replicates the notebook's post-processing exactly."""
    shifted = {k: v + 1 for k, v in _NB_FINE_ID.items()}
    shifted[255] = 0
    for key in range(182):
        if key not in shifted:
            shifted[key] = 0
    return shifted


def test_coco_fine_map_matches_notebook():
    want = notebook_coco_map()
    for k, v in want.items():
        assert COCO_FINE_MAP[k] == v, (k, COCO_FINE_MAP[k], v)


def test_ade_map():
    m = ade_map()
    assert m[0] == 1 and m[149] == 150 and m[150] == 0
    assert m[200] == 0  # out-of-range raw values -> ignore


def test_unseen_map_selects_15():
    m = unseen_map()
    vals = set(m.values())
    assert vals == set(range(16))
    # frisbee: compact fine 29 (shifted 30) -> unseen 1; raw coco id for
    # compact 29 is 33 (gap-skipping)
    raw_for_fine29 = [k for k, v in notebook_coco_map().items() if v == 30]
    assert all(m[r] == 1 for r in raw_for_fine29)


def test_tsv_round_trip(tmp_path):
    """convert_dataset rows load correctly through SegmentationDataset."""
    import base64
    import io

    from PIL import Image

    from ifseg_tpu.cli.convert_dataset import convert_row
    from ifseg_tpu.config import TaskConfig
    from ifseg_tpu.data.file_dataset import FileDataset
    from ifseg_tpu.data.segmentation_dataset import SegmentationDataset
    from ifseg_tpu.tokenization.dictionary import build_seg_dictionary
    from ifseg_tpu.tokenization.gpt2_bpe import GPT2BPE

    rng = np.random.default_rng(0)
    img_dir = tmp_path / "img"
    ann_dir = tmp_path / "ann"
    img_dir.mkdir()
    ann_dir.mkdir()
    img = rng.integers(0, 255, size=(64, 48, 3), dtype=np.uint8)
    # raw "generic" labels: classes 0..2 + ignore 255
    ann = rng.integers(0, 3, size=(64, 48)).astype(np.uint8)
    ann[:4] = 255
    Image.fromarray(img).save(img_dir / "a.jpg")
    Image.fromarray(ann).save(ann_dir / "a.png")

    row = convert_row(
        (1, str(ann_dir / "a.png"), str(img_dir), [".jpg"], MAPS["generic"]())
    )
    tsv = tmp_path / "d.tsv"
    tsv.write_text(row + "\n")

    cfg = TaskConfig(
        data=str(tsv), num_seg_tokens=3, category_list="a, b, c",
        patch_image_size=32, orig_patch_image_size=32,
    )
    ds = SegmentationDataset(
        "valid",
        FileDataset(str(tsv), "0,1,2", cached_index=False),
        GPT2BPE.from_dir("assets/BPE"),
        build_seg_dictionary("assets/BPE", num_seg_tokens=3),
        cfg,
    )
    s = ds.get_eval_sample(0)
    # loader shift: stored v -> class v-1, stored 0 -> unknown (=3)
    assert s.ori_semantic_seg.shape == (64, 48)
    assert (s.ori_semantic_seg[:4] == 3).all()  # 255 -> 0 -> unknown
    valid = s.ori_semantic_seg[4:]
    np.testing.assert_array_equal(np.unique(valid), np.unique(ann[4:]))
