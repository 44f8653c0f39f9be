"""Evaluation-only entry point (the fairseq_cli/validate.py analog).

Runs native-resolution mIoU evaluation over a TSV with a saved checkpoint:

  python -m ifseg_tpu.cli.validate $data --arch=segofa_base \\
      --num-seg-tokens=150 --category-list='wall, ...' \\
      --restore-file=<orbax dir | ofa_base.pt> [--resnet-iters=25]
"""

import logging
import sys
import time
from typing import List, Optional

import jax

from ifseg_tpu.config import Config, from_flags
from ifseg_tpu.eval.evaluator import Evaluator
from ifseg_tpu.models.segofa import SegOFA
from ifseg_tpu.tasks.segmentation import SegmentationTask
from ifseg_tpu.utils import metrics as metrics_lib

logger = logging.getLogger("ifseg_tpu.validate")


def main(cfg: Config) -> dict:
    logging.basicConfig(level=logging.INFO, stream=sys.stdout)
    from ifseg_tpu.utils.profiling import enable_persistent_jit_cache

    enable_persistent_jit_cache()
    task = SegmentationTask.setup_task(cfg)
    ds = task.load_dataset("valid")

    from ifseg_tpu.cli.infer import load_params

    params = load_params(cfg.checkpoint.restore_file, cfg)
    model = SegOFA(cfg.model)
    evaluator = Evaluator(cfg, model)

    metrics_lib.reset_meters("validate")
    with metrics_lib.aggregate("validate", new_root=True) as agg:
        t0 = time.time()
        # batched + pipelined exactly like the train loop's validation
        # (--batch-size-valid groups same-bucket rows into one padded
        # forward; host decode overlaps device compute)
        logs = evaluator.eval_dataset(
            params, ds, batch_size=max(cfg.optimization.batch_size_valid, 1)
        )
        task.reduce_metrics(logs)
        vals = agg.get_smoothed_values()
        vals["num_images"] = len(ds)
        vals["sec"] = round(time.time() - t0, 1)
    logger.info("validate: %s", " | ".join(f"{k} {v}" for k, v in vals.items()))
    return vals


def cli_main(argv: Optional[List[str]] = None) -> None:
    cfg = from_flags(argv if argv is not None else sys.argv[1:])
    main(cfg)


if __name__ == "__main__":
    cli_main()
