"""Training entry point (mirrors the reference train.py, forked fairseq_cli).

Flow (ref train.py:51-256):
  setup task -> build trainer -> restore checkpoint (with torch-checkpoint
  translation for --restore-file=ofa_*.pt) -> epoch loop:
  train epoch -> validate_and_save (best-mIoU checkpointing + early stop).

Flags use the reference names (config.from_flags), so the reference run
scripts translate 1:1:

    python -m ifseg_tpu.cli.train $data --arch=segofa_base \\
        --num-seg-tokens=150 --category-list='wall, building, ...' ...
"""

import logging
import math
import os
import sys
import time
from typing import List, Optional

import jax
import numpy as np

from ifseg_tpu.config import Config, from_flags
from ifseg_tpu.parallel.mesh import mesh_from_config, initialize_distributed
from ifseg_tpu.tasks.segmentation import SegmentationTask
from ifseg_tpu.train.trainer import Trainer
from ifseg_tpu.utils import metrics as metrics_lib
from ifseg_tpu.utils.progress import progress_bar

logger = logging.getLogger("ifseg_tpu.train")


def main(cfg: Config) -> None:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
        stream=sys.stdout,
    )
    from ifseg_tpu.utils.profiling import enable_persistent_jit_cache

    enable_persistent_jit_cache()
    initialize_distributed(
        cfg.distributed.coordinator_address,
        cfg.distributed.num_processes,
        cfg.distributed.process_id,
    )
    # the 'model' axis serves TP / PP / CP / EP per the distributed flags
    # (parallel/mesh.py model_axis_size)
    mesh = mesh_from_config(cfg.distributed)
    logger.info("mesh: %s over %d devices", dict(mesh.shape), len(jax.devices()))

    # image-free fast path: with no real-batch monitoring, the step consumes
    # only the synthetic grid — skip real image decode + augs on the host
    # (the pipeline cost per row collapses ~50x; see
    # tools/bench_input_pipeline.py --image-free)
    if (
        cfg.criterion.unsupervised_segmentation
        and not cfg.criterion.monitor_real_batch
        and cfg.task.artificial_image_type.startswith("rand_k")
    ):
        cfg.task.decode_real_images = False
        logger.info(
            "image-free fast path: real images are never decoded "
            "(--monitor-real-batch=true to restore the monitoring forward)"
        )

    task = SegmentationTask.setup_task(cfg)
    train_ds = task.load_dataset("train", epoch=1)
    task.load_dataset("valid")

    # total updates for the cosine schedule (ref train.py:176-184)
    global_batch = cfg.optimization.batch_size * max(cfg.optimization.update_freq, 1)
    iters_per_epoch = len(train_ds) * jax.process_count() // global_batch
    total_updates = cfg.optimization.max_epoch * max(iters_per_epoch, 1)
    logger.info("iters/epoch %d, total updates %d", iters_per_epoch, total_updates)

    ds = task.datasets["train"]
    trainer = Trainer(
        cfg,
        mesh,
        class_tokens=ds.class_tokens,
        class_lengths=ds.class_lengths,
        total_num_updates=total_updates,
    )

    params = maybe_restore_pretrained(cfg, trainer)
    trainer.init_state(params)

    from ifseg_tpu.checkpoint.manager import CheckpointManager
    from ifseg_tpu.eval.evaluator import Evaluator

    ckpt = CheckpointManager(cfg.checkpoint)
    start_epoch, resume_iter = restore_training_state(cfg, trainer, ckpt)
    evaluator = Evaluator(cfg, trainer.model, trainer.mesh)

    plateau = None
    if cfg.optimization.lr_scheduler == "reduce_lr_on_plateau":
        from ifseg_tpu.train.optim import ReduceLROnPlateau

        plateau = ReduceLROnPlateau(
            shrink=cfg.optimization.lr_shrink,
            patience=cfg.optimization.lr_patience,
            maximize=cfg.checkpoint.maximize_best_checkpoint_metric,
        )

    # early stop state (ref train.py should_stop_early :207-233): consecutive
    # validations without a best-metric improvement
    es_best: Optional[float] = None
    es_bad = 0
    train_start = time.time()
    for epoch in range(start_epoch, cfg.optimization.max_epoch + 1):
        hard_stop = train_epoch(
            cfg, task, trainer, epoch, ckpt=ckpt,
            resume_iter=resume_iter if epoch == start_epoch else None,
            train_start=train_start,
        )
        try:  # runbook observability: high-water HBM after a full epoch
            stats = jax.devices()[0].memory_stats() or {}
            peak = stats.get("peak_bytes_in_use")
            if peak:
                logger.info("peak HBM: %.2f GB", peak / 1e9)
        except Exception:
            pass
        metric = None
        if epoch % max(cfg.checkpoint.validate_interval, 1) == 0 or hard_stop:
            val = validate(cfg, task, trainer, epoch, evaluator)
            metric = val.get(cfg.checkpoint.best_checkpoint_metric)
        if plateau is not None and metric is not None:
            scale = plateau.step(float(metric))
            trainer.set_lr_scale(scale)
            logger.info("plateau lr scale: %s", scale)
        if epoch % cfg.checkpoint.save_interval == 0 or hard_stop:
            ckpt.save(
                epoch,
                trainer.state,
                extra={"epoch": epoch, "metrics": metrics_lib.state_dict()},
                val_metric=metric,
            )
        if hard_stop:
            logger.info("stopping: %s", hard_stop)
            break
        # patience: skip the check when no validation ran this epoch
        if cfg.checkpoint.patience > 0 and metric is not None:
            better = es_best is None or (
                float(metric) > es_best
                if cfg.checkpoint.maximize_best_checkpoint_metric
                else float(metric) < es_best
            )
            if better:
                es_best, es_bad = float(metric), 0
            else:
                es_bad += 1
                if es_bad >= cfg.checkpoint.patience:
                    logger.info(
                        "early stop: %s has not improved for %d validations",
                        cfg.checkpoint.best_checkpoint_metric, es_bad,
                    )
                    break
    ckpt.finalize()  # commit any in-flight async checkpoint write
    logger.info("done training; best %s=%s", cfg.checkpoint.best_checkpoint_metric,
                ckpt.manifest.get("best_metric"))


def maybe_restore_pretrained(cfg: Config, trainer: Trainer):
    """--restore-file=ofa_base.pt — torch checkpoint translation
    (SURVEY.md §7 step 4).  --finetune-from-model=path starts a FRESH run
    (optimizer/dataloader/meters reset) from pretrained weights and must not
    be combined with the reset flags (ref utils/checkpoint_utils.py:205-229)."""
    finetune = getattr(cfg.checkpoint, "finetune_from_model", "")
    if finetune:
        if (
            cfg.checkpoint.reset_optimizer
            or cfg.checkpoint.reset_dataloader
            or cfg.checkpoint.reset_meters
        ):
            raise ValueError(
                "--finetune-from-model can not be set together with "
                "--reset-optimizer/--reset-dataloader/--reset-meters"
            )
        path = finetune
    else:
        path = cfg.checkpoint.restore_file
    if path and not os.path.exists(path) and cfg.checkpoint.dry_weights:
        # loader smoke without real weights (VERDICT runbook): fabricate an
        # ofa_base-shaped .pt and fall through to the full torch loader
        from ifseg_tpu.checkpoint.convert import fabricate_ofa_base_checkpoint

        fabricate_ofa_base_checkpoint(path, cfg.model)
    if not path or not os.path.exists(path):
        if path:
            logger.warning("restore file %s not found; training from scratch", path)
        return None
    def maybe_prune(params):
        ek = cfg.model.encoder_layers_to_keep
        dk = cfg.model.decoder_layers_to_keep
        if ek or dk:
            from ifseg_tpu.checkpoint.convert import prune_layers

            logger.info(
                "pruning checkpoint layers (encoder keep=%s, decoder keep=%s)",
                ek or "all", dk or "all",
            )
            params = prune_layers(params, ek or None, dk or None)
        return params

    if path.endswith(".pt"):
        from ifseg_tpu.checkpoint.convert import (
            _reconcile,
            convert_torch_state_dict,
            load_torch_checkpoint,
        )
        from ifseg_tpu.models.segofa import SegOFAVariables

        logger.info("translating torch checkpoint %s", path)
        _, fresh = SegOFAVariables.init(cfg.model, jax.random.PRNGKey(0))
        sd = load_torch_checkpoint(path)
        # prune BEFORE reconciling so a shallower cfg.model matches the
        # renumbered layers rather than back-filling them with fresh values
        tree = convert_torch_state_dict(sd, cfg.model.vocab_size)
        return _reconcile(maybe_prune(tree), fresh)
    if os.path.isdir(path):  # orbax checkpoint directory (params only)
        from ifseg_tpu.cli.infer import load_params

        logger.info("restoring params from orbax checkpoint %s", path)
        return maybe_prune(load_params(path, cfg))
    raise ValueError(f"unsupported restore file {path}")


def restore_training_state(cfg, trainer, ckpt):
    """-> (start_epoch, resume_iter_state or None).  A mid-epoch checkpoint
    (--save-interval-updates) carries the train-iterator cursor in its extra
    and resumes INSIDE its epoch (ref trainer.py:383-442 itr_state).

    --reset-optimizer restores the MODEL weights (and EMA shadow) but keeps
    the fresh optimizer state and step counter; --reset-dataloader restarts
    at epoch 1; --reset-meters drops the metrics state (each independent,
    ref utils/checkpoint_utils.py:191-295)."""
    last = ckpt.latest()
    if last is None:
        return 1, None
    ck = cfg.checkpoint
    loaded = ckpt.load(last, trainer.state)
    extra = ckpt.load_extra(last)
    if ck.reset_optimizer:
        trainer.state = trainer.state.replace(
            params=loaded.params, ema_params=loaded.ema_params
        )
    else:
        trainer.state = loaded
    if extra.get("metrics") and not ck.reset_meters:
        try:
            metrics_lib.load_state_dict(extra["metrics"])
        except Exception:
            logger.warning("could not restore metrics state; resetting")
    if ck.reset_dataloader:
        return 1, None
    it_state = extra.get("iterator")
    if it_state:
        epoch = int(extra.get("epoch", 1))
        logger.info(
            "resuming mid-epoch: epoch %d, %d iterations consumed",
            epoch, it_state.get("iterations_in_epoch", 0),
        )
        return epoch, it_state
    return int(extra.get("epoch", 0)) + 1, None


def train_epoch(
    cfg, task, trainer, epoch: int, ckpt=None, resume_iter=None,
    train_start: Optional[float] = None,
) -> Optional[str]:
    """Run one epoch; returns a stop reason when --max-update or
    --stop-time-hours fired mid-epoch (ref train.py:344-365), else None."""
    if epoch > 1:
        task.load_dataset("train", epoch=epoch)
    # each process iterates its OWN TSV slice (file_dataset.py process
    # sharding) and loads global_batch/nproc rows per step; the trainer
    # assembles the global batch array from the per-process rows
    # (trainer._batch_to_arrays make_array_from_process_local_data)
    global_batch = cfg.optimization.batch_size * max(cfg.optimization.update_freq, 1)
    from ifseg_tpu.parallel.mesh import local_batch_slice

    itr = task.get_batch_iterator(
        "train",
        batch_size=local_batch_slice(global_batch, trainer.mesh),
        seed=cfg.optimization.seed,
        epoch=epoch,
    )
    base_iter = 0
    if resume_iter:
        itr.load_state_dict(resume_iter)
        base_iter = itr.iterations_in_epoch
    from ifseg_tpu.utils.profiling import StepTimer, span
    from ifseg_tpu.utils.reliability import (
        Heartbeat,
        check_grad_norms,
        check_param_sync,
    )

    logs_buffer = []
    consecutive_nonfinite = 0
    stop_reason = None
    timer = StepTimer()
    heartbeat = Heartbeat(timeout=float(os.environ.get("IFSEG_HEARTBEAT", "600"))).start()
    with metrics_lib.aggregate(f"train_epoch") as agg:
        progress = progress_bar(
            itr.next_epoch_itr(),
            total=len(itr),
            epoch=epoch,
            log_interval=cfg.common.log_interval,
            tag="train",
            tensorboard_logdir=cfg.common.tensorboard_logdir,
            wandb_project=cfg.common.wandb_project,
        )
        # one-batch device prefetch: the host->device upload of batch i+1
        # overlaps step i's compute (device_put is async)
        batch_iter = iter(progress)
        # data-stall accounting: time spent waiting on the host pipeline
        # (TSV -> augs -> collate -> upload).  With the prefetch thread ahead
        # of the device this is ~0; sustained waits mean the input pipeline
        # can't feed the step (the reference's BufferedIterator has no such
        # counter — stalls there are invisible, iterators.py:551-641)
        data_wait = 0.0
        data_stalls = 0
        assembly_time = 0.0
        step_time_ema = 0.0  # recent device step time; sets the stall bar

        def fetch():
            # Two separately-timed spans: the ITERATOR wait (host pipeline:
            # TSV -> augs -> collate; a stall here means data can't keep up)
            # vs BATCH ASSEMBLY (prepare_batch: global-array construction +
            # async upload — step work, never a "data stall"; under
            # multi-process it includes make_array_from_process_local_data).
            # A stall is an iterator wait that is material next to the step
            # itself (>5% of the recent step time), not a fixed 5 ms.
            nonlocal data_wait, data_stalls, assembly_time
            t0 = time.perf_counter()
            try:
                raw = next(batch_iter)
            except StopIteration:
                return None
            w = time.perf_counter() - t0
            data_wait += w
            if w > max(0.05 * step_time_ema, 0.001):
                data_stalls += 1
            t1 = time.perf_counter()
            out = trainer.prepare_batch(raw)
            assembly_time += time.perf_counter() - t1
            return out

        pending = fetch()
        # Multi-process: AOT-compile the step, rendezvous at a coordination
        # barrier, THEN execute.  Compile skew between hosts can be minutes
        # (and one-sided: the shared compile cache lets the second host race
        # ahead), while the Gloo communicator init fired by the first
        # collective execution has a hard 30 s key-value window.  The
        # reference's analog is its NCCL init retry + dummy all-reduce
        # (distributed/utils.py:262-294).
        if (
            jax.process_count() > 1
            and pending is not None
            and not getattr(trainer, "_mp_step_synced", False)
        ):
            from ifseg_tpu.parallel.mesh import coordination_barrier

            trainer.compile_train_step(pending)
            coordination_barrier("cli_train_step_compiled")
            trainer._mp_step_synced = True
        i = -1
        # seed with the restored counter so a resume (or an immediate skip
        # streak) never re-saves the checkpoint it just loaded
        last_interval_save = trainer.get_num_updates()
        while pending is not None:
            i += 1
            current, pending = pending, fetch()
            t_step = time.perf_counter()
            with timer, span(f"train_step-{i}"):
                logs = trainer.train_step(current)
            # dispatch wall time; in steady state the device's backpressure
            # makes this track the real step time, which is what the stall
            # threshold should scale with
            dt = time.perf_counter() - t_step
            step_time_ema = dt if step_time_ema == 0.0 else (
                0.9 * step_time_ema + 0.1 * dt
            )
            heartbeat.beat()
            siu = cfg.checkpoint.save_interval_updates
            num_updates = trainer.get_num_updates()
            # the update counter does not advance on non-finite-grad skips;
            # gate on it having moved past the last interval save so a skip
            # streak doesn't rewrite the same checkpoint every batch
            if (
                ckpt is not None and siu > 0 and num_updates % siu == 0
                and num_updates > last_interval_save
            ):
                last_interval_save = num_updates
                # mid-epoch checkpoint with the iterator cursor: i+1 batches
                # of THIS session consumed, plus any restored offset (the
                # device prefetch reads one batch ahead, so itr's own count
                # would over-report by one)
                ckpt.save(
                    epoch,
                    trainer.state,
                    extra={
                        "epoch": epoch,
                        "iterator": {
                            "epoch": epoch,
                            "iterations_in_epoch": base_iter + i + 1,
                            "seed": cfg.optimization.seed,
                        },
                        "metrics": metrics_lib.state_dict(),
                    },
                    updates=trainer.get_num_updates(),
                )
            # keep logs as device arrays: a device_get here would sync every
            # step and serialize upload -> compute -> readback
            logs_buffer.append(logs)
            mu = cfg.optimization.max_update
            if mu > 0 and num_updates >= mu:
                stop_reason = f"num_updates {num_updates} >= max_update {mu}"
                break
            sth = cfg.optimization.stop_time_hours
            if (
                sth > 0 and train_start is not None
                and (time.time() - train_start) / 3600.0 > sth
            ):
                stop_reason = f"training time exceeded stop_time_hours {sth}"
                break
            if (i + 1) % cfg.common.log_interval == 0:
                host_logs = [jax.device_get(l) for l in logs_buffer]
                task.reduce_metrics(host_logs)
                logs_buffer.clear()
                metrics_lib.log_scalar(
                    "data_wait_ms",
                    1e3 * data_wait / max(len(host_logs), 1), round=2,
                )
                metrics_lib.log_scalar(
                    "batch_assembly_ms",
                    1e3 * assembly_time / max(len(host_logs), 1), round=2,
                )
                metrics_lib.log_scalar_sum("data_stalls", data_stalls)
                data_wait, data_stalls, assembly_time = 0.0, 0, 0.0
                progress.log(agg.get_smoothed_values(), step=trainer.get_num_updates())
                # sanitizers at log cadence (the reference runs its grad-norm
                # cross-rank check every step, trainer.py:1408-1445; here the
                # in-step NaN-skip handles recovery and these catch desync /
                # persistent divergence as hard errors)
                nonfinite = sum(float(l.get("n_nonfinite", 0)) for l in host_logs)
                if nonfinite >= len(host_logs):
                    consecutive_nonfinite += int(nonfinite)
                else:
                    consecutive_nonfinite = 0
                if (
                    cfg.common.max_consecutive_nonfinite > 0
                    and consecutive_nonfinite >= cfg.common.max_consecutive_nonfinite
                ):
                    raise FloatingPointError(
                        f"gradients non-finite for {consecutive_nonfinite} "
                        "consecutive updates — aborting (NanDetector analog)"
                    )
                if cfg.common.check_grad_consistency and not check_grad_norms(
                    float(host_logs[-1]["gnorm"])
                ):
                    raise RuntimeError(
                        "grad norms inconsistent across hosts — replicas "
                        "desynced (trainer.py:1408-1445 analog)"
                    )
                psi = cfg.common.check_param_sync_interval
                if psi > 0 and trainer.get_num_updates() % psi == 0:
                    if not check_param_sync(trainer.state.params):
                        raise RuntimeError(
                            "parameter fingerprints diverged across hosts"
                        )
        if logs_buffer:
            task.reduce_metrics([jax.device_get(l) for l in logs_buffer])
        progress.print(agg.get_smoothed_values(), tag="train", step=trainer.get_num_updates())
    heartbeat.stop()
    metrics_lib.reset_meters("train_epoch")
    return stop_reason


def validate(cfg, task, trainer, epoch: int, evaluator) -> dict:
    """Native-resolution eval over the valid TSV (ref train.py:434-516)."""
    ds = task.datasets["valid"]
    # fresh meters per validation: the aggregator is keyed by name, and
    # without a reset the per-class areas would accumulate across epochs
    metrics_lib.reset_meters("valid")
    with metrics_lib.aggregate("valid", new_root=True) as agg:
        t0 = time.time()
        n = len(ds)
        # batched + pipelined: same-shape samples share one padded forward
        # (--batch-size-valid), host prep overlaps device compute, and the
        # device->host readback happens once at the end
        # --uses-ema: validate (and therefore select best checkpoints) with
        # the EMA shadow weights, like the reference criterion's ema_model
        # path (trainer.py:757-759, models/ema)
        eval_params = trainer.state.params
        if cfg.task.uses_ema and trainer.state.ema_params is not None:
            eval_params = trainer.state.ema_params
        if jax.process_count() > 1:
            # eval opens with _localize_params — a fresh all-gather program
            # whose Gloo init has the 30 s window; enter it together.
            # Barrier keys must be unique per wait -> tag with the epoch.
            from ifseg_tpu.parallel.mesh import coordination_barrier

            coordination_barrier(f"validate_start_epoch{epoch}")
        logs = evaluator.eval_dataset(
            eval_params, ds,
            batch_size=max(cfg.optimization.batch_size_valid, 1),
        )
        # each process evaluated its row shard; sum areas across hosts
        # (reference fast-stat-sync, trainer.py:1368-1407)
        if logs and jax.process_count() > 1:
            summed = metrics_lib.cross_process_sum(
                {k: sum(np.asarray(l[k]) for l in logs) for k in logs[0]}
            )
            logs = [summed]
        task.reduce_metrics(logs)
        vals = agg.get_smoothed_values()
        vals["num_images"] = n
        vals["sec"] = round(time.time() - t0, 1)
    logger.info("valid epoch %d: %s", epoch, _fmt(vals))
    return vals


def _fmt(vals: dict) -> str:
    return " | ".join(f"{k} {v}" for k, v in vals.items())


def cli_main(argv: Optional[List[str]] = None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    cfg = from_flags(argv)
    main(cfg)


if __name__ == "__main__":
    cli_main()
