"""Multi-process spawn worker (driven by tests/test_multiprocess.py).

The JAX analog of the reference's spawn-tested distributed runtime
(custom_fairseq/tests/distributed/utils.py:12-37 spawn_and_init with a
file/TCP rendezvous): N real OS processes, each owning 2 virtual CPU devices,
joined into ONE global mesh via ``jax.distributed.initialize`` with gloo
cross-process collectives.  Exercises the full multi-host contract:

  - per-process data: each process builds only its ``local_batch_slice`` rows
    and the trainer assembles the global batch
    (``jax.make_array_from_process_local_data``)
  - train steps on a dp=2 x fsdp=2 global mesh (params fsdp-sharded ACROSS
    the process boundary)
  - checkpoint save (all processes participate in the orbax write) + restore
  - native-resolution evaluation of per-process row shards with the areas
    reduced via ``metrics.cross_process_sum`` (process_allgather)
  - sanitizers: check_grad_norms / check_param_sync across hosts

Run modes (argv): <process_id> <num_processes> <port> <outdir>
  num_processes=1 -> "golden" single-process run over 4 local devices with
  the FULL global batch; its losses are the ground truth the multi-process
  run must reproduce.
"""

import json
import os
import sys


def tiny_config(outdir: str):
    from ifseg_tpu.config import Config, model_config_for_arch

    cfg = Config()
    model = model_config_for_arch(
        "segofa_tiny",
        dtype="bfloat16",
        encoder_embed_dim=32,
        encoder_ffn_embed_dim=64,
        encoder_layers=2,
        encoder_attention_heads=4,
        decoder_embed_dim=32,
        decoder_ffn_embed_dim=64,
        decoder_layers=2,
        decoder_attention_heads=4,
        resnet_type="resnet50",
        patch_image_size=64,
        orig_patch_image_size=64,
        num_seg_tokens=5,
        dropout=0.0,
        encoder_drop_path_rate=0.0,
        decoder_drop_path_rate=0.0,
    )
    cfg = cfg.replace(model=model)
    cfg.task.num_seg_tokens = 5
    cfg.task.patch_image_size = 64
    cfg.optimization.lr = 1e-3
    cfg.checkpoint.save_dir = os.path.join(outdir, "ckpt")
    return cfg


def make_global_batch(cfg, b=8, seed=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    s = cfg.model.patch_image_size
    hw16 = (s // 16) ** 2
    num_seg = cfg.model.num_seg_tokens
    return {
        "patch_images": rng.normal(size=(b, s, s, 3)).astype(np.float32),
        "src_tokens": rng.integers(4, 100, size=(b, 12)).astype(np.int32),
        "bos_tokens": np.zeros((b, 1), np.int32),
        "target": rng.integers(0, num_seg, size=(b, s, s)).astype(np.int32),
        "downsampled_target": rng.integers(0, num_seg, size=(b, hw16)).astype(np.int32),
        "aux_grid_ids": rng.integers(0, num_seg, size=(b, hw16)).astype(np.int32),
        "aux_target": rng.integers(0, num_seg, size=(b, s, s)).astype(np.int32),
    }


def make_eval_samples(cfg, n=4, seed=3):
    """Ragged eval rows (two shapes -> same 256-bucket so they batch)."""
    import numpy as np

    from ifseg_tpu.data.segmentation_dataset import EvalSample

    rng = np.random.default_rng(seed)
    num_seg = cfg.model.num_seg_tokens
    samples = []
    for i in range(n):
        h, w = (96, 80) if i % 2 == 0 else (80, 96)
        H, W = h * 2, w * 2
        samples.append(
            EvalSample(
                patch_image=rng.normal(size=(h, w, 3)).astype(np.float32),
                src_tokens=rng.integers(4, 100, size=(12,)).astype(np.int32),
                bos_token=np.zeros((1,), np.int32),
                ori_semantic_seg=rng.integers(0, num_seg, size=(H, W)).astype(np.int32),
                ori_shape=(H, W),
                id=i,
            )
        )
    return samples


class _ListDataset:
    def __init__(self, samples):
        self.samples = samples

    def __len__(self):
        return len(self.samples)

    def get_eval_sample(self, i):
        return self.samples[i]


def main():
    pid, nproc, port, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
    )
    # if the worker wedges (collective rendezvous, barrier, orbax commit),
    # dump every thread's Python stack and die — the spawning test then shows
    # WHERE it hung instead of a silent subprocess.TimeoutExpired
    import faulthandler

    faulthandler.dump_traceback_later(int(os.environ.get("MP_WATCHDOG_S", "780")), exit=True)
    # 1-core-host hardening (same playbook as __graft_entry__._phase_env):
    # cold compiles on a time-shared core can park one device thread in a
    # collective rendezvous far past XLA:CPU's 40 s termination default, and
    # the concurrency-optimized thunk scheduler can order independent
    # collectives differently across devices (cross-resource deadlock).  Must
    # land in XLA_FLAGS before the backend initializes.
    flags = os.environ.get("XLA_FLAGS", "")
    extra = []
    if "collective_call_terminate_timeout" not in flags:
        extra.append("--xla_cpu_collective_call_terminate_timeout_seconds=900")
        extra.append("--xla_cpu_collective_call_warn_stuck_timeout_seconds=120")
    if "concurrency_optimized_scheduler" not in flags:
        extra.append("--xla_cpu_enable_concurrency_optimized_scheduler=false")
    os.environ["XLA_FLAGS"] = (flags + " " + " ".join(extra)).strip()

    import jax

    # the image's sitecustomize registers the axon TPU plugin before this
    # module runs — force CPU via config (env vars alone are ignored then)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4 // nproc)
    # share the test suite's persistent compile cache (concurrent writers are
    # safe: the cache commits entries by atomic rename)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    # two processes' sharded executions time-share one core: async dispatch
    # lets a second execution's device tasks pile onto the pool while the
    # first's are parked in rendezvous waits (circular wait on a starved box)
    jax.config.update("jax_cpu_enable_async_dispatch", False)
    if nproc > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nproc,
            process_id=pid,
        )
    assert jax.device_count() == 4, jax.devices()
    assert jax.local_device_count() == 4 // nproc

    import numpy as np

    from ifseg_tpu.checkpoint.manager import CheckpointManager
    from ifseg_tpu.eval.evaluator import Evaluator
    from ifseg_tpu.parallel.mesh import (
        MeshConfig,
        build_mesh,
        coordination_barrier,
        local_batch_slice,
    )
    from ifseg_tpu.train.trainer import Trainer
    from ifseg_tpu.utils import metrics as metrics_lib
    from ifseg_tpu.utils.reliability import check_grad_norms, check_param_sync

    cfg = tiny_config(outdir)
    mesh = build_mesh(MeshConfig(data_parallel=2, fsdp=2, tensor_parallel=1))
    rng = np.random.default_rng(1)
    tokens = rng.integers(4, 100, size=(6, 3)).astype(np.int32)
    lengths = rng.integers(1, 4, size=(6,)).astype(np.int32)
    trainer = Trainer(cfg, mesh, tokens, lengths, total_num_updates=10)
    trainer.init_state()
    jax.block_until_ready(trainer.state)

    B = 8
    full = make_global_batch(cfg, b=B)
    lb = local_batch_slice(B, mesh)  # == B // nproc
    lo = pid * lb
    local = {k: v[lo : lo + lb] for k, v in full.items()}

    # Gloo communicator init (fired lazily by the FIRST execution of each
    # collective program) has a hard 30 s key-value window; cold compiles on
    # a time-shared core can skew the processes by minutes (and the shared
    # compile cache makes the skew one-sided: the second process gets a warm
    # hit and races ahead).  So: AOT-compile first, rendezvous at a
    # coordination-service barrier (tolerates minutes), THEN execute — every
    # process enters communicator init within milliseconds of its peers.
    trainer.compile_train_step(local)
    coordination_barrier("train_step_compiled")

    result = {"pid": pid, "nproc": nproc}
    losses, gnorm = [], None
    for _ in range(3):
        logs = trainer.train_step(local)
        losses.append(float(np.asarray(jax.device_get(logs["loss"]))))
        gnorm = float(np.asarray(jax.device_get(logs["gnorm"])))
    result["losses"] = losses

    # sanitizers must pass on a healthy run.  Each process_allgather is a new
    # collective program (fresh Gloo clique): rendezvous before its first run.
    coordination_barrier("sanitizers")
    result["grad_norms_consistent"] = bool(check_grad_norms(gnorm))
    result["params_in_sync"] = bool(check_param_sync(trainer.state.params))

    # checkpoint: every process participates in the orbax array write
    ckpt = CheckpointManager(cfg.checkpoint)
    ckpt.save(1, trainer.state, extra={"epoch": 1}, val_metric=0.5)
    ckpt.finalize()
    # coordination-service barrier, NOT sync_global_devices: the latter runs
    # a device all-gather whose Gloo init would re-open the 30 s skew window
    coordination_barrier("ckpt_committed")
    name = ckpt.latest()
    result["ckpt_name"] = name
    restored = ckpt.load(name, trainer.state)
    trainer.state = restored
    result["restored_in_sync"] = bool(check_param_sync(trainer.state.params))
    logs = trainer.train_step(local)
    result["post_restore_loss"] = float(np.asarray(jax.device_get(logs["loss"])))

    # native-res eval over this process's row shard; areas summed across
    # hosts via process_allgather (the reference's fast-stat-sync analog)
    all_samples = make_eval_samples(cfg)
    mine = all_samples[pid::nproc] if nproc > 1 else all_samples
    evaluator = Evaluator(cfg, trainer.model, mesh)
    # eval starts with _localize_params — a fresh all-gather program (new
    # Gloo rendezvous): enter it together
    coordination_barrier("eval_start")
    outs = evaluator.eval_dataset(
        trainer.state.params, _ListDataset(mine), batch_size=2
    )
    area_keys = ["area_intersect", "area_union", "area_label", "area_pred_label"]
    local_sums = {k: sum(np.asarray(o[k]) for o in outs) for k in area_keys}
    # eval is per-process local compute; the area reduction is the next new
    # collective program — rendezvous so its Gloo init sees both processes
    coordination_barrier("eval_reduce")
    reduced = metrics_lib.cross_process_sum(local_sums)
    with np.errstate(invalid="ignore", divide="ignore"):
        iou = np.asarray(reduced["area_intersect"]) / np.asarray(reduced["area_union"])
    result["miou"] = float(np.nanmean(iou))
    result["area_intersect_total"] = float(np.sum(reduced["area_intersect"]))
    result["area_label_total"] = float(np.sum(reduced["area_label"]))

    with open(os.path.join(outdir, f"out_{nproc}proc_{pid}.json"), "w") as fp:
        json.dump(result, fp)
    print(f"worker {pid}/{nproc} done", flush=True)


if __name__ == "__main__":
    main()
