"""cli_main under N real OS processes (driven by tests/test_multiprocess.py).

The CLI analog of mp_worker.py (VERDICT r4 item 6): instead of driving the
Trainer/Evaluator library surface, this worker runs the REAL training CLI
(ifseg_tpu.cli.train.cli_main) with the multi-process flags the reference's
torch.distributed.launch path exposes (--num-processes/--process-id/
--coordinator-address; ref train.py:518-535 + distributed/utils.py:243-332),
exercising end-to-end: per-process TSV slice feeding (file_dataset sharding +
local_batch_slice), global-batch assembly, the AOT-compile + coordination-
barrier startup, cross_process_sum log reduction, per-process native-res
validation with area reduction, and the all-process orbax checkpoint save.

The global batch equals the epoch row count, so each step's global batch is
the SAME row set (in the same order: contiguous file slices + row_offset rng)
as the single-process golden — losses and valid metrics must reproduce it.

argv: <process_id> <num_processes> <port> <outdir> <tsv>
"""

import os
import sys


def main():
    pid, nproc, port, outdir, tsv = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
        sys.argv[5],
    )
    import faulthandler

    faulthandler.dump_traceback_later(
        int(os.environ.get("MP_WATCHDOG_S", "780")), exit=True
    )
    # 1-core-host hardening — same playbook as mp_worker.py (collective
    # timeouts, deterministic thunk order); must precede backend init
    flags = os.environ.get("XLA_FLAGS", "")
    extra = []
    if "collective_call_terminate_timeout" not in flags:
        extra.append("--xla_cpu_collective_call_terminate_timeout_seconds=900")
        extra.append("--xla_cpu_collective_call_warn_stuck_timeout_seconds=120")
    if "concurrency_optimized_scheduler" not in flags:
        extra.append("--xla_cpu_enable_concurrency_optimized_scheduler=false")
    os.environ["XLA_FLAGS"] = (flags + " " + " ".join(extra)).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4 // nproc)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    jax.config.update("jax_cpu_enable_async_dispatch", False)
    if nproc > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from ifseg_tpu.cli.train import cli_main

    argv = [
        f"{tsv},{tsv}",
        "--arch=segofa_tiny",
        "--encoder-embed-dim=32", "--encoder-ffn-embed-dim=64",
        "--encoder-layers=2", "--encoder-attention-heads=4",
        "--decoder-embed-dim=32", "--decoder-ffn-embed-dim=64",
        "--decoder-layers=2", "--decoder-attention-heads=4",
        "--resnet-type=resnet50",
        "--num-seg-tokens=3", "--category-list=cat, dog, grass",
        "--patch-image-size=32", "--orig-patch-image-size=32",
        # global batch == epoch rows: every step sees the full row set, so
        # batch composition matches the golden regardless of process count
        "--batch-size=8", "--max-epoch=2", "--lr=1e-3",
        "--dropout=0.0", "--encoder-drop-path-rate=0.0",
        "--decoder-drop-path-rate=0.0",
        "--bpe-dir=assets/BPE",
        f"--save-dir={os.path.join(outdir, 'ckpt')}",
        "--log-interval=1",
        "--batch-size-valid=2",
        # 2 dp x 2 fsdp: params sharded across the process boundary
        "--data-parallel=2", "--fsdp=2",
    ]
    if nproc > 1:
        argv += [
            f"--num-processes={nproc}",
            f"--process-id={pid}",
            f"--coordinator-address=localhost:{port}",
        ]
    cli_main(argv)


if __name__ == "__main__":
    main()
