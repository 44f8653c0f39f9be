"""A/B the --quantize=int8 serving path against the standard served forward.

Measures throughput (img/s) and per-pixel argmax agreement of weight-only
int8 serving (eval/serving.py SegServer, reference analog:
quantize_model_scalar, quantization_utils.py:15) vs the unquantized path
(bf16 compute over fp32 weights — params are always fp32, config.py; bf16
is only the compute dtype, so the baseline streams fp32 bytes from HBM) on
whatever device `jax.devices()[0]` is.

By default the model is randomly initialized (throughput and weight-bytes
are weight-value-independent; the argmax agreement then characterizes
near-zero-margin logits, a pessimistic bound).  Pass --checkpoint to measure
agreement on trained weights (.pt reference checkpoint or an orbax dir,
via cli/infer.py:load_params).  Prints one summary line per mode and a final
agreement line — quoted in README's serving section.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_tpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from ifseg_tpu.config import Config, model_config_for_arch
from ifseg_tpu.eval.serving import SegServer
from ifseg_tpu.models.segofa import SegOFAVariables


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=int(os.environ.get("BATCH", "32")))
    p.add_argument("--arch", default="segofa_base")
    p.add_argument(
        "--checkpoint",
        default=None,
        help="optional trained weights (.pt or orbax dir); default random init",
    )
    args = p.parse_args()

    batch = args.batch
    cfg = model_config_for_arch(args.arch)
    model, params = SegOFAVariables.init(cfg, jax.random.PRNGKey(0))
    weights = "random-init"
    if args.checkpoint:
        from ifseg_tpu.cli.infer import load_params

        params = load_params(args.checkpoint, Config().replace(model=cfg))
        weights = args.checkpoint
    s = cfg.patch_image_size
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(4, 100, size=(batch, 32)), jnp.int32)
    img = jnp.asarray(rng.normal(size=(batch, s, s, 3)), jnp.float32)
    bos = jnp.zeros((batch, 1), jnp.int32)

    print(f"weights: {weights}")
    results = {}
    # sync methodology = bench.py's: reduce to ONE scalar on device (its own
    # tiny jitted program, so the serving graph is not re-inlined) and read
    # it back — block_until_ready can return early through the axon relay,
    # and a full-logits readback would bill D2H to the step
    reduce_sync = jax.jit(lambda o: jnp.sum(jnp.argmax(o, -1)))

    for mode in ("none", "int8"):
        server = SegServer(model, params, src_len=32, quantize=mode)
        out = server(src, img, bos)  # full logits, for the agreement check
        float(reduce_sync(out))
        float(reduce_sync(server(src, img, bos)))
        iters = 16
        t0 = time.perf_counter()
        for _ in range(iters):
            o = server(src, img, bos)
        float(reduce_sync(o))
        dt = (time.perf_counter() - t0) / iters
        results[mode] = (dt, np.asarray(out))
        # the baseline keeps fp32 weight buffers (compute casts to bf16);
        # int8 shrinks what HBM actually streams per step
        label = "fp32" if mode == "none" else "int8"
        extra = ""
        if mode == "int8":
            r = server.quant_report
            extra = (
                f"  weights {r['bytes_fp32']/2**20:.0f} MiB fp32 -> "
                f"{r['bytes_quant']/2**20:.0f} MiB "
                f"({r['quantized']} quantized, {r['kept']} kept)"
            )
        print(f"serve {label:5s} batch {batch}: {dt*1e3:7.2f} ms/step  "
              f"({batch/dt:7.1f} img/s){extra}")

    ref, q = results["none"][1], results["int8"][1]
    agree = (ref.argmax(-1) == q.argmax(-1)).mean()
    print(f"argmax agreement int8 vs fp32-weights ({weights}): {agree:.6f}")


if __name__ == "__main__":
    main()
