"""A/B the --quantize=int8 serving path against bf16 at bench shapes.

Measures throughput (img/s) and per-pixel argmax agreement of weight-only
int8 serving (eval/serving.py SegServer, reference analog:
quantization_utils.py:143 scalar path) vs the standard served forward, on
whatever device `jax.devices()[0]` is.  Prints one summary line per mode and
a final agreement line — the numbers quoted in README's serving section.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from ifseg_tpu.config import model_config_for_arch
from ifseg_tpu.eval.serving import SegServer
from ifseg_tpu.models.segofa import SegOFAVariables


def main():
    batch = int(os.environ.get("BATCH", "32"))
    cfg = model_config_for_arch("segofa_base")
    model, params = SegOFAVariables.init(cfg, jax.random.PRNGKey(0))
    s = cfg.patch_image_size
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(4, 100, size=(batch, 32)), jnp.int32)
    img = jnp.asarray(rng.normal(size=(batch, s, s, 3)), jnp.float32)
    bos = jnp.zeros((batch, 1), jnp.int32)

    results = {}
    for mode in ("none", "int8"):
        server = SegServer(model, params, src_len=32, quantize=mode)
        out = server(src, img, bos)
        jax.block_until_ready(out)
        iters = 16
        t0 = time.perf_counter()
        for _ in range(iters):
            out = server(src, img, bos)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        results[mode] = (dt, np.asarray(out))
        label = "bf16" if mode == "none" else "int8"
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
    print(f"argmax agreement int8 vs bf16: {agree:.6f}")


if __name__ == "__main__":
    main()
