"""Benchmark: 512px OFA-Base segmentation inference throughput (images/sec/chip).

Matches BASELINE.json's headline metric.  The reference publishes no number
(BASELINE.md), so ``vs_baseline`` is reported as null until a reference
measurement exists.

Prints exactly one JSON line:
  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": null}
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from ifseg_tpu.config import model_config_for_arch
    from ifseg_tpu.eval.serving import SegServer
    from ifseg_tpu.models.segofa import SegOFAVariables

    cfg = model_config_for_arch("segofa_base")
    model, params = SegOFAVariables.init(cfg, jax.random.PRNGKey(0))

    batch = 32  # best measured throughput point (bias costs amortize with batch)
    s = cfg.patch_image_size
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(4, 100, size=(batch, 32)), jnp.int32)
    img = jnp.asarray(rng.normal(size=(batch, s, s, 3)), jnp.float32)
    bos = jnp.zeros((batch, 1), jnp.int32)

    # serving fast path: all batch-independent biases precomputed per
    # checkpoint (ifseg_tpu/eval/serving.py); verified to match the standard
    # forward in tests/test_serving.py
    server = SegServer(model, params, src_len=32)

    @jax.jit
    def forward(params, pre, src, img, bos):
        from ifseg_tpu.eval.serving import forward_served

        logits = forward_served(model, params, pre, src, img, bos)
        # scalar result: the end-of-run host readback forces completion of the
        # whole dispatch queue (block_until_ready can return early through
        # remote-execution tunnels; a value transfer cannot)
        return jnp.sum(jnp.argmax(logits, axis=-1))

    # warmup / compile (value readback = hard sync)
    float(forward(params, server.pre, src, img, bos))
    float(forward(params, server.pre, src, img, bos))

    iters = 32
    t0 = time.perf_counter()
    outs = [forward(params, server.pre, src, img, bos) for _ in range(iters)]
    float(outs[-1])
    dt = time.perf_counter() - t0
    ips = batch * iters / dt

    print(
        json.dumps(
            {
                "metric": "segofa_base_512px_inference",
                "value": round(ips, 2),
                "unit": "images/sec/chip",
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # always emit exactly one JSON line for the driver
        print(
            json.dumps(
                {
                    "metric": "segofa_base_512px_inference",
                    "value": 0.0,
                    "unit": "images/sec/chip",
                    "vs_baseline": None,
                    "error": f"{type(e).__name__}: {e}"[:300],
                }
            )
        )
        raise SystemExit(1)
