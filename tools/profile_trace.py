"""Capture + summarize a device trace of the serving forward.

Usage (on TPU):
  python tools/profile_trace.py            # traces 4 serving steps
  python tools/profile_trace.py --train    # traces 3 train steps

Prints per-op-group ms/step (fusion names grouped by prefix), the view that
drove the round-2 optimization work (README performance notes).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import collections
import glob
import gzip
import json
import re
import sys


def summarize(trace_dir: str, iters: int):
    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    durs = collections.Counter()
    cnt = collections.Counter()
    skip = ("jit_", "PjitFunction", "np.asarray", "$", "trace")
    for e in data["traceEvents"]:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        n = e["name"]
        if any(s in n for s in skip):
            continue
        base = re.sub(r"\.\d+$", "", n)
        durs[base] += e["dur"]
        cnt[base] += 1
    print(f"sum of leaf ops: {sum(durs.values()) / iters / 1e3:.1f} ms/step")
    for name, d in durs.most_common(20):
        print(f"{d/iters/1e3:8.2f} ms/step  x{cnt[name]//iters:4d}  {name[:90]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train", action="store_true")
    p.add_argument("--out", default="/tmp/ifseg_trace")
    args = p.parse_args()

    import jax
    import numpy as np

    if args.train:
        import runpy

        src = open("tools/profile_train_step.py").read().split("iters = 10")[0]
        g = {"__file__": os.path.abspath("tools/profile_train_step.py")}
        exec(src, g)
        with jax.profiler.trace(args.out):
            for _ in range(3):
                logs = g["trainer"].train_step(g["batch"])
            float(np.asarray(logs["loss"]))
        summarize(args.out, 3)
        return

    import jax.numpy as jnp

    from ifseg_tpu.config import model_config_for_arch
    from ifseg_tpu.eval.serving import SegServer, forward_served
    from ifseg_tpu.models.segofa import SegOFAVariables

    cfg = model_config_for_arch("segofa_base")
    model, params = SegOFAVariables.init(cfg, jax.random.PRNGKey(0))
    batch, s = 32, cfg.patch_image_size
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(4, 100, size=(batch, 32)), jnp.int32)
    img = jnp.asarray(rng.normal(size=(batch, s, s, 3)), jnp.float32)
    bos = jnp.zeros((batch, 1), jnp.int32)
    server = SegServer(model, params, src_len=32)

    @jax.jit
    def fwd(p, pre, src, img, bos):
        logits = forward_served(model, p, pre, src, img, bos)
        return jnp.sum(jnp.argmax(logits, axis=-1))

    float(fwd(params, server.pre, src, img, bos))
    float(fwd(params, server.pre, src, img, bos))
    with jax.profiler.trace(args.out):
        for _ in range(4):
            out = fwd(params, server.pre, src, img, bos)
        float(out)
    summarize(args.out, 4)


if __name__ == "__main__":
    sys.exit(main())
