"""Component profile of the serving inference path at bench shapes."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from ifseg_tpu.config import model_config_for_arch
from ifseg_tpu.eval.serving import SegServer, forward_served
from ifseg_tpu.models.segofa import SegOFAVariables

cfg = model_config_for_arch("segofa_base")
model, params = SegOFAVariables.init(cfg, jax.random.PRNGKey(0))

batch = 32
s = cfg.patch_image_size
rng = np.random.default_rng(0)
src = jnp.asarray(rng.integers(4, 100, size=(batch, 32)), jnp.int32)
img = jnp.asarray(rng.normal(size=(batch, s, s, 3)), jnp.float32)
bos = jnp.zeros((batch, 1), jnp.int32)

server = SegServer(model, params, src_len=32)
pre = server.pre


def timeit(name, fn, *args, iters=16):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[0], out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[0], out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt*1e3:8.2f} ms  ({batch/dt:7.1f} img/s)")
    return dt


# full path
@jax.jit
def full(p, pre, src, img, bos):
    logits = forward_served(model, p, pre, src, img, bos)
    return jnp.sum(jnp.argmax(logits, axis=-1))

t_full = timeit("full serve fwd", full, params, pre, src, img, bos)


# resnet stem only
@jax.jit
def stem(p, img):
    def f(m):
        return m.encoder.embed_images(img.astype(jnp.bfloat16))
    return model.apply({"params": p}, method=f).sum()

t_stem = timeit("resnet stem", stem, params, img)


# encoder served only
@jax.jit
def enc_only(p, pre, src, img):
    def f(m):
        return m.encoder.encode_served(src, img, pre["enc"])["encoder_out"]
    return model.apply({"params": p}, method=f).sum()

t_enc = timeit("encoder served (incl stem)", enc_only, params, pre, src, img)


# decoder only (fake enc_out)
enc_out_shape = None
@jax.jit
def enc_out_fn(p, pre, src, img):
    def f(m):
        return m.encoder.encode_served(src, img, pre["enc"])
    return model.apply({"params": p}, method=f)

eo = jax.block_until_ready(enc_out_fn(params, pre, src, img))
eo = dict(eo)
eo.pop("image_embed_shape", None)

@jax.jit
def dec_only(p, pre, bos, eo):
    def f(m):
        eo2 = dict(eo)
        eo2["image_embed_shape"] = (s // 16, s // 16)  # static via closure
        return m.decoder.decode_served(bos, eo2, pre["dec"])
    return model.apply({"params": p}, method=f).sum()

t_dec = timeit("decoder served", dec_only, params, pre, bos, eo)

print(f"\nstem {t_stem*1e3:.1f} + enc-layers {(t_enc-t_stem)*1e3:.1f} + dec {t_dec*1e3:.1f} "
      f"= {(t_enc+t_dec)*1e3:.1f} vs full {t_full*1e3:.1f} ms")
