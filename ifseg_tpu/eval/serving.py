"""Fixed-shape serving: precompute every batch-independent tensor once.

All of SegOFA's attention biases and position embeddings depend only on the
parameters and the (static) input shape — none on the batch.  A serving
deployment therefore computes them ONCE per checkpoint (``precompute``) and
runs a lean per-request forward (``make_forward``) that skips the gathers,
bias interpolations, and q·k position einsums entirely.

    server = SegServer(model, params, src_len=32)
    logits = server(src_tokens, images, bos)   # (B, 1+hw, C)
"""

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ifseg_tpu.models.segofa import SegOFA


def precompute(model: SegOFA, params, src_len: int) -> Dict[str, Any]:
    s = model.cfg.patch_image_size // 16

    def pre_fn(m: SegOFA):
        enc = m.encoder.precompute_biases(src_len, (s, s))
        dec = m.decoder.precompute_biases(enc["pos_all"], (s, s))
        return {"enc": enc, "dec": dec}

    return jax.jit(
        lambda p: model.apply({"params": p}, method=pre_fn)
    )(params)


def forward_served(model: SegOFA, params, pre, src_tokens, patch_images, bos_tokens):
    def fwd(m: SegOFA, src, img, bos):
        enc_out = m.encoder.encode_served(src, img, pre["enc"])
        return m.decoder.decode_served(bos, enc_out, pre["dec"])

    return model.apply({"params": params}, src_tokens, patch_images, bos_tokens, method=fwd)


class SegServer:
    """Holds a jitted lean forward with the bias pack baked in as inputs."""

    def __init__(self, model: SegOFA, params, src_len: int):
        self.model = model
        self.params = params
        self.pre = precompute(model, params, src_len)
        self._fn = jax.jit(
            lambda p, pre, src, img, bos: forward_served(
                model, p, pre, src, img, bos
            )
        )

    def __call__(self, src_tokens, patch_images, bos_tokens):
        return self._fn(self.params, self.pre, src_tokens, patch_images, bos_tokens)
