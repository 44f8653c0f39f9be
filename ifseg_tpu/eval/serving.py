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
    """Holds a jitted lean forward with the bias pack baked in as inputs.

    ``quantize="int8"`` serves WEIGHT-ONLY int8 (per-channel absmax scales,
    ops/quantization.py): large weights live in HBM as int8 and dequantize on
    the fly inside the step, halving (vs bf16) the weight bytes each forward
    streams — the deployment analog of the reference's scalar quantization
    (quantize_model_scalar, quantization_utils.py:15; modules/quantization/scalar).  The bias pack
    is precomputed from the UNQUANTIZED params (one-time cost, keeps the
    shape-static tensors exact)."""

    def __init__(self, model: SegOFA, params, src_len: int, quantize: str = "none"):
        self.model = model
        self.quantize = quantize
        self.pre = precompute(model, params, src_len)
        if quantize == "int8":
            from ifseg_tpu.ops.quantization import (
                dequantize_tree,
                quantize_tree_scalar,
            )

            # eager one-time quantization at startup (per-leaf absmax+round)
            self.params, self.quant_report = quantize_tree_scalar(params)
            self._fn = jax.jit(
                lambda p, pre, src, img, bos: forward_served(
                    model, dequantize_tree(p), pre, src, img, bos
                )
            )
        elif quantize in ("none", "", None):
            self.params = params
            self._fn = jax.jit(
                lambda p, pre, src, img, bos: forward_served(
                    model, p, pre, src, img, bos
                )
            )
        else:
            raise ValueError(f"unknown quantize mode {quantize!r}")

    def __call__(self, src_tokens, patch_images, bos_tokens):
        return self._fn(self.params, self.pre, src_tokens, patch_images, bos_tokens)
