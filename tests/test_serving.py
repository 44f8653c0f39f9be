"""Serving fast path (precomputed biases) must match the standard forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ifseg_tpu.config import model_config_for_arch
from ifseg_tpu.eval.serving import SegServer
from ifseg_tpu.models.segofa import SegOFA, SegOFAVariables


def test_served_forward_matches_standard():
    cfg = model_config_for_arch(
        "segofa_tiny",
        encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=2,
        encoder_attention_heads=4, decoder_embed_dim=32, decoder_ffn_embed_dim=64,
        decoder_layers=2, decoder_attention_heads=4, resnet_type="resnet50",
        patch_image_size=64, orig_patch_image_size=64, num_seg_tokens=5,
        dropout=0.0, encoder_drop_path_rate=0.0, decoder_drop_path_rate=0.0,
        dtype="float32",
    )
    model, params = SegOFAVariables.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(4, 100, size=(2, 10)), jnp.int32)
    img = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    bos = jnp.zeros((2, 1), jnp.int32)

    @jax.jit
    def standard(p, src, img, bos):
        logits, _ = model.apply(
            {"params": p}, src_tokens=src, patch_images=img, bos_tokens=bos,
            deterministic=True,
        )
        return logits

    want = np.asarray(standard(params, src, img, bos))
    server = SegServer(model, params, src_len=10)
    got = np.asarray(server(src, img, bos))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_served_int8_argmax_agreement():
    """Weight-only int8 serving (reference: quantize_model_scalar,
    quantization_utils.py:15) must keep the per-pixel argmax decision: the quantization error of
    8-bit per-channel absmax rounding is far below the logit margins a trained
    (or even random-init) head produces.  Gates the --quantize=int8 flag on
    cli/serve.py end-to-end through SegServer."""
    cfg = model_config_for_arch(
        "segofa_tiny",
        encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=2,
        encoder_attention_heads=4, decoder_embed_dim=32, decoder_ffn_embed_dim=64,
        decoder_layers=2, decoder_attention_heads=4, resnet_type="resnet50",
        patch_image_size=64, orig_patch_image_size=64, num_seg_tokens=5,
        dropout=0.0, encoder_drop_path_rate=0.0, decoder_drop_path_rate=0.0,
        dtype="float32",
    )
    model, params = SegOFAVariables.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.integers(4, 100, size=(2, 10)), jnp.int32)
    img = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    bos = jnp.zeros((2, 1), jnp.int32)

    ref_server = SegServer(model, params, src_len=10)
    q_server = SegServer(model, params, src_len=10, quantize="int8")
    assert q_server.quant_report["quantized"] > 0
    assert (
        q_server.quant_report["bytes_quant"]
        < 0.5 * q_server.quant_report["bytes_fp32"]
    )

    want = np.asarray(ref_server(src, img, bos))
    got = np.asarray(q_server(src, img, bos))
    # Random-init logit margins are near zero, so some argmax flips are
    # expected at ANY quantization width; the meaningful gates are (a) the
    # logit perturbation is small relative to the logit spread and (b) the
    # bulk of decisions still agree.  tools/bench_int8_serving.py measures
    # the base-scale number (random-init by default, trained weights via
    # --checkpoint) quoted in README's serving section.
    rel = np.abs(got - want).mean() / (np.abs(want - want.mean()).mean() + 1e-8)
    assert rel < 0.05, f"int8 relative logit error {rel:.4f} >= 5%"
    agree = (got.argmax(-1) == want.argmax(-1)).mean()
    assert agree >= 0.85, f"int8 argmax agreement {agree:.4f} < 0.85"
