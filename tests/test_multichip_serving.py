"""Serving fast path under data-parallel sharding on a multi-device mesh.

Training multi-chip is covered by the driver dryrun; this locks down the
inference/serving story: the precomputed-bias forward jitted with a batch
sharded over ('data','fsdp') must reproduce the single-device result (GSPMD replicates the bias pack
and params, splits the batch; agreement is to fp32 reduction-order noise).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ifseg_tpu.config import ModelConfig
from ifseg_tpu.eval.serving import SegServer, forward_served
from ifseg_tpu.models.segofa import SegOFAVariables
from ifseg_tpu.parallel.mesh import MeshConfig, build_mesh


def _tiny():
    return ModelConfig(
        encoder_embed_dim=64, encoder_ffn_embed_dim=128, encoder_layers=2,
        encoder_attention_heads=4, decoder_embed_dim=64,
        decoder_ffn_embed_dim=128, decoder_layers=2,
        decoder_attention_heads=4, resnet_type="resnet50",
        patch_image_size=64, orig_patch_image_size=64, num_seg_tokens=5,
        dtype="float32",
    )


@pytest.mark.slow
@pytest.mark.mesh
def test_served_forward_matches_under_dp_sharding():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh (tests/conftest.py)")
    cfg = _tiny()
    model, params = SegOFAVariables.init(
        cfg, jax.random.PRNGKey(0), src_len=8, image_size=64
    )
    server = SegServer(model, params, src_len=8)

    rng = np.random.default_rng(0)
    b = 8
    src = jnp.asarray(rng.integers(4, 100, size=(b, 8)), jnp.int32)
    img = jnp.asarray(rng.normal(size=(b, 64, 64, 3)), jnp.float32)
    bos = jnp.zeros((b, 1), jnp.int32)

    single = np.asarray(forward_served(model, params, server.pre, src, img, bos))

    mesh = build_mesh(
        MeshConfig(data_parallel=4, fsdp=2, tensor_parallel=1),
        devices=jax.devices()[:8],
    )
    batch_spec = NamedSharding(mesh, P(("data", "fsdp")))
    src_s = jax.device_put(src, batch_spec)
    img_s = jax.device_put(img, batch_spec)
    bos_s = jax.device_put(bos, batch_spec)

    fwd = jax.jit(
        lambda p, pre, s, i, bo: forward_served(model, p, pre, s, i, bo),
        out_shardings=batch_spec,
    )
    sharded = np.asarray(fwd(params, server.pre, src_s, img_s, bos_s))
    # not bitwise: GSPMD picks different reduction tilings than the
    # single-device program; fp32 forward agrees to ~1e-5
    np.testing.assert_allclose(single, sharded, rtol=1e-4, atol=1e-4)
