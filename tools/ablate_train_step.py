"""Component-level ablation of the train step (reference config, batch 16).

The per-op trace (tools/profile_trace.py --train) groups by XLA fusion kind,
which smears attribution; this times each component as its own jitted
function so README's train table has honest rows:

  loss fwd            the image-free forward + CE
  loss fwd+bwd        value_and_grad (adds flash backwards, bias vjps)
  optimizer           clip + Adam + EMA on frozen state
  monitor fwd         deterministic real-batch forward + metric outputs
  full step           everything (monitoring on), the shipped path

Readback-synced timings (block_until_ready lies through the axon relay).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_tpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ifseg_tpu.config import Config, model_config_for_arch
from ifseg_tpu.parallel.mesh import MeshConfig, build_mesh
from ifseg_tpu.train import optim as optim_lib
from ifseg_tpu.train.trainer import Trainer

cfg = Config()
cfg = cfg.replace(model=model_config_for_arch("segofa_base"))
cfg.task.num_seg_tokens = cfg.model.num_seg_tokens = 150
cfg.optimization.batch_size = 16
mesh = build_mesh(MeshConfig(1, 1, 1), devices=jax.devices()[:1])

rng = np.random.default_rng(0)
num_seg = 150
tokens = rng.integers(4, 100, size=(num_seg + 1, 5)).astype(np.int32)
lengths = rng.integers(1, 6, size=(num_seg + 1,)).astype(np.int32)
trainer = Trainer(cfg, mesh, tokens, lengths, total_num_updates=100)
trainer.init_state()

b, s = 16, cfg.model.patch_image_size
hw16 = (s // 16) ** 2
batch = jax.device_put({
    "patch_images": rng.normal(size=(b, s, s, 3)).astype(np.float32),
    "src_tokens": rng.integers(4, 100, size=(b, 32)).astype(np.int32),
    "bos_tokens": np.zeros((b, 1), np.int32),
    "target": rng.integers(0, num_seg, size=(b, s, s)).astype(np.int32),
    "downsampled_target": rng.integers(0, num_seg, size=(b, hw16)).astype(np.int32),
    "aux_grid_ids": rng.integers(0, num_seg, size=(b, hw16)).astype(np.int32),
    "aux_target": rng.integers(0, num_seg, size=(b, s, s)).astype(np.int32),
})

key = jax.random.PRNGKey(0)
params = trainer.state.params


def timed(name, fn, *args, iters=8):
    out = fn(*args)  # compile
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out
    )
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    # hard sync: read back one scalar value
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:<28} {dt * 1e3:8.1f} ms")
    return dt


loss_fwd = jax.jit(lambda p, b_, k: trainer._loss_fn(p, b_, k))
loss_grad = jax.jit(
    lambda p, b_, k: jax.value_and_grad(trainer._loss_fn)(p, b_, k)
)
monitor = jax.jit(lambda p, b_: trainer._monitor(p, b_))


def opt_only(state_params, opt_state, grads):
    grads, gnorm = optim_lib.clip_by_global_norm(
        grads, cfg.optimization.clip_norm
    )
    updates, new_opt = trainer.tx.update(grads, opt_state, state_params)
    new_params = jax.tree_util.tree_map(
        lambda p, u: p + u.astype(p.dtype), state_params, updates
    )
    return new_params, new_opt, gnorm


opt_jit = jax.jit(opt_only)

print(f"config: OFA-Base 512px batch {b}, monitoring on in 'full step'")
t_fwd = timed("loss fwd", loss_fwd, params, batch, key)
t_bwd = timed("loss fwd+bwd", loss_grad, params, batch, key)
_, grads = loss_grad(params, batch, key)
t_opt = timed("optimizer (clip+adam+ema)", opt_jit, params,
              trainer.state.opt_state, grads)
t_mon = timed("monitor fwd", monitor, params, batch)
# free the component executables AND their live outputs before timing the
# shipped step: a held fp32 grad tree (~0.7 GB) plus four resident
# executables crowd HBM enough to double the full-step time (measured 615
# vs bench.py's 293 ms in a clean process)
del grads, loss_fwd, loss_grad, opt_jit, monitor
logs = trainer.train_step(batch)  # compile + warm
float(np.asarray(logs["loss"]))
t0 = time.perf_counter()
iters = 8
for _ in range(iters):
    logs = trainer.train_step(batch)
float(np.asarray(logs["loss"]))
t_full = (time.perf_counter() - t0) / iters
print(f"{'full step (shipped)':<28} {t_full * 1e3:8.1f} ms")
print(f"{'sum of parts':<28} {(t_bwd + t_opt + t_mon) * 1e3:8.1f} ms")
print(f"backward-only (fwd+bwd - fwd): {(t_bwd - t_fwd) * 1e3:.1f} ms")
