"""Train-step wall time at the reference config (OFA-Base 512px, batch 16)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import numpy as np

# persistent compile cache: the remote-tunnel TPU compile of the full train
# step is minutes cold, seconds warm
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_tpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ifseg_tpu.config import Config, model_config_for_arch
from ifseg_tpu.parallel.mesh import MeshConfig, build_mesh
from ifseg_tpu.train.trainer import Trainer

cfg = Config()
cfg = cfg.replace(model=model_config_for_arch("segofa_base"))
cfg.task.num_seg_tokens = cfg.model.num_seg_tokens = 150
cfg.optimization.batch_size = 16
mesh = build_mesh(MeshConfig(data_parallel=1, fsdp=1, tensor_parallel=1),
                  devices=jax.devices()[:1])

rng = np.random.default_rng(0)
num_seg = 150
tokens = rng.integers(4, 100, size=(num_seg + 1, 5)).astype(np.int32)
lengths = rng.integers(1, 6, size=(num_seg + 1,)).astype(np.int32)

trainer = Trainer(cfg, mesh, tokens, lengths, total_num_updates=100)
trainer.init_state()

b = 16
s = cfg.model.patch_image_size
hw16 = (s // 16) ** 2
batch = {
    "patch_images": rng.normal(size=(b, s, s, 3)).astype(np.float32),
    "src_tokens": rng.integers(4, 100, size=(b, 32)).astype(np.int32),
    "bos_tokens": np.zeros((b, 1), np.int32),
    "target": rng.integers(0, num_seg, size=(b, s, s)).astype(np.int32),
    "downsampled_target": rng.integers(0, num_seg, size=(b, hw16)).astype(np.int32),
    "aux_grid_ids": rng.integers(0, num_seg, size=(b, hw16)).astype(np.int32),
    "aux_target": rng.integers(0, num_seg, size=(b, s, s)).astype(np.int32),
}

batch = jax.device_put(batch)  # stage once: time the step, not the tunnel upload
logs = trainer.train_step(batch)
print("warmup loss", float(np.asarray(logs["loss"])))
iters = 10
t0 = time.perf_counter()
for _ in range(iters):
    logs = trainer.train_step(batch)
_ = float(np.asarray(logs["loss"]))
dt = (time.perf_counter() - t0) / iters
print(f"train step: {dt*1e3:.0f} ms  ({b/dt:.1f} img/s)")
