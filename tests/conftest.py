import os

# Tests run on a virtual 8-device CPU mesh (SURVEY.md §4 test strategy):
# multi-process NCCL tests in the reference become multi-device pjit tests here.
os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env pins a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402
import jax  # noqa: E402

# The image's sitecustomize imports jax and registers the axon TPU plugin
# before this file runs, so the env var alone is ignored — force via config.
jax.config.update("jax_platforms", "cpu")

# Per-op eager compiles are ~0.5s in this environment; the persistent cache
# makes repeated test runs fast.  Tests should still jit whole functions.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)


@pytest.fixture(scope="session")
def bpe_dir():
    return os.path.join(os.path.dirname(__file__), "..", "assets", "BPE")
