"""Importing the package must not initialize the XLA backend.

``jax.distributed.initialize`` must run before ANY call that touches the
backend (jax raises otherwise), and every multi-process entrypoint —
``cli_main`` under --num-processes, the spawn workers — imports the package
before it can reach that call.  So no module may create concrete arrays at
import time (the classic trap: a ``jnp.ones(...)`` NamedTuple field default
runs at class-definition time).  Regression test for the mp_cli_worker
failure where train/optim.py's FairseqAdamState default initialized the CPU
backend during ``import ifseg_tpu.cli.train``.

Reference analog: distributed_init precedes all tensor work in the spawned
main (custom_fairseq/fairseq/distributed/utils.py:335-348).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import jax._src.xla_bridge as xb
import importlib, pkgutil
import ifseg_tpu

for mod in pkgutil.walk_packages(ifseg_tpu.__path__, "ifseg_tpu."):
    importlib.import_module(mod.name)
    assert not xb._backends, f"XLA backend initialized by import of {mod.name}"
print("IMPORT_PURE")
"""


def test_no_module_initializes_backend_at_import():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "IMPORT_PURE" in proc.stdout
