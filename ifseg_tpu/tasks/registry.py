"""Minimal task registry (registry-lite, SURVEY.md §7).

Parity with fairseq's decorator registries (custom_fairseq/fairseq/registry.py,
tasks/__init__.py:19-44) at the scale this framework needs: a name -> class
map with a ``setup_task`` entry point.  The reference additionally supports
``--user-dir`` plugin imports; here third-party tasks just import this module
and call ``register_task`` at import time.
"""

from typing import Callable, Dict, Type

TASK_REGISTRY: Dict[str, Type] = {}


def register_task(name: str) -> Callable:
    def wrap(cls):
        if name in TASK_REGISTRY and TASK_REGISTRY[name] is not cls:
            raise ValueError(f"duplicate task registration: {name}")
        TASK_REGISTRY[name] = cls
        cls.task_name = name
        return cls

    return wrap


def setup_task(name: str, cfg):
    if name not in TASK_REGISTRY:
        raise KeyError(f"unknown task {name}; known: {sorted(TASK_REGISTRY)}")
    return TASK_REGISTRY[name].setup_task(cfg)
