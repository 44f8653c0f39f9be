"""Checkpoint save/load with best-metric rotation (orbax-backed).

Capability parity with utils/checkpoint_utils.py:
  - conditions: save_interval epochs, best metric (maximize), keep_last_epochs,
    keep_best_checkpoints, checkpoint_last always refreshed (:35-120)
  - state = model params + optimizer + EMA + lr step + metrics state +
    train-iterator position + best val metric (trainer.py:383-442)
  - restore honors reset_optimizer / reset_dataloader / reset_meters
    (:191-295)
  - async save: orbax's async checkpointer replaces ioPath ``opena``
    (:512-543); only process 0 writes metadata, all processes participate in
    the array save (orbax handles multi-host)

Layout: <save_dir>/checkpoint_{epoch}/  (orbax dir) + checkpoint_last,
checkpoint_best as epoch pointers in a small JSON manifest.
"""

import json
import logging
import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)


class CheckpointManager:
    def __init__(self, cfg, save_dir: Optional[str] = None):
        self.cfg = cfg
        self.save_dir = os.path.abspath(save_dir or cfg.save_dir)
        os.makedirs(self.save_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self._manifest_path = os.path.join(self.save_dir, "manifest.json")
        self.manifest = self._load_manifest()

    def _load_manifest(self) -> Dict[str, Any]:
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as fp:
                m = json.load(fp)
                m.setdefault("intervals", [])
                return m
        return {
            "best": None, "best_metric": None, "epochs": [], "bests": [],
            "intervals": [],
        }

    def _write_manifest(self):
        if jax.process_index() == 0:
            tmp = self._manifest_path + ".tmp"
            with open(tmp, "w") as fp:
                json.dump(self.manifest, fp, indent=2)
            os.replace(tmp, self._manifest_path)

    def _path(self, name: str) -> str:
        return os.path.join(self.save_dir, name)

    # ------------------------------------------------------------------- save

    def save(
        self,
        epoch: int,
        state,  # TrainState
        extra: Optional[Dict[str, Any]] = None,  # metrics / iterator states
        val_metric: Optional[float] = None,
        updates: Optional[int] = None,  # mid-epoch save at this update count
    ) -> None:
        cfg = self.cfg
        if cfg.no_save:
            return
        if updates is not None:
            # --save-interval-updates checkpoint (checkpoint_{epoch}_{upd}.pt
            # in the reference, utils/checkpoint_utils.py:59-70)
            name = f"checkpoint_{epoch}_{updates}"
        else:
            name = f"checkpoint_{epoch}"
        # single-process: pull to host so the async write never races a
        # donated-buffer reuse.  Multi-process: device_get on a cross-process
        # sharded array is impossible (shards are not addressable) — hand
        # orbax the sharded jax.Arrays; it writes each host's shards and
        # coordinates the commit across processes.
        if jax.process_count() == 1:
            tree = {"state": jax.device_get(state)}
        else:
            tree = {"state": state}
        # async write: wait for the PREVIOUS save to commit, then kick off
        # this one and return — the disk write overlaps subsequent training
        # steps (latest()/load() re-synchronize before any read)
        self._ckptr.wait_until_finished()
        self._ckptr.save(self._path(name), tree, force=True)
        if extra is not None and jax.process_index() == 0:
            with open(self._path(name) + ".extra.json", "w") as fp:
                json.dump(_jsonable(extra), fp)

        if updates is not None:
            self.manifest["intervals"].append({"name": name, "updates": updates})
            self.manifest["last"] = name
            keep = cfg.keep_interval_updates
            if keep and keep > 0:
                for old in self.manifest["intervals"][:-keep]:
                    self._remove(old["name"])
                self.manifest["intervals"] = self.manifest["intervals"][-keep:]
            self._write_manifest()
            logger.info("saved %s (mid-epoch)", name)
            return

        self.manifest["epochs"].append({"epoch": epoch, "name": name})
        self.manifest["last"] = name

        maximize = cfg.maximize_best_checkpoint_metric
        if val_metric is not None:
            best = self.manifest.get("best_metric")
            better = (
                best is None
                or (maximize and val_metric > best)
                or (not maximize and val_metric < best)
            )
            if better:
                self.manifest["best_metric"] = float(val_metric)
                self.manifest["best"] = name
            self.manifest["bests"].append({"name": name, "metric": float(val_metric)})
            self.manifest["bests"].sort(
                key=lambda x: -x["metric"] if maximize else x["metric"]
            )

        self._prune()
        self._write_manifest()
        logger.info("saved %s (val %s)", name, val_metric)

    def _prune(self):
        cfg = self.cfg
        keep = set()
        if self.manifest.get("best"):
            keep.add(self.manifest["best"])
        if self.manifest.get("last"):
            keep.add(self.manifest["last"])
        if cfg.keep_best_checkpoints > 0:
            for b in self.manifest["bests"][: cfg.keep_best_checkpoints]:
                keep.add(b["name"])
        if cfg.keep_last_epochs > 0:
            for e in self.manifest["epochs"][-cfg.keep_last_epochs:]:
                keep.add(e["name"])
        for e in list(self.manifest["epochs"]):
            if e["name"] not in keep:
                self._remove(e["name"])
                self.manifest["epochs"].remove(e)

    def _remove(self, name: str) -> None:
        if self.manifest.get("last") == name or self.manifest.get("best") == name:
            return
        path = self._path(name)
        if os.path.isdir(path) and jax.process_index() == 0:
            shutil.rmtree(path, ignore_errors=True)
            if os.path.exists(path + ".extra.json"):
                os.remove(path + ".extra.json")

    # ------------------------------------------------------------------- load

    def latest(self) -> Optional[str]:
        """Newest COMMITTED checkpoint: the manifest is written while the
        async save is still in flight, so fall back through history if the
        newest directory never materialized (crash mid-write)."""
        self._ckptr.wait_until_finished()
        last = self.manifest.get("last")
        if last and os.path.isdir(self._path(last)):
            return last
        for e in reversed(
            self.manifest.get("intervals", []) + self.manifest.get("epochs", [])
        ):
            if os.path.isdir(self._path(e["name"])):
                return e["name"]
        return None

    def best(self) -> Optional[str]:
        return self.manifest.get("best")

    def load(self, name: str, abstract_state) -> Any:
        """Restore a TrainState (pass an abstract/concrete template for
        shapes+shardings)."""
        self._ckptr.wait_until_finished()
        tree = self._ckptr.restore(
            self._path(name), target={"state": abstract_state}
        )
        return tree["state"]

    def finalize(self) -> None:
        """Block until in-flight async writes commit (end of training)."""
        self._ckptr.wait_until_finished()

    def load_extra(self, name: str) -> Dict[str, Any]:
        p = self._path(name) + ".extra.json"
        if os.path.exists(p):
            with open(p) as fp:
                return json.load(fp)
        return {}


def _jsonable(x):
    if isinstance(x, dict):
        return {k: _jsonable(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_jsonable(v) for v in x]
    if isinstance(x, (np.generic,)):
        return x.item()
    if isinstance(x, np.ndarray):
        return x.tolist()
    return x
