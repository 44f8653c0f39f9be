"""Trainer: jitted train/valid steps, grad accumulation, EMA, state.

Replaces the reference's trainer.py (forked fairseq Trainer, 1547 LoC) with a
single-controller JAX design:
  - grad sync: implicit — batch is sharded over the data axes and params carry
    NamedShardings, so XLA emits the psum (no DDP wrapper, no no_sync;
    ref trainer.py:766-784, :858-863)
  - grad accumulation: ``lax.scan`` over a leading microbatch axis inside one
    jit (ref GroupedIterator + no_sync)
  - clip + grad-norm logging in fp32 (ref :865-903)
  - EMA step fused into the update (ref :964-976)
  - bf16 compute / fp32 params+optimizer replaces fp16 + dynamic loss scaling
    (ref fp16_optimizer.py; unnecessary with bf16's fp32 exponent range)
  - the dual-branch criterion step (image-free trainable fwd + inference-mode
    monitoring fwd, seg_criterion.py:179-187) is one compiled function; the
    monitoring branch runs deterministic (dropout off) and produces only
    stop-gradient metrics, exactly like ``torch.inference_mode``
  - NaN handling: instead of rerunning under hooks (ref nan_detector.py), the
    update is skipped when the global grad norm is non-finite and the event is
    counted (``n_nonfinite``) — same recovery semantics, zero overhead
"""

import logging
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ifseg_tpu.config import Config
from ifseg_tpu.models.segofa import SegOFA
from ifseg_tpu.parallel.mesh import build_mesh
from ifseg_tpu.parallel.sharding import batch_sharding, param_shardings, replicated
from ifseg_tpu.train import optim as optim_lib
from ifseg_tpu.train.criterion import (
    compute_imfree_loss,
    compute_monitor_outputs,
    init_seg_embeddings,
)
from ifseg_tpu.train.ema import ema_init, ema_step

logger = logging.getLogger(__name__)

# approximate trainable-parameter counts for the ResNet stems (conv + head
# projections; models/resnet.py) — only used by the remat bytes model below
_RESNET_PARAMS = {"resnet50": 24e6, "resnet101": 43e6, "resnet152": 58e6}


def estimate_train_hbm_bytes(model_cfg, per_chip_microbatch: int,
                             ema: bool = False) -> float:
    """Explicit HBM bytes model for one train step WITHOUT rematerialization
    (all layer activations live until the backward).

    Components:
      fixed   params + Adam m/v + grads, fp32 (4 copies; +1 under EMA)
      packs   the two all-layer (nl, H, L, L) bf16 bias packs plus their
              fp32 dbias cotangents (transient but peak-coincident)
      acts    ~13 d-width activation slots per transformer layer per token
              in bf16 (x, q/k/v, attn out, two LN outputs, 4d FFN hidden
              counted as 4, fc2 out, residual adds) — calibrated against
              the measured fit boundary (OFA-Base 512px: batch 16 fits one
              16 GB v5e, batch 64 OOMs)

    Used by resolve_remat_policy; deliberately conservative (no XLA temp
    modeling) — callers compare against a fraction of the chip's HBM."""
    m = model_cfg
    d = m.encoder_embed_dim
    dd = m.decoder_embed_dim
    nl_e, nl_d = m.encoder_layers, m.decoder_layers
    hw = (m.patch_image_size // 16) ** 2
    l_tok = hw + 96  # image grid + text/src tokens (+BOS, rounded up)

    n_params = (
        60e3 * d  # embeddings (vocab + seg tables)
        + _RESNET_PARAMS.get(getattr(m, "resnet_type", "resnet101"), 43e6)
        + nl_e * 12 * d * d
        + nl_d * 16 * dd * dd  # incl. cross-attention
    )
    fixed = n_params * 4.0 * (4 + (1 if ema else 0))

    heads = m.encoder_attention_heads
    pack = 2 * (nl_e * heads * l_tok * l_tok * 2)  # enc + dec bf16 packs
    dbias = 2 * (nl_e * heads * l_tok * l_tok * 4)  # fp32 cotangents (peak)

    acts = (
        (nl_e * d + nl_d * dd) * l_tok * 13 * 2 * per_chip_microbatch
    )
    return fixed + pack + dbias + acts


def resolve_remat_policy(cfg: Config, n_data_shards: int = 1,
                         hbm_bytes: Optional[float] = None) -> None:
    """Resolve cfg.model.remat_policy == 'auto' in place before model build.

    Rematerialization trades ~5% step time (measured: 0.279 vs 0.293 s/step
    at OFA-Base 512px batch 16, one v5e chip) for activation memory.  When
    the estimated no-remat footprint fits in 72% of the chip's HBM, turn
    checkpoint_activations OFF; otherwise keep it on with the save-attn
    policy.  Only the image-free (unsupervised) loss path qualifies — the
    supervised branch backprops through the ResNet stem, whose activations
    the bytes model deliberately does not cover.
    """
    m = cfg.model
    if getattr(m, "remat_policy", None) != "auto":
        return
    m.remat_policy = "save-attn"
    if not m.checkpoint_activations:
        return
    if not cfg.criterion.unsupervised_segmentation:
        return
    ufreq = max(cfg.optimization.update_freq, 1)
    per_chip = max(
        cfg.optimization.batch_size // max(n_data_shards, 1) // ufreq, 1
    )
    if hbm_bytes is None:
        try:
            stats = jax.devices()[0].memory_stats() or {}
            hbm_bytes = float(stats.get("bytes_limit", 16e9))
        except Exception:
            hbm_bytes = 16e9
    est = estimate_train_hbm_bytes(m, per_chip, ema=cfg.task.uses_ema)
    if est < 0.72 * hbm_bytes:
        m.checkpoint_activations = False
        logger.info(
            "remat auto: OFF — estimated %.1f GB no-remat footprint fits "
            "%.1f GB HBM (per-chip microbatch %d)",
            est / 1e9, hbm_bytes / 1e9, per_chip,
        )
    else:
        logger.info(
            "remat auto: save-attn — estimated %.1f GB no-remat footprint "
            "exceeds 72%% of %.1f GB HBM (per-chip microbatch %d)",
            est / 1e9, hbm_bytes / 1e9, per_chip,
        )


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None


class Trainer:
    """Owns model/params/optimizer and the compiled step functions."""

    def __init__(
        self,
        cfg: Config,
        mesh=None,
        class_tokens: Optional[np.ndarray] = None,
        class_lengths: Optional[np.ndarray] = None,
        total_num_updates: int = 1,
        rng: Optional[jax.Array] = None,
    ):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else build_mesh()
        from ifseg_tpu.parallel.plan import plan_from_config

        self.plan = plan_from_config(cfg.distributed, self.mesh)
        resolve_remat_policy(
            cfg,
            n_data_shards=self.mesh.shape.get("data", 1)
            * self.mesh.shape.get("fsdp", 1),
        )
        self.model = SegOFA(cfg.model, plan=self.plan)
        # class tables are replicated constants: committing the sharding here
        # avoids an XLA "involuntary full rematerialization" transition when
        # the jitted step infers a batch-style layout for them
        rep = replicated(self.mesh)
        self.class_tokens = (
            jax.device_put(jnp.asarray(class_tokens), rep)
            if class_tokens is not None
            else None
        )
        self.class_lengths = (
            jax.device_put(jnp.asarray(class_lengths), rep)
            if class_lengths is not None
            else None
        )
        self.total_num_updates = total_num_updates
        self._rng = rng if rng is not None else jax.random.PRNGKey(cfg.optimization.seed)
        self._train_fn = None
        self._valid_fn = None
        self._batch_shard = None
        self.state: Optional[TrainState] = None

    # ----------------------------------------------------------------- setup

    def init_state(self, params: Optional[Any] = None) -> TrainState:
        cfg = self.cfg
        if params is None:
            from ifseg_tpu.models.segofa import SegOFAVariables

            _, params = SegOFAVariables.init(cfg.model, self._rng, plan=self.plan)
        if cfg.criterion.init_seg_with_text and self.class_tokens is not None:
            params = init_seg_embeddings(
                params, self.class_tokens, self.class_lengths, cfg.model.num_seg_tokens
            )
        self.tx, self.schedule, self.mask = optim_lib.build_optimizer(
            params, cfg.model, cfg.optimization, self.total_num_updates
        )
        opt_state = self.tx.init(params)
        ema = (
            ema_init(params, cfg.common.ema_fp32)
            if cfg.common.ema_decay > 0
            else None
        )
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params, opt_state=opt_state,
            ema_params=ema,
        )
        # place on mesh — plan-aware: TP rules only when TP itself occupies
        # the 'model' axis; CP/PP runs keep non-expert params replicated there
        # (a TP-sharded kernel entering a shard_map program forces a full
        # resharding round-trip per step), MoE keeps expert params sharded
        from ifseg_tpu.parallel.sharding import opt_state_shardings, shardings_for_plan

        use_tp, use_moe = shardings_for_plan(cfg.distributed)
        shardings = TrainState(
            step=replicated(self.mesh),
            params=param_shardings(params, self.mesh, use_tp=use_tp, use_moe=use_moe),
            opt_state=opt_state_shardings(
                opt_state, self.mesh, zero1=cfg.distributed.zero1,
                use_tp=use_tp, use_moe=use_moe,
            ),
            ema_params=(
                param_shardings(ema, self.mesh, use_tp=use_tp, use_moe=use_moe)
                if ema is not None
                else None
            ),
        )
        self.state_shardings = shardings
        self.state = jax.device_put(state, shardings)
        return self.state

    # ------------------------------------------------------------- train step

    def _images(self, imgs):
        """uint8 wire format for the train batch: the host ships raw uint8
        RGB (the aug chain's native dtype) and the normalize runs HERE,
        inside the jitted step — 4x fewer host->device bytes; fp32 arrays
        pass through for hand-built test batches (same contract as the
        evaluator's compiled fn)."""
        if imgs.dtype != jnp.uint8:
            return imgs
        from ifseg_tpu.data.segmentation_dataset import eval_mean_std

        mean, std = eval_mean_std(self.cfg.task)
        return (
            imgs.astype(jnp.float32) / 255.0 - np.asarray(mean, np.float32)
        ) / np.asarray(std, np.float32)

    @staticmethod
    def _labels(t):
        """Targets ride uint8 where the class ids fit; compute in int32."""
        return t.astype(jnp.int32) if t.dtype != jnp.int32 else t

    def _loss_fn(self, params, batch, dropout_rng):
        """Image-free training loss (seg_criterion.py:179-183)."""
        cfg = self.cfg
        hw16 = cfg.model.patch_image_size // 16
        _, extra = self.model.apply(
            {"params": params},
            aux_grid_ids=batch["aux_grid_ids"],
            aux_src_tokens=batch["src_tokens"],
            bos_tokens=batch["bos_tokens"],
            class_tokens=self.class_tokens,
            class_lengths=self.class_lengths,
            full_context_alignment=cfg.criterion.full_context_alignment,
            deterministic=False,
            rngs={"dropout": dropout_rng},
        )
        loss = compute_imfree_loss(
            extra["aux_output"],
            self._labels(batch["aux_target"]),
            cfg.model.num_seg_tokens,
            (hw16, hw16),
            cfg.criterion.label_smoothing,
        )
        return loss

    def _loss_fn_supervised(self, params, batch, dropout_rng):
        """Supervised branch (unsupervised_segmentation=false,
        seg_criterion.py:188-192): CE of upsampled real-image logits vs the
        augmented ground truth."""
        from ifseg_tpu.train.criterion import _grid_from_logits, upsampled_ce

        cfg = self.cfg
        hw16 = cfg.model.patch_image_size // 16
        logits, _ = self.model.apply(
            {"params": params},
            src_tokens=batch["src_tokens"],
            patch_images=self._images(batch["patch_images"]),
            bos_tokens=batch["bos_tokens"],
            full_context_alignment=cfg.criterion.full_context_alignment,
            deterministic=False,
            rngs={"dropout": dropout_rng},
        )
        grid = _grid_from_logits(logits, (hw16, hw16))
        target = self._labels(batch["target"])
        valid = target != cfg.model.num_seg_tokens
        out = upsampled_ce(
            grid, target, valid, cfg.criterion.label_smoothing
        )
        return out.loss_sum / jnp.maximum(out.count, 1.0)

    def _monitor(self, params, batch):
        cfg = self.cfg
        hw16 = cfg.model.patch_image_size // 16
        logits, _ = self.model.apply(
            {"params": params},
            src_tokens=batch["src_tokens"],
            patch_images=self._images(batch["patch_images"]),
            bos_tokens=batch["bos_tokens"],
            full_context_alignment=cfg.criterion.full_context_alignment,
            deterministic=True,
        )
        return compute_monitor_outputs(
            jax.lax.stop_gradient(logits),
            self._labels(batch["target"]),
            batch["downsampled_target"],
            cfg.model.num_seg_tokens,
            (hw16, hw16),
            cfg.criterion.label_smoothing,
        )

    def _build_train_fn(self):
        cfg = self.cfg
        ufreq = max(cfg.optimization.update_freq, 1)
        # unsupervised (image-free): train on the artificial grid with an
        # inference-mode monitoring pass on the real batch; supervised:
        # train directly on real images (seg_criterion.py:179-192)
        unsupervised = cfg.criterion.unsupervised_segmentation
        monitoring = unsupervised and cfg.criterion.monitor_real_batch
        loss_fn = self._loss_fn if unsupervised else self._loss_fn_supervised

        def step_fn(state: TrainState, batch: Dict[str, Any]):
            rng = jax.random.fold_in(self._base_rng, state.step)

            if ufreq == 1:
                loss, grads = jax.value_and_grad(loss_fn)(
                    state.params, batch, rng
                )
            else:
                def micro(carry, mb):
                    acc, i = carry
                    r = jax.random.fold_in(rng, i)
                    l, g = jax.value_and_grad(loss_fn)(state.params, mb, r)
                    acc = jax.tree_util.tree_map(jnp.add, acc, g)
                    return (acc, i + 1), l

                zero = jax.tree_util.tree_map(
                    lambda p: jnp.zeros(p.shape, jnp.float32), state.params
                )
                (gsum, _), losses = jax.lax.scan(micro, (zero, 0), batch)
                grads = jax.tree_util.tree_map(lambda g: g / ufreq, gsum)
                loss = jnp.mean(losses)

            # frozen params never reach the optimizer (multi_transform zeroes
            # them) but their raw grads would inflate the clip norm — the
            # reference clips over optimizer (trainable) params only
            # (trainer.py:865-903).  Zero them before the norm; trace-time
            # no-op for fully-trainable configs.
            grads = jax.tree_util.tree_map(
                lambda g, t: g if t else jnp.zeros_like(g), grads, self.mask
            )
            grads, gnorm = optim_lib.clip_by_global_norm(
                grads, cfg.optimization.clip_norm
            )
            finite = jnp.isfinite(gnorm)
            grads = jax.tree_util.tree_map(
                lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
            )
            # skip the update ENTIRELY on non-finite grads (NanDetector /
            # overflow semantics, ref trainer.py:918-934): params, optimizer
            # moments, EMA, and the step counter all stay untouched — the
            # reference does not advance num_updates or decay Adam moments on
            # a skipped step.  lax.cond (not a where-tree): only one branch
            # executes, and elementwise selects over the moment trees would
            # break buffer donation (measured +180 ms/step at OFA-Base).
            def _apply(_):
                updates, new_opt = self.tx.update(
                    grads, state.opt_state, state.params
                )
                new_params = jax.tree_util.tree_map(
                    lambda p, u: p + u.astype(p.dtype), state.params, updates
                )
                new_ema = state.ema_params
                if new_ema is not None:
                    new_ema = ema_step(new_ema, new_params, cfg.common.ema_decay)
                return new_params, new_opt, new_ema

            def _skip(_):
                return state.params, state.opt_state, state.ema_params

            new_params, new_opt, new_ema = jax.lax.cond(
                finite, _apply, _skip, operand=None
            )
            new_state = state.replace(
                step=state.step + finite.astype(state.step.dtype),
                params=new_params,
                opt_state=new_opt,
                ema_params=new_ema,
            )
            logs = {
                "loss": loss,
                # reference logging: imfree_loss is the artificial-grid loss,
                # zero in the supervised branch (seg_criterion.py:190, :222-228)
                "imfree_loss": loss if unsupervised else jnp.zeros_like(loss),
                "gnorm": gnorm,
                "lr": self.schedule(state.step),
                "n_nonfinite": 1.0 - finite.astype(jnp.float32),
            }
            if not unsupervised:
                logs["seg_loss"] = loss
            if monitoring:
                mb0 = (
                    jax.tree_util.tree_map(lambda x: x[0], batch)
                    if ufreq > 1
                    else batch
                )
                mon = self._monitor(state.params, mb0)
                logs["seg_loss"] = mon.pop("nll_loss")
                logs["nll_loss"] = logs["seg_loss"]
                logs.update(mon)
            return new_state, logs

        bs = batch_sharding(self.mesh)
        self._base_rng = self._rng
        # shardings are committed on the state/batch arrays themselves
        # (init_state/_batch_to_arrays device_put), so jit infers the GSPMD
        # layout from its arguments; passing explicit in_shardings measurably
        # slowed the step on single-chip runs
        self._train_fn = jax.jit(step_fn, donate_argnums=(0,))
        self._batch_shard = bs

    def prepare_batch(self, batch) -> Dict[str, Any]:
        """Async host->device transfer of a batch (device_put returns
        immediately); call one batch ahead so the upload overlaps the current
        step's compute."""
        ufreq = max(self.cfg.optimization.update_freq, 1)
        return self._batch_to_arrays(batch, ufreq=ufreq)

    def train_step(self, batch) -> Dict[str, Any]:
        """batch: SegBatch or dict of numpy arrays (leading batch axis), or a
        device-resident dict from prepare_batch."""
        if self._train_fn is None:
            self._build_train_fn()
        arrays = self.prepare_batch(batch)
        self.state, logs = self._train_fn(self.state, arrays)
        return logs

    def compile_train_step(self, batch) -> None:
        """AOT-compile the jitted train step WITHOUT executing it — no
        collective runs, so no Gloo/NCCL communicator is initialised.

        Multi-process runs call this before the first ``train_step`` and then
        rendezvous at a coordination-service barrier: compilation skew between
        hosts can be minutes (cold cache, core-starved box), while the
        per-communicator Gloo key-value init that fires on the FIRST collective
        execution has a hard 30 s window (XLA GlooKeyValueStore).  Compiling
        first and barriering after bounds the skew at the communicator init to
        milliseconds.  The reference's analog is its NCCL init retry loop
        (custom_fairseq/fairseq/distributed/utils.py:262-291)."""
        if self._train_fn is None:
            self._build_train_fn()
        arrays = self.prepare_batch(batch)
        self._train_fn.lower(self.state, arrays).compile()

    def _batch_to_arrays(self, batch, ufreq: int = 1) -> Dict[str, Any]:
        if not isinstance(batch, dict):
            batch = {
                "patch_images": batch.patch_images,
                "src_tokens": batch.src_tokens,
                "bos_tokens": batch.bos_tokens,
                "target": batch.target,
                "downsampled_target": batch.downsampled_target,
                "aux_grid_ids": batch.aux_grid_ids,
                "aux_target": batch.aux_target,
            }
        if self._batch_shard is None:
            self._batch_shard = batch_sharding(self.mesh)
        nproc = jax.process_count()
        out = {}
        for k, v in batch.items():
            if v is None:
                continue
            if isinstance(v, jax.Array):
                # already device-resident (a prepare_batch output or a re-fed
                # batch): never pull it back to host — np.asarray on a device
                # array is a full round trip through the transfer path per
                # step.  With ufreq > 1 a prepared batch already carries the
                # (ufreq, B, ...) microbatch axis.
                out[k] = v
                continue
            v = np.asarray(v)
            if ufreq > 1:
                # (ufreq * B, ...) -> (ufreq, B, ...) for the accumulation scan
                v = v.reshape(ufreq, v.shape[0] // ufreq, *v.shape[1:])
                sharding = self._microbatch_shard(v)
                batch_dim = 1
            else:
                sharding = self._batch_shard(v)
                batch_dim = 0
            if nproc > 1:
                # Multi-process: each host loaded only its TSV slice
                # (data/file_dataset.py jax.process_index() sharding), so ``v``
                # holds global_batch/nproc rows.  Assemble the GLOBAL array —
                # each host's rows land on its addressable devices (the mesh
                # orders devices process-contiguously, parallel/mesh.py), no
                # cross-host transfer.  The reference's analog is the
                # rank-sliced sampler feeding each DDP replica
                # (file_dataset.py:40-45).
                gshape = list(v.shape)
                gshape[batch_dim] *= nproc
                out[k] = jax.make_array_from_process_local_data(
                    sharding, v, tuple(gshape)
                )
            else:
                out[k] = jax.device_put(v, sharding)
        return out

    def _microbatch_shard(self, v):
        from jax.sharding import NamedSharding, PartitionSpec as P

        return NamedSharding(
            self.mesh, P(None, ("data", "fsdp"), *([None] * (np.ndim(v) - 2)))
        )

    # ------------------------------------------------------------- valid step

    def _build_valid_fn(self):
        cfg = self.cfg
        hw16 = cfg.model.patch_image_size // 16

        def valid_fn(state: TrainState, batch):
            logits, _ = self.model.apply(
                {"params": state.params},
                src_tokens=batch["src_tokens"],
                patch_images=self._images(batch["patch_images"]),
                bos_tokens=batch["bos_tokens"],
                full_context_alignment=cfg.criterion.full_context_alignment,
                deterministic=True,
            )
            out = compute_monitor_outputs(
                logits,
                self._labels(batch["target"]),
                batch["downsampled_target"],
                cfg.model.num_seg_tokens,
                (hw16, hw16),
                cfg.criterion.label_smoothing,
            )
            out["loss"] = out["nll_loss"]
            return out

        self._valid_fn = jax.jit(valid_fn)

    def valid_step(self, batch) -> Dict[str, Any]:
        """Fixed-shape validation (train-res). Native-resolution eval lives in
        ifseg_tpu/eval/."""
        if self._valid_fn is None:
            self._build_valid_fn()
        return self._valid_fn(self.state, self._batch_to_arrays(batch))

    # ---------------------------------------------------------------- get/set

    def get_lr(self) -> float:
        return float(self.schedule(self.state.step))

    def set_lr_scale(self, scale: float) -> None:
        """Apply a ReduceLROnPlateau decision without recompiling the step
        (the scale is an optimizer-state scalar, train/optim.py)."""
        self.state = self.state.replace(
            opt_state=optim_lib.set_lr_scale(self.state.opt_state, scale)
        )

    def get_num_updates(self) -> int:
        return int(self.state.step)
