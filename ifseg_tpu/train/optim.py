"""Optimizer stack: fairseq-exact Adam, cosine LR, freezing, grad clipping.

- ``fairseq_adam``: bit-matches custom_fairseq/fairseq/optim/adam.py:207-234 in
  fp32: m = b1*m + (1-b1)*g;  v = b2*v + (1-b2)*g^2;
  p -= wd*lr*p;  p -= lr*sqrt(1-b2^t)/(1-b1^t) * m/(sqrt(v)+eps).
  (Note: eps sits inside the bias-corrected denominator, unlike optax.adamw.)
- ``cosine_schedule``: optim/lr_scheduler/cosine_lr_scheduler.py:120-150 with
  period = total_num_updates (reinit :153-166), warmup_updates =
  int(total * warmup_ratio), warmup_init_lr = min_lr = 0, single period.
- ``freeze_mask``: parameter freezing policy from the run scripts
  (freeze-encoder/decoder/seg-embedding, freeze-entire-resnet;
  unify_transformer.py:362-373, encoder_module.py:264-295).  Frozen params get
  zero updates (and no optimizer state growth in the masked transform).
- ``clip_by_global_norm``: trainer.py:865-903 semantics — scale grads by
  clip_norm/max(norm, clip_norm); returns the pre-clip norm for logging.

The reference trains fp16 with dynamic loss scaling; on TPU we keep params and
optimizer state fp32 and compute in bf16 — bf16's fp32-range exponent removes
the overflow problem loss scaling solves, so no scaler is needed (SURVEY §7).
"""

import math
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def cosine_schedule(
    lr: float,
    total_num_updates: int,
    warmup_ratio: float = 0.0,
    warmup_updates: int = 0,
    min_lr: float = 0.0,
    warmup_init_lr: Optional[float] = None,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    if warmup_ratio > 0:
        warmup_updates = int(total_num_updates * warmup_ratio)
    if warmup_init_lr is None:
        warmup_init_lr = min_lr

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        wu = max(warmup_updates, 1)
        warm = warmup_init_lr + step * ((lr - warmup_init_lr) / wu)
        t_curr = step - warmup_updates
        t_i = max(total_num_updates - 0, 1)  # single period = total updates
        cos = min_lr + 0.5 * (lr - min_lr) * (
            1.0 + jnp.cos(jnp.pi * jnp.minimum(t_curr / t_i, 1.0))
        )
        return jnp.where(step < warmup_updates, warm, cos)

    return schedule


def inverse_sqrt_schedule(
    lr: float, warmup_updates: int = 4000, warmup_init_lr: float = 0.0
):
    """optim/lr_scheduler/inverse_square_root_schedule.py: linear warmup then
    lr * sqrt(warmup/step)."""

    def schedule(step):
        # step = completed updates BEFORE this one; matches fairseq where the
        # lr applied at update k+1 is step_update(k)'s value and update 1
        # runs at warmup_init_lr (trainer.set_num_updates after each update)
        step = jnp.asarray(step, jnp.float32)
        wu = max(warmup_updates, 1)
        warm = warmup_init_lr + step * ((lr - warmup_init_lr) / wu)
        decay = lr * jnp.sqrt(wu / jnp.maximum(step, 1.0))
        return jnp.where(step < wu, warm, decay)

    return schedule


def polynomial_decay_schedule(
    lr: float,
    total_num_updates: int,
    warmup_updates: int = 0,
    warmup_ratio: float = 0.0,
    end_learning_rate: float = 0.0,
    power: float = 1.0,
):
    """optim/lr_scheduler/polynomial_decay_schedule.py (with the reference's
    warmup_ratio extension :97-102)."""
    if warmup_ratio > 0:
        warmup_updates = int(total_num_updates * warmup_ratio)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr * jnp.minimum(step / max(warmup_updates, 1), 1.0)
        frac = jnp.clip(
            (total_num_updates - step) / max(total_num_updates - warmup_updates, 1),
            0.0, 1.0,
        )
        decay = (lr - end_learning_rate) * frac**power + end_learning_rate
        return jnp.where(step < warmup_updates, warm, decay)

    return schedule


def fixed_schedule(lr: float):
    return lambda step: jnp.asarray(lr, jnp.float32)


def manual_schedule(lr: float, epoch_boundaries=(), epoch_lrs=(), updates_per_epoch=1):
    """optim/lr_scheduler/manual_lr_scheduler.py: piecewise-constant lr from
    an explicit (epoch -> lr) table, here keyed by update via
    updates_per_epoch (static shapes: the table is baked into the jit).

    fairseq epochs are 1-indexed and ManualSchedule applies the lr of the
    largest key <= epoch at epoch *begin*, i.e. epoch e starts at update
    (e-1)*updates_per_epoch — hence the (b - 1) boundary."""
    bounds = jnp.asarray(
        [(b - 1) * updates_per_epoch for b in epoch_boundaries], jnp.float32
    )
    lrs = jnp.asarray((lr,) + tuple(epoch_lrs), jnp.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        idx = jnp.sum((step >= bounds).astype(jnp.int32)) if len(epoch_boundaries) else 0
        return lrs[idx]

    return schedule


def triangular_schedule(lr: float, max_lr: float, period: int = 1000,
                        shrink_factor: float = 1.0):
    """optim/lr_scheduler/triangular_lr_scheduler.py: cyclical lr between
    ``lr`` and ``max_lr`` with optional per-cycle shrink."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        cycle = jnp.floor(1.0 + step / (2.0 * period))
        x = jnp.abs(step / period - 2.0 * cycle + 1.0)
        shrink = shrink_factor ** (cycle - 1.0)
        return lr + (max_lr * shrink - lr) * jnp.maximum(0.0, 1.0 - x)

    return schedule


def tri_stage_schedule(lr: float, init_lr_scale: float = 0.01,
                       final_lr_scale: float = 0.01, warmup_steps: int = 0,
                       hold_steps: int = 0, decay_steps: int = 0):
    """optim/lr_scheduler/tri_stage_lr_scheduler.py: warmup -> hold ->
    exponential decay to final_lr_scale * lr."""
    init_lr = init_lr_scale * lr
    final_lr = final_lr_scale * lr

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = init_lr + (lr - init_lr) * jnp.minimum(
            step / max(warmup_steps, 1), 1.0
        )
        t_decay = jnp.clip(step - warmup_steps - hold_steps, 0.0, None)
        frac = jnp.minimum(t_decay / max(decay_steps, 1), 1.0)
        decay = lr * jnp.exp(jnp.log(jnp.maximum(final_lr_scale, 1e-12)) * frac)
        in_warm = step < warmup_steps
        in_hold = step < warmup_steps + hold_steps
        return jnp.where(in_warm, warm, jnp.where(in_hold, lr, decay))

    return schedule


class ReduceLROnPlateau:
    """optim/lr_scheduler/reduce_lr_on_plateau.py semantics as a host-side
    controller: call ``step(val_metric)`` after each validation; when the
    metric fails to improve for ``patience`` validations the lr SCALE shrinks
    by ``shrink``.  The scale lives in the optimizer state
    (FairseqAdamState.lr_scale) so the jitted step picks it up without
    recompiling — apply with ``trainer.set_lr_scale(sched.scale)``."""

    def __init__(self, shrink: float = 0.1, patience: int = 0,
                 threshold: float = 1e-4, maximize: bool = False):
        self.shrink = shrink
        self.patience = patience
        self.threshold = threshold
        self.maximize = maximize
        self.best = None
        self.bad_count = 0
        self.scale = 1.0

    def step(self, metric: float) -> float:
        better = (
            self.best is None
            or (self.maximize and metric > self.best + self.threshold)
            or (not self.maximize and metric < self.best - self.threshold)
        )
        if better:
            self.best = metric
            self.bad_count = 0
        else:
            self.bad_count += 1
            if self.bad_count > self.patience:
                self.scale *= self.shrink
                self.bad_count = 0
        return self.scale


SCHEDULERS = {
    "cosine": "cosine_schedule",
    "inverse_sqrt": "inverse_sqrt_schedule",
    "polynomial_decay": "polynomial_decay_schedule",
    "fixed": "fixed_schedule",
    "pass_through": "fixed_schedule",  # optim/lr_scheduler/pass_through.py
    "manual": "manual_schedule",
    "triangular": "triangular_schedule",
    "tri_stage": "tri_stage_schedule",
    "reduce_lr_on_plateau": "fixed_schedule (+ ReduceLROnPlateau host controller)",
}


def build_schedule(name: str, lr: float, total_num_updates: int, opt_cfg=None):
    if name == "cosine":
        return cosine_schedule(
            lr, total_num_updates,
            warmup_ratio=getattr(opt_cfg, "warmup_ratio", 0.0),
            warmup_updates=getattr(opt_cfg, "warmup_updates", 0),
        )
    if name == "inverse_sqrt":
        return inverse_sqrt_schedule(
            lr, warmup_updates=max(getattr(opt_cfg, "warmup_updates", 0), 1)
        )
    if name == "polynomial_decay":
        return polynomial_decay_schedule(
            lr, total_num_updates,
            warmup_updates=getattr(opt_cfg, "warmup_updates", 0),
            warmup_ratio=getattr(opt_cfg, "warmup_ratio", 0.0),
        )
    if name in ("fixed", "pass_through", "reduce_lr_on_plateau"):
        # plateau: the base lr is fixed, the ReduceLROnPlateau host
        # controller drives the optimizer-state lr scale
        return fixed_schedule(lr)
    if name == "triangular":
        return triangular_schedule(
            lr, max_lr=getattr(opt_cfg, "max_lr", 0.0) or lr * 10,
            period=getattr(opt_cfg, "lr_period_updates", 1000) or 1000,
            shrink_factor=getattr(opt_cfg, "lr_shrink", 1.0) or 1.0,
        )
    if name == "tri_stage":
        wu = getattr(opt_cfg, "warmup_updates", 0)
        hold = getattr(opt_cfg, "hold_updates", 0)
        return tri_stage_schedule(
            lr, warmup_steps=wu,
            hold_steps=hold,
            # decay spans only the post-hold remainder so final_lr_scale*lr
            # is actually reached by total_num_updates
            decay_steps=max(total_num_updates - wu - hold, 1),
        )
    if name == "manual":
        # "--manual-lr-schedule=epoch:lr,epoch:lr" (epoch2lr table); epochs
        # convert to update counts via total_num_updates / max_epoch
        spec = getattr(opt_cfg, "manual_lr_schedule", "") or ""
        boundaries, lrs = [], []
        for part in filter(None, (p.strip() for p in spec.split(","))):
            ep, _, v = part.partition(":")
            boundaries.append(int(ep))
            lrs.append(float(v))
        max_epoch = max(getattr(opt_cfg, "max_epoch", 1), 1)
        return manual_schedule(
            lr,
            epoch_boundaries=boundaries,
            epoch_lrs=lrs,
            updates_per_epoch=max(total_num_updates // max_epoch, 1),
        )
    raise ValueError(f"unknown lr scheduler {name}; known: {sorted(SCHEDULERS)}")


class DynamicLossScaler:
    """Dynamic loss scaling (optim/dynamic_loss_scaler.py:7) for fp16-parity
    experiments; bf16 training doesn't need it (fp32 exponent range), but the
    reference trains fp16 with --fp16-scale-window=512.

    Usage: scale the loss by ``.scale`` before backward, call ``.update``
    with whether grads overflowed; skip the update on overflow."""

    def __init__(
        self,
        init_scale: float = 2.0**7,
        scale_window: int = 512,
        scale_factor: float = 2.0,
        min_loss_scale: float = 1e-4,
        tolerance: float = 0.0,
    ):
        self.scale = init_scale
        self.scale_window = scale_window
        self.scale_factor = scale_factor
        self.min_loss_scale = min_loss_scale
        self.tolerance = tolerance
        self._iter = 0
        self._last_overflow_iter = -1
        self._overflows_since_rescale = 0

    def update(self, overflow: bool) -> bool:
        """Returns True when the step should be SKIPPED."""
        self._iter += 1
        if overflow:
            self._overflows_since_rescale += 1
            pct = self._overflows_since_rescale / max(
                self._iter - self._last_overflow_iter, 1
            )
            if pct >= self.tolerance:
                self.scale = max(self.scale / self.scale_factor, self.min_loss_scale)
                self._last_overflow_iter = self._iter
                self._overflows_since_rescale = 0
            return True
        if (self._iter - self._last_overflow_iter) % self.scale_window == 0:
            self.scale *= self.scale_factor
        return False


def adafactor(learning_rate: Callable, weight_decay: float = 0.0):
    """Factored second-moment optimizer (optim/adafactor.py) via optax."""
    tx = optax.adafactor(learning_rate=learning_rate, weight_decay_rate=weight_decay or None)
    return tx


class FairseqAdamState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any
    # host-adjustable multiplier on the schedule (ReduceLROnPlateau's lever;
    # lives in optimizer state so changing it doesn't recompile the step).
    # No array default: a concrete-array default would run at import time
    # and initialize the XLA backend, breaking jax.distributed.initialize
    # for any multi-process entrypoint that imports the package first.
    lr_scale: jnp.ndarray = None


def fairseq_adam(
    learning_rate: Callable,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """Returns updates = -(wd*lr*p + lr*bc*m/(sqrt(v)+eps)); apply with
    plain additive apply_updates."""

    def init(params):
        z = lambda p: jnp.zeros_like(p, dtype=jnp.float32)
        return FairseqAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(z, params),
            nu=jax.tree_util.tree_map(z, params),
            lr_scale=jnp.ones((), jnp.float32),
        )

    def update(grads, state, params):
        count = state.count + 1
        t = count.astype(jnp.float32)
        lr = learning_rate(state.count) * state.lr_scale
        bc = jnp.sqrt(1.0 - b2**t) / (1.0 - b1**t)

        tm = jax.tree_util.tree_map
        mu = tm(lambda g, m: b1 * m + (1.0 - b1) * g.astype(jnp.float32), grads, state.mu)
        nu = tm(
            lambda g, v: b2 * v + (1.0 - b2) * jnp.square(g.astype(jnp.float32)),
            grads,
            state.nu,
        )

        def step(m, v, p):
            s = lr * bc * m / (jnp.sqrt(v) + eps)
            if weight_decay != 0.0:
                s = s + weight_decay * lr * p.astype(jnp.float32)
            return (-s).astype(p.dtype)

        updates = tm(step, mu, nu, params)
        return updates, FairseqAdamState(count, mu, nu, state.lr_scale)

    return optax.GradientTransformation(init, update)


class LambState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any


def lamb(
    learning_rate: Callable,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """LAMB (optim/fused_lamb.py -> apex FusedLAMB semantics): Adam moments
    with bias correction, decoupled weight decay inside the update, and a
    per-tensor trust ratio ||p|| / ||update|| scaling the step."""

    def init(params):
        z = lambda p: jnp.zeros_like(p, dtype=jnp.float32)
        return LambState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(z, params),
            nu=jax.tree_util.tree_map(z, params),
        )

    def update(grads, state, params):
        count = state.count + 1
        t = count.astype(jnp.float32)
        lr = learning_rate(state.count)
        tm = jax.tree_util.tree_map
        mu = tm(lambda g, m: b1 * m + (1 - b1) * g.astype(jnp.float32), grads, state.mu)
        nu = tm(
            lambda g, v: b2 * v + (1 - b2) * jnp.square(g.astype(jnp.float32)),
            grads, state.nu,
        )

        def step(m, v, p):
            mhat = m / (1.0 - b1**t)
            vhat = v / (1.0 - b2**t)
            u = mhat / (jnp.sqrt(vhat) + eps)
            p32 = p.astype(jnp.float32)
            if weight_decay != 0.0:
                u = u + weight_decay * p32
            pn = jnp.linalg.norm(p32)
            un = jnp.linalg.norm(u)
            trust = jnp.where((pn > 0.0) & (un > 0.0), pn / un, 1.0)
            return (-lr * trust * u).astype(p.dtype)

        return tm(step, mu, nu, params), LambState(count, mu, nu)

    return optax.GradientTransformation(init, update)


def _single_optimizer(name: str, schedule, opt_cfg):
    """One optimizer by reference name (optim/ registry)."""
    wd = getattr(opt_cfg, "weight_decay", 0.0)
    betas = getattr(opt_cfg, "adam_betas", (0.9, 0.999))
    if name == "adam":
        return fairseq_adam(
            schedule, b1=betas[0], b2=betas[1],
            eps=getattr(opt_cfg, "adam_eps", 1e-8), weight_decay=wd,
        )
    if name == "adafactor":
        return adafactor(schedule, wd)
    if name in ("lamb", "fused_lamb"):
        return lamb(schedule, b1=betas[0], b2=betas[1], weight_decay=wd)
    if name == "sgd":
        return optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.sgd(schedule, momentum=getattr(opt_cfg, "momentum", 0.0) or None),
        )
    if name == "nag":
        return optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.sgd(
                schedule, momentum=getattr(opt_cfg, "momentum", 0.99), nesterov=True
            ),
        )
    if name == "adagrad":
        return optax.adagrad(schedule)
    if name == "adadelta":
        return optax.adadelta(schedule)
    if name == "adamax":
        return optax.adamax(schedule, b1=betas[0], b2=betas[1])
    raise ValueError(f"unknown optimizer {name}")


def parse_composite_groups(spec: str):
    """``regex=opt@lr,regex=opt@lr,...`` -> [(regex, opt, lr|None)].  First
    matching regex wins; params matching no group use the base optimizer.
    Commas inside ``{...}`` belong to regex quantifiers (``layers_[0-9]{1,2}``)
    and do not split groups."""
    import re

    groups = []
    for part in filter(None, (p.strip() for p in re.split(r",(?![^{]*\})", spec))):
        pattern, rhs = part.split("=", 1)
        opt, _, lr = rhs.partition("@")
        groups.append((pattern, opt, float(lr) if lr else None))
    return groups


def composite(params, groups, base_name, opt_cfg, total_num_updates):
    """optim/composite.py: route parameter groups to distinct optimizers
    (and lrs/schedules).  Groups are selected by regex on the '/'-joined
    param path; unmatched params fall through to the base optimizer."""
    import re

    sched_for = lambda lr: build_schedule(
        getattr(opt_cfg, "lr_scheduler", "cosine"), lr, total_num_updates, opt_cfg
    )
    transforms = {
        "base": _single_optimizer(base_name, sched_for(opt_cfg.lr), opt_cfg)
    }
    for i, (pattern, opt, lr) in enumerate(groups):
        transforms[f"g{i}"] = _single_optimizer(
            opt, sched_for(opt_cfg.lr if lr is None else lr), opt_cfg
        )

    compiled = [(re.compile(p), f"g{i}") for i, (p, _, _) in enumerate(groups)]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label(path):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        for rx, lab in compiled:
            if rx.search(name):
                return lab
        return "base"

    labels_flat = [label(path) for path, _ in flat]
    labels = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params), labels_flat
    )
    return optax.multi_transform(transforms, labels)


class LrScaleState(NamedTuple):
    """Wrapper state for ReduceLROnPlateau: a host-adjustable multiplier on
    the final updates.  Updates are linear in lr for every optimizer here
    (adam/lamb/sgd/...), so scaling the update equals scaling the lr —
    and it works for ALL of them, not just fairseq_adam."""

    lr_scale: jnp.ndarray
    inner: Any


def with_lr_scale(inner: optax.GradientTransformation) -> optax.GradientTransformation:
    def init(params):
        return LrScaleState(jnp.ones((), jnp.float32), inner.init(params))

    def update(grads, state, params):
        updates, new_inner = inner.update(grads, state.inner, params)
        s = state.lr_scale
        updates = jax.tree_util.tree_map(
            lambda u: u * s.astype(u.dtype), updates
        )
        return updates, LrScaleState(s, new_inner)

    return optax.GradientTransformation(init, update)


def set_lr_scale(opt_state, scale: float):
    """Replace the lr_scale scalar in LrScaleState (any optimizer) or
    FairseqAdamState leaves — the ReduceLROnPlateau application hook."""
    is_node = lambda n: isinstance(n, (LrScaleState, FairseqAdamState))

    def repl(node):
        if is_node(node):
            return node._replace(lr_scale=jnp.asarray(scale, jnp.float32))
        return node

    return jax.tree_util.tree_map(repl, opt_state, is_leaf=is_node)


def clip_by_global_norm(grads, clip_norm: float):
    """Pre-clip global norm + clipped grads (fairseq clip_grad_norm_)."""
    leaves = jax.tree_util.tree_leaves(grads)
    gnorm = jnp.sqrt(
        sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves)
    )
    if clip_norm <= 0:
        return grads, gnorm
    scale = clip_norm / jnp.maximum(gnorm, clip_norm)
    return jax.tree_util.tree_map(lambda g: g * scale.astype(g.dtype), grads), gnorm


# ------------------------------------------------------------------- freezing


def freeze_mask(params, model_cfg) -> Any:
    """True = trainable, following the reference freeze flags.

    - freeze_encoder_embedding / freeze_decoder_embedding: shared
      ``embed_tokens`` (unify_transformer.py:362-369)
    - freeze_seg_embedding: decoder ``seg_embed_tokens`` (+ untied
      ``seg_projection``) (unify_transformer.py:370-373)
    - freeze_entire_resnet: all ``embed_images`` params + encoder image_proj
      stays trainable (encoder_module.py:283-295 freezes resnet only)
    - FrozenBN statistics are always frozen (frozen_bn.py)
    """
    prompt_tuning = getattr(model_cfg, "encoder_prompt", False) or getattr(
        model_cfg, "decoder_prompt", False
    )

    def trainable(path) -> bool:
        keys = [getattr(p, "key", str(p)) for p in path]
        joined = "/".join(str(k) for k in keys)
        if getattr(model_cfg, "bitfit", False):
            # BitFit: ONLY layer-norm and FFN biases train; overrides every
            # other freeze flag (reference train.py:101-107 resets
            # requires_grad on all named parameters).
            return joined.endswith("bias") and (
                "layer_norm" in joined or "/fc" in joined
            )
        if prompt_tuning:
            # prefix tuning freezes the whole model except the prompt
            # encoders (and adapters when enabled)
            # (unify_transformer.py:378-390)
            if "prompt_encoder" in joined:
                return True
            if getattr(model_cfg, "adapter", False) and "/adapter/" in joined:
                return True
            return False
        # NB: exact path-segment match — "embed_tokens" as a substring of
        # the joined path would also catch decoder/seg_embed_tokens, silently
        # freezing the seg head under the (default-on) embedding freezes
        is_shared_embed = "embed_tokens" in [str(k) for k in keys]
        if getattr(model_cfg, "adapter", False) and is_shared_embed:
            # adapters freeze the shared embeddings (unify_transformer.py:366-371)
            return False
        if is_shared_embed and (
            model_cfg.freeze_encoder_embedding or model_cfg.freeze_decoder_embedding
        ):
            return False
        if model_cfg.freeze_seg_embedding and (
            "seg_embed_tokens" in joined or joined.endswith("seg_projection")
        ):
            return False
        if model_cfg.freeze_entire_resnet and "embed_images" in joined:
            return False
        if model_cfg.freeze_resnet and "embed_images" in joined:
            return False
        # FrozenBN buffers (running stats) never train even when resnet does
        if "running_mean" in joined or "running_var" in joined:
            return False
        if model_cfg.freeze_encoder_transformer and "encoder/layers_" in joined:
            return False
        if model_cfg.freeze_encoder_transformer_layers > 0:
            for i in range(model_cfg.freeze_encoder_transformer_layers):
                if f"encoder/layers_{i}/" in joined + "/":
                    return False
        return True

    return jax.tree_util.tree_map_with_path(lambda p, _: trainable(p), params)


def masked(tx: optax.GradientTransformation, mask) -> optax.GradientTransformation:
    return optax.masked(tx, mask)


def build_optimizer(params, model_cfg, opt_cfg, total_num_updates: int):
    """Full training transform: freeze mask -> optimizer(+wd) -> done.
    Clipping happens outside (needs the raw grad norm for logging)."""
    schedule = build_schedule(
        getattr(opt_cfg, "lr_scheduler", "cosine"),
        opt_cfg.lr,
        total_num_updates,
        opt_cfg,
    )
    opt_name = getattr(opt_cfg, "optimizer", "adam")
    if opt_name == "composite":
        inner = composite(
            params,
            parse_composite_groups(getattr(opt_cfg, "composite_groups", "")),
            getattr(opt_cfg, "composite_base", "adam"),
            opt_cfg,
            total_num_updates,
        )
    else:
        inner = _single_optimizer(opt_name, schedule, opt_cfg)
    mask = freeze_mask(params, model_cfg)
    labels = jax.tree_util.tree_map(lambda t: "train" if t else "freeze", mask)
    tx = optax.multi_transform(
        {"train": inner, "freeze": optax.set_to_zero()}, labels
    )
    if getattr(opt_cfg, "lr_scheduler", "") == "reduce_lr_on_plateau":
        # host-adjustable scale on the final updates so the plateau
        # controller works with every optimizer (not just fairseq_adam)
        tx = with_lr_scale(tx)
    return tx, schedule, mask
