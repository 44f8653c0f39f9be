"""Round-2 LR scheduler additions (optim/lr_scheduler coverage):
pass_through, manual, triangular, tri_stage, reduce_lr_on_plateau."""

import numpy as np
import pytest

import jax.numpy as jnp

from ifseg_tpu.train.optim import (
    ReduceLROnPlateau,
    build_schedule,
    manual_schedule,
    set_lr_scale,
    tri_stage_schedule,
    triangular_schedule,
    fairseq_adam,
)


def test_manual_schedule_piecewise():
    s = manual_schedule(0.1, epoch_boundaries=(2, 5), epoch_lrs=(0.05, 0.01),
                        updates_per_epoch=10)
    # fairseq epochs are 1-indexed: epoch 2 starts at update 10
    assert np.isclose(float(s(0)), 0.1)
    assert np.isclose(float(s(9)), 0.1)
    assert np.isclose(float(s(10)), 0.05)
    assert np.isclose(float(s(40)), 0.01)


def test_triangular_cycles():
    s = triangular_schedule(0.01, max_lr=0.1, period=100)
    assert np.isclose(float(s(0)), 0.01)
    assert np.isclose(float(s(100)), 0.1)
    assert np.isclose(float(s(200)), 0.01)
    assert float(s(50)) > float(s(0))


def test_tri_stage_phases():
    s = tri_stage_schedule(0.1, init_lr_scale=0.01, final_lr_scale=0.01,
                           warmup_steps=10, hold_steps=10, decay_steps=100)
    assert np.isclose(float(s(0)), 0.001)
    assert np.isclose(float(s(10)), 0.1)
    assert np.isclose(float(s(15)), 0.1)  # hold
    assert np.isclose(float(s(120)), 0.001, rtol=1e-3)  # fully decayed


def test_tri_stage_hold_reaches_final_by_total():
    import types

    cfg = types.SimpleNamespace(warmup_updates=10, hold_updates=20)
    s = build_schedule("tri_stage", 0.1, total_num_updates=100, opt_cfg=cfg)
    # decay must span total - warmup - hold so final_lr_scale*lr (0.001)
    # is reached at total_num_updates even with a nonzero hold phase
    assert float(s(100)) == pytest.approx(0.001, rel=1e-3)


def test_build_schedule_new_names():
    for name in ("pass_through", "manual", "triangular", "tri_stage",
                 "reduce_lr_on_plateau"):
        s = build_schedule(name, 0.01, 100, None)
        assert np.isfinite(float(s(0)))


def test_plateau_controller_and_lr_scale():
    sched = ReduceLROnPlateau(shrink=0.5, patience=1, maximize=True)
    assert sched.step(0.5) == 1.0  # first observation
    assert sched.step(0.6) == 1.0  # improved
    assert sched.step(0.55) == 1.0  # 1 bad (within patience)
    assert sched.step(0.55) == 0.5  # 2 bad -> shrink
    assert sched.step(0.9) == 0.5  # improvement keeps current scale

    # the scale reaches the adam update through the optimizer state
    tx = fairseq_adam(lambda step: jnp.asarray(0.1, jnp.float32))
    params = {"w": jnp.ones((4,), jnp.float32)}
    grads = {"w": jnp.ones((4,), jnp.float32)}
    st = tx.init(params)
    up_full, _ = tx.update(grads, st, params)
    st_half = set_lr_scale(st, 0.5)
    up_half, _ = tx.update(grads, st_half, params)
    np.testing.assert_allclose(
        np.asarray(up_half["w"]), 0.5 * np.asarray(up_full["w"]), rtol=1e-6
    )


def test_manual_schedule_from_config():
    import types

    from ifseg_tpu.train.optim import build_schedule

    cfg = types.SimpleNamespace(
        lr_scheduler="manual", manual_lr_schedule="2:0.01, 4:0.001",
        max_epoch=10, warmup_updates=0, warmup_ratio=0.0,
    )
    # 10 epochs x 10 updates each; epochs are 1-indexed so epoch e starts
    # at update (e-1)*10
    s = build_schedule("manual", 0.1, total_num_updates=100, opt_cfg=cfg)
    assert float(s(0)) == pytest.approx(0.1)
    assert float(s(9)) == pytest.approx(0.1)       # epoch 1
    assert float(s(10)) == pytest.approx(0.01)     # epoch 2 begins
    assert float(s(29)) == pytest.approx(0.01)
    assert float(s(30)) == pytest.approx(0.001)    # epoch 4 begins
    assert float(s(99)) == pytest.approx(0.001)


def test_triangular_schedule_from_config():
    import types

    from ifseg_tpu.train.optim import build_schedule

    cfg = types.SimpleNamespace(
        lr_scheduler="triangular", max_lr=0.2, lr_period_updates=10,
        lr_shrink=1.0, warmup_updates=0, warmup_ratio=0.0,
    )
    s = build_schedule("triangular", 0.1, total_num_updates=100, opt_cfg=cfg)
    assert float(s(0)) == pytest.approx(0.1)
    assert float(s(10)) == pytest.approx(0.2)   # peak at half period
    assert float(s(20)) == pytest.approx(0.1)   # back to base


def test_plateau_scale_applies_to_any_optimizer():
    """ReduceLROnPlateau must scale updates for non-adam optimizers too
    (the scale wrapper), and must not double-apply for adam."""
    import types

    import jax
    from ifseg_tpu.train.optim import build_optimizer, set_lr_scale

    params = {"w": jnp.ones((4,))}
    grads = {"w": jnp.full((4,), 1.0)}
    model_cfg = types.SimpleNamespace(
        bitfit=False, encoder_prompt=False, decoder_prompt=False, adapter=False,
        freeze_encoder_embedding=False, freeze_decoder_embedding=False,
        freeze_seg_embedding=False, freeze_entire_resnet=False,
        freeze_resnet=False, freeze_encoder_transformer=False,
        freeze_encoder_transformer_layers=0,
    )
    for opt in ("sgd", "adam"):
        cfg = types.SimpleNamespace(
            lr=0.1, optimizer=opt, lr_scheduler="reduce_lr_on_plateau",
            warmup_ratio=0.0, warmup_updates=0, weight_decay=0.0,
            adam_betas=(0.9, 0.999), adam_eps=1e-8, momentum=0.0,
            composite_groups="", composite_base="adam", lr_shrink=0.1,
            lr_patience=0,
        )
        tx, schedule, mask = build_optimizer(params, model_cfg, cfg, 10)
        state = tx.init(params)
        base_upd, _ = tx.update(grads, state, params)
        state2 = set_lr_scale(state, 0.5)
        half_upd, _ = tx.update(grads, state2, params)
        ratio = float(half_upd["w"][0]) / float(base_upd["w"][0])
        assert ratio == pytest.approx(0.5, rel=1e-5), (opt, ratio)
