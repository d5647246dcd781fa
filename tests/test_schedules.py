"""LR schedule factory parity (`mPLUG/scheduler/scheduler_factory.py:10-90`):
timm tanh/step math as pure step schedules, endpoint + shape checks."""
import math

import numpy as np
import pytest

from crvqa_tpu.train.mplug_train import make_lr_schedule


def test_tanh_schedule_matches_timm_formula():
    lr, min_lr, warmup, total = 1e-4, 1e-6, 100, 1100
    s = make_lr_schedule("tanh", lr, warmup, total, min_lr)
    # warmup is linear
    np.testing.assert_allclose(float(s(50)), lr * 0.5, rtol=1e-6)
    # at warmup end: tr=0 -> lr_min + (lr-lr_min)/2 * (1 - tanh(-6)) ~ lr
    np.testing.assert_allclose(
        float(s(warmup)),
        min_lr + 0.5 * (lr - min_lr) * (1 - math.tanh(-6.0)), rtol=1e-5)
    # mid-point: tr=0.5 -> tanh(-1)
    np.testing.assert_allclose(
        float(s(warmup + 500)),
        min_lr + 0.5 * (lr - min_lr) * (1 - math.tanh(-6 * 0.5 + 4 * 0.5)),
        rtol=1e-5)
    # end: tr=1 -> tanh(4), near min_lr
    np.testing.assert_allclose(
        float(s(total)),
        min_lr + 0.5 * (lr - min_lr) * (1 - math.tanh(4.0)), rtol=1e-4)
    # monotone decay after warmup
    vals = [float(s(t)) for t in range(warmup, total, 100)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_step_schedule_decay_boundaries():
    lr, min_lr = 1e-3, 1e-7
    s = make_lr_schedule("step", lr, warmup=10, total=1000, min_lr=min_lr,
                         decay_rate=0.5, decay_steps=100)
    np.testing.assert_allclose(float(s(10)), lr, rtol=1e-6)
    np.testing.assert_allclose(float(s(109)), lr, rtol=1e-6)
    np.testing.assert_allclose(float(s(110)), lr * 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(s(310)), lr * 0.125, rtol=1e-6)
    assert float(s(5)) == pytest.approx(lr * 0.5, rel=1e-6)  # linear warmup


def test_cosine_schedule_endpoints():
    s = make_lr_schedule("cosine", 1e-4, 100, 1000, 1e-6)
    assert float(s(0)) == pytest.approx(0.0, abs=1e-9)
    np.testing.assert_allclose(float(s(100)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(s(1000)), 1e-6, rtol=1e-3)


def test_plateau_rejected():
    with pytest.raises(ValueError):
        make_lr_schedule("plateau", 1e-4, 100, 1000, 1e-6)


def test_optimizer_factory_surface():
    """Every non-fused optimizer of the reference timm factory
    (`optim_factory.py:56-127`) builds and moves params; unknown names and
    second-order/timm-only ones raise."""
    import jax
    import jax.numpy as jnp

    from crvqa_tpu.train.mplug_train import (
        MPlugTrainConfig, make_two_group_adamw)

    params = {"visual_encoder": {"w": jnp.ones((4, 4))},
              "text_encoder": {"w": jnp.ones((4, 4)), "bias": jnp.zeros(4)}}
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    for opt in ["sgd", "momentum", "adam", "adamw", "nadam", "radam",
                "adadelta", "adafactor", "rmsprop", "novograd", "lamb",
                "fused_adamw"]:
        cfg = MPlugTrainConfig(opt=opt, warmup_steps=1, total_steps=10)
        tx = make_two_group_adamw(cfg)
        st = tx.init(params)
        _, st = tx.update(grads, st, params)  # step 0: warmup lr == 0
        up, _ = tx.update(grads, st, params)  # step 1: lr at peak
        moved = jax.tree_util.tree_reduce(
            lambda a, x: a + float(jnp.abs(x).sum()), up, 0.0)
        assert moved > 0, opt

    # adahessian is the one pair-input transformation on the surface: init
    # works like the others, update takes (grads, hess)
    cfg = MPlugTrainConfig(opt="adahessian", warmup_steps=1, total_steps=10)
    tx = make_two_group_adamw(cfg)
    st = tx.init(params)
    _, st = tx.update((grads, grads), st, params)  # step 0: warmup lr == 0
    up, _ = tx.update((grads, grads), st, params)  # step 1: lr at peak
    assert jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), up, 0.0) > 0


def test_stepwise_fractional_interval():
    """Review finding (reproduced): the float-modulo trigger skipped most
    fractional-interval increments and the safety check spuriously raised
    at the MaskerScheduler default interval 0.1. The interval-count form is
    a pure function of the epoch."""
    from crvqa_tpu.masking.sparsity_control import stepwise_sparsity

    f = stepwise_sparsity(init_sparsity=0.1, final_sparsity=0.7,
                          interval_epoch=0.1, init_epoch=0.0,
                          final_epoch=15.0, sparsity_incremental_ratio=0.2)
    s = 0.1
    seen = [s]
    for e in np.arange(0.0, 15.0, 0.1):
        s = f(float(e), s)
        seen.append(s)
    assert s > 0.69                           # approaches 1 geometrically
    assert all(b >= a for a, b in zip(seen, seen[1:]))  # monotone
    # increments actually fire at fractional epochs
    assert f(0.35, 0.1) > f(0.05, 0.1)
    assert f(20.0, 0.1) == 0.7                # clamps at final
