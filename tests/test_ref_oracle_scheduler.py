"""Reference-oracle parity: the mPLUG LR trajectory.

Replays the reference's ACTUAL scheduler driving — vendored timm schedulers
(`mPLUG/scheduler/{cosine_lr,tanh_lr,step_lr}.py`) built by
`scheduler_factory.create_scheduler`, stepped exactly like
`mPLUG/vqa_mplug.py`: warmup advanced one unit per 100 iterations of epoch 0
(`:145-146,200-201`) and `lr_scheduler.step(epoch + warmup_epochs)` at every
epoch end (`:431`) — and asserts `train.mplug_train.timm_epoch_schedule`
produces the identical per-step LR for every global step.
"""
import sys
import types

import numpy as np
import pytest

import ref_oracle

from crvqa_tpu.train.mplug_train import timm_epoch_schedule

torch = ref_oracle.install()

ref_oracle.add_mplug_path()

STEP_SIZE = 100


def _ref_lr_trajectory(sched, spe, epochs, warmup_epochs, lr, min_lr,
                       decay_rate=1.0, decay_epochs=1, warmup_lr=1e-5):
    """Per-global-step LR the reference loop runs at."""
    from scheduler import create_scheduler

    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=lr)
    args = types.SimpleNamespace(
        sched=sched, epochs=epochs, min_lr=min_lr, decay_rate=decay_rate,
        warmup_lr=warmup_lr, warmup_epochs=warmup_epochs, cooldown_epochs=0,
        decay_epochs=decay_epochs, patience_epochs=0)
    scheduler, _ = create_scheduler(args, opt)

    warmup_iterations = warmup_epochs * STEP_SIZE
    lrs = []
    for epoch in range(epochs):
        for i in range(spe):
            lrs.append(opt.param_groups[0]["lr"])
            # vqa_mplug.py:200-201 — scheduler advanced AFTER the optimizer
            # update of iteration i
            if epoch == 0 and i % STEP_SIZE == 0 and i <= warmup_iterations:
                scheduler.step(i // STEP_SIZE)
        scheduler.step(epoch + warmup_epochs)  # vqa_mplug.py:431
    return np.asarray(lrs, np.float64)


CASES = [
    # the shipped yaml config (full_model_debias.yaml schedular block)
    dict(sched="cosine", spe=437, epochs=8, warmup_epochs=4, lr=3e-5,
         min_lr=1e-6, decay_rate=1.0),
    # epoch 0 too short for the full warmup ladder (only sub-steps 0..1 fire)
    dict(sched="cosine", spe=150, epochs=5, warmup_epochs=4, lr=3e-5,
         min_lr=1e-6, decay_rate=1.0),
    # no warmup at all
    dict(sched="cosine", spe=120, epochs=4, warmup_epochs=0, lr=1e-4,
         min_lr=1e-6, decay_rate=1.0),
    # tanh: warmup_prefix=False AND the warmup ramps to tanh(warmup_t)
    dict(sched="tanh", spe=250, epochs=6, warmup_epochs=2, lr=5e-5,
         min_lr=1e-6, decay_rate=1.0),
    # step: raw clock, no min_lr floor
    dict(sched="step", spe=120, epochs=6, warmup_epochs=1, lr=2e-5,
         min_lr=1e-6, decay_rate=0.5, decay_epochs=2),
]


@pytest.mark.parametrize("case", CASES,
                         ids=[f"{c['sched']}-spe{c['spe']}-w{c['warmup_epochs']}"
                              for c in CASES])
def test_timm_epoch_schedule_oracle(case):
    ref = _ref_lr_trajectory(**case)
    sched = timm_epoch_schedule(
        case["sched"], case["lr"], case["warmup_epochs"], case["epochs"],
        case["min_lr"], case["spe"], decay_rate=case["decay_rate"],
        decay_epochs=case.get("decay_epochs", 1), warmup_lr_init=1e-5,
        step_size=STEP_SIZE)
    ours = np.asarray([float(sched(s)) for s in range(len(ref))], np.float64)
    np.testing.assert_allclose(ours, ref, rtol=2e-6, atol=1e-12,
                               err_msg=case["sched"])
    # the trajectory is non-trivial: warmup present when requested, and the
    # final-epoch lr sits strictly below the peak
    if case["warmup_epochs"]:
        assert ref[0] == pytest.approx(1e-5)
    assert ref[-1] < case["lr"]
