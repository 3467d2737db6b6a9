"""LR schedule + weights-only-resume fast-forward (VERDICT r4 weak-5).

Reference semantics: ``utils/lr.py:11-14`` — at each listed decay epoch the
LR becomes ``base * factor`` (factors are absolute multipliers of base, not
cumulative), recomputed every epoch from the CURRENT epoch number — so a
weights-only resume at a post-decay epoch trains at the decayed LR from its
first step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tramba_tpu.train.optim import (
    encoder_label_fn,
    fast_forward_schedule,
    make_optimizer,
    step_decay_schedule,
)


def test_step_decay_schedule_values():
    sched = step_decay_schedule(1e-4, [60], [0.2], steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(1e-4)
    assert float(sched(599)) == pytest.approx(1e-4)  # last step of epoch 59
    assert float(sched(600)) == pytest.approx(2e-5)  # first step of epoch 60
    assert float(sched(799)) == pytest.approx(2e-5)


def test_step_decay_factors_are_absolute_not_cumulative():
    sched = step_decay_schedule(1e-3, [30, 60], [0.5, 0.2], steps_per_epoch=1)
    assert float(sched(29)) == pytest.approx(1e-3)
    assert float(sched(45)) == pytest.approx(5e-4)   # base * 0.5
    assert float(sched(60)) == pytest.approx(2e-4)   # base * 0.2 (not 0.5*0.2)


def _count_leaves(opt_state):
    sched_counts, adam_counts = [], []

    def walk(s):
        if isinstance(s, optax.ScaleByScheduleState):
            sched_counts.append(int(s.count))
        elif isinstance(s, optax.ScaleByAdamState):
            adam_counts.append(int(s.count))
        if isinstance(s, tuple):
            for v in s:
                walk(v)
        elif isinstance(s, dict):
            for v in s.values():
                walk(v)

    walk(opt_state)
    return sched_counts, adam_counts


def test_fast_forward_touches_schedule_counts_only():
    params = {"encoder_w": jnp.ones((3,)), "head_w": jnp.ones((3,))}
    tx = make_optimizer(1e-4, [60], [0.2], steps_per_epoch=10)
    opt_state = tx.init(params)
    sched0, adam0 = _count_leaves(opt_state)
    assert sched0 and adam0 and all(c == 0 for c in sched0 + adam0)

    ff = fast_forward_schedule(opt_state, 650)
    sched1, adam1 = _count_leaves(ff)
    assert len(sched1) == len(sched0) and all(c == 650 for c in sched1)
    assert all(c == 0 for c in adam1)  # fresh moments keep fresh bias correction


@pytest.mark.parametrize("resumed", [False, True])
def test_resume_epoch_trains_at_decayed_lr(resumed):
    """One Adam update on fresh moments moves each param by exactly the
    schedule LR (mu_hat = g, nu_hat = g*g at count 1 -> update = lr*sign(g)),
    so the realized step size reads the LR the optimizer actually applied."""
    steps_per_epoch, resume_epoch = 10, 65
    params = {"head_w": jnp.ones((4,))}
    tx = make_optimizer(1e-4, [60], [0.2], steps_per_epoch=steps_per_epoch,
                        mu_dtype="float32")
    opt_state = tx.init(params)
    if resumed:
        opt_state = fast_forward_schedule(opt_state, resume_epoch * steps_per_epoch)
    grads = {"head_w": jnp.full((4,), 0.7)}
    updates, _ = tx.update(grads, opt_state, params)
    got = float(jnp.mean(jnp.abs(updates["head_w"])))
    want = 2e-5 if resumed else 1e-4
    assert got == pytest.approx(want, rel=1e-4)


def test_encoder_params_train_at_tenth_lr():
    params = {"encoder_w": jnp.ones((4,)), "head_w": jnp.ones((4,))}
    labels = encoder_label_fn(params)
    assert labels == {"encoder_w": "encoder", "head_w": "rest"}
    tx = make_optimizer(1e-4, [60], [0.2], steps_per_epoch=1, mu_dtype="float32")
    opt_state = tx.init(params)
    grads = jax.tree.map(lambda p: jnp.full_like(p, 0.3), params)
    updates, _ = tx.update(grads, opt_state, params)
    enc = float(jnp.mean(jnp.abs(updates["encoder_w"])))
    rest = float(jnp.mean(jnp.abs(updates["head_w"])))
    assert rest == pytest.approx(1e-4, rel=1e-4)
    assert enc == pytest.approx(1e-5, rel=1e-4)


def test_loop_weights_only_resume_fast_forwards_state(tmp_path):
    """The fit() weights-only branch itself: state.step and the schedule
    counters land at start_epoch * steps_per_epoch (here exercised through
    the same calls fit() makes, with the checkpoint epoch parsed from the
    reference-style best-MAE filename)."""
    from tramba_tpu.train import checkpoint as ckpt

    assert ckpt.epoch_from_filename("Tramba-V-TSOD_MAE_0.0310_65.pth") == 65
    steps_per_epoch = 7
    params = {"head_w": jnp.ones((2,))}
    tx = make_optimizer(1e-4, [60], [0.2], steps_per_epoch=steps_per_epoch)
    opt_state = tx.init(params)
    start_epoch = ckpt.epoch_from_filename("Tramba-V-TSOD_MAE_0.0310_65.pth")
    ff_step = start_epoch * steps_per_epoch
    ff = fast_forward_schedule(opt_state, ff_step)
    scheds, _ = _count_leaves(ff)
    assert all(c == ff_step for c in scheds)
    # and the printed LR (read from the same schedule) reflects the decay
    sched = step_decay_schedule(1e-4, [60], [0.2], steps_per_epoch)
    assert float(sched(start_epoch * steps_per_epoch)) == pytest.approx(2e-5)
