"""Optimizer policy: Adam with 10x lower encoder LR and step decay.

Reference: ``train.py:266-280`` (params whose name contains "encoder" train
at lr*0.1) and ``utils/lr.py:1-17`` (multiply lr by ``rate`` at each listed
decay epoch; default schedule: x0.2 at epoch 60 over 80 epochs).
"""

from __future__ import annotations

from typing import Sequence

import optax

__all__ = ["step_decay_schedule", "make_optimizer", "encoder_label_fn",
           "fast_forward_schedule"]


def step_decay_schedule(base_lr: float, decay_epochs: Sequence[int], decay_factors, steps_per_epoch: int):
    """lr = base * factor_of_last_passed_decay_epoch (utils/lr.py:11-14 —
    factors are absolute multipliers of base_lr, not cumulative)."""
    import jax.numpy as jnp

    if not hasattr(decay_factors, "__len__"):
        decay_factors = [decay_factors] * len(decay_epochs)
    assert len(decay_epochs) == len(decay_factors)
    pairs = sorted(zip([int(e) for e in decay_epochs], [float(f) for f in decay_factors]))

    def schedule(step):
        epoch = step // steps_per_epoch
        factor = jnp.ones((), jnp.float32)
        for e, f in pairs:
            factor = jnp.where(epoch >= e, jnp.float32(f), factor)
        return base_lr * factor

    return schedule


def fast_forward_schedule(opt_state, step: int):
    """Set every LR-schedule counter (``ScaleByScheduleState.count``) in an
    optax state tree to ``step``.

    The weights-only ``--resume <path>`` branch restores params but builds a
    FRESH optimizer state, whose schedule counter restarts at 0 — resuming an
    80-epoch run at epoch 65 would train at the pre-decay LR until the count
    caught up.  The reference recomputes LR from the resume epoch instead
    (``utils/lr.py:11-14`` applied per epoch, ``train.py:223-227``), so the
    counter must be fast-forwarded to ``start_epoch * steps_per_epoch``.
    Adam's moment counter (``ScaleByAdamState.count``) is deliberately LEFT
    at 0: the moments themselves are fresh, and bias correction must match —
    exactly the reference's fresh ``torch.optim.Adam`` on a weights-only
    resume."""
    import jax.numpy as jnp

    count = jnp.asarray(step, jnp.int32)

    def ff(s):
        if isinstance(s, optax.ScaleByScheduleState):
            return s._replace(count=count)
        if isinstance(s, tuple) and hasattr(s, "_fields"):  # NamedTuple states
            return type(s)(*(ff(v) for v in s))
        if isinstance(s, (tuple, list)):
            return type(s)(ff(v) for v in s)
        if isinstance(s, dict):
            return {k: ff(v) for k, v in s.items()}
        return s

    return ff(opt_state)


def encoder_label_fn(params) -> dict:
    """Label each top-level-path param 'encoder' or 'rest' (train.py:267-278)."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label_tree(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "encoder" if "encoder" in jax.tree_util.keystr(path).lower() else "rest",
            tree,
        )

    del flat
    return label_tree(params)


def make_optimizer(
    base_lr: float = 1e-4,
    decay_epochs: Sequence[int] = (60,),
    decay_rate=0.2,
    steps_per_epoch: int = 1,
    encoder_lr_scale: float = 0.1,
    params=None,
    mu_dtype=None,
):
    """``mu_dtype``: storage dtype for Adam's first moment (e.g. 'bfloat16'
    halves that state's HBM read+write in the update pass; the second moment
    stays fp32 — its rsqrt is the numerically sensitive half)."""
    sched = step_decay_schedule(base_lr, decay_epochs, decay_rate, steps_per_epoch)
    enc_sched = step_decay_schedule(base_lr * encoder_lr_scale, decay_epochs, decay_rate, steps_per_epoch)
    tx = optax.multi_transform(
        {"encoder": optax.adam(enc_sched, mu_dtype=mu_dtype),
         "rest": optax.adam(sched, mu_dtype=mu_dtype)},
        encoder_label_fn,
    )
    return tx
