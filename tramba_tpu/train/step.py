"""pjit training / eval steps.

One jitted SPMD step over a ``Mesh``: inputs sharded on the 'data' axis,
parameters replicated; XLA inserts the gradient psum that plays the role of
the DDP all-reduce the reference never had (SURVEY.md §2.11).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from tramba_tpu.train.loss import deep_supervision_loss

__all__ = ["TrainState", "create_train_state", "make_train_step", "make_eval_step"]


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)


def create_train_state(model, params, tx) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )


def make_train_step(donate: bool = True):
    """Returns step(state, images, gts, rng) -> (state, metrics)."""

    def step(state: TrainState, images, gts, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            outs = state.apply_fn(params, images, deterministic=False, rngs={"dropout": rng})
            return deep_supervision_loss(outs, gts)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params, opt_state=new_opt)
        return new_state, {"loss": loss}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step():
    """Returns eval(state, images) -> full-resolution sigmoid saliency maps."""

    def step(state: TrainState, images):
        outs = state.apply_fn(state.params, images, deterministic=True)
        return jax.nn.sigmoid(outs[-1].astype(jnp.float32))

    return jax.jit(step)
