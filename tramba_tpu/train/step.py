"""pjit training / eval steps.

One jitted SPMD step over a ``Mesh``: inputs sharded on the 'data' axis,
parameters replicated; XLA inserts the gradient psum that plays the role of
the DDP all-reduce the reference never had (SURVEY.md §2.11).  Models with
auxiliary variable collections (BatchNorm running stats) thread them through
``model_state``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import freeze, unfreeze

from tramba_tpu.train.loss import deep_supervision_loss

__all__ = ["TrainState", "create_train_state", "make_train_step", "make_eval_step"]


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    model_state: Dict  # auxiliary collections (e.g. batch_stats); {} if none
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)


def create_train_state(model, variables, tx) -> TrainState:
    """``variables``: the full init() output ({'params': ..., [collections]})."""
    variables = unfreeze(variables)
    params = variables.pop("params")
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        model_state=variables,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )


def make_train_step(donate: bool = True, null_loss: bool = False):
    """Returns step(state, images, gts, rng, valid) -> (state, metrics).

    ``valid``: (B,) 0/1 weights masking padded rows of a partial final batch.
    ``null_loss``: floor-measurement only — replace the deep-supervision
    loss chain (per-head bilinear upsample + BCE + IoU, fwd AND bwd) with a
    trivial mean of the head outputs, so an interleaved A/B against the real
    step (scripts/train_step_bench.py --ab_loss) measures what the loss
    chain costs inside the fused step.  Trains nothing meaningful.
    """

    def step(state: TrainState, images, gts, rng, valid=None):
        rng = jax.random.fold_in(rng, state.step)
        mutable = list(state.model_state.keys())

        def loss_fn(params):
            variables = {"params": params, **state.model_state}
            if mutable:
                outs, new_mstate = state.apply_fn(
                    variables, images, deterministic=False, rngs={"dropout": rng}, mutable=mutable
                )
            else:
                outs = state.apply_fn(variables, images, deterministic=False, rngs={"dropout": rng})
                new_mstate = state.model_state
            if null_loss:
                loss = sum(jnp.mean(o.astype(jnp.float32)) for o in outs)
                return loss + 0.0 * jnp.mean(gts.astype(jnp.float32)), new_mstate
            return deep_supervision_loss(outs, gts, valid), new_mstate

        (loss, new_mstate), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=new_params, model_state=unfreeze(freeze(new_mstate)),
            opt_state=new_opt,
        )
        return new_state, {"loss": loss}

    from tramba_tpu.utils.jit import compiler_options

    return jax.jit(step, donate_argnums=(0,) if donate else (),
                   compiler_options=compiler_options())


def make_eval_step():
    """Returns eval(state, images) -> full-resolution sigmoid saliency maps."""

    def step(state: TrainState, images):
        variables = {"params": state.params, **state.model_state}
        outs = state.apply_fn(variables, images, deterministic=True)
        return jax.nn.sigmoid(outs[-1].astype(jnp.float32))

    from tramba_tpu.utils.jit import compiler_options

    return jax.jit(step, compiler_options=compiler_options())
