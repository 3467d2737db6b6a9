"""Fused upsamplers: Dense expand + x2 pixel shuffle + LayerNorm in one pass.

``PatchExpand`` (Dense C->2C) and ``FreqExpand2D`` (Dense C->4C) both follow
the expand with the reference's channel-block pixel shuffle
(modules.py:183-221/678-696) and a LayerNorm.  Composed, the shuffle is an
XLA transpose copy and the LN another full pass over the widened map; fused,
the shuffle is an in-VMEM relayout between the matmul and the norm.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tramba_tpu.ops.fused_mlp import _ln
from tramba_tpu.ops.fused_ss2d import _vcall

__all__ = ["fused_expand2", "composed_expand2", "expand2_fusable"]


def expand2_fusable(H: int, W: int, C: int, factor: int) -> bool:
    cout = factor * C // 4
    return W % 8 == 0 and cout % 128 == 0 and _rows(H, W, factor * C) >= 1


def _rows(H: int, W: int, ec: int) -> int:
    """Input rows per block: bound the fp32 (Tr*W, expand_channels) tile."""
    budget = 2 * 1024 * 1024 // (4 * W * ec)
    best = 0
    for tr in range(1, H + 1):
        if H % tr == 0 and tr <= budget:
            best = tr
    return best


def _expand_kernel(hi, Tr, W, x_ref, w_ref, s_ref, b_ref, out_ref):
    prec = jax.lax.Precision.HIGHEST if hi else jax.lax.Precision.DEFAULT
    f32 = jnp.float32
    C = x_ref.shape[-1]
    EC = w_ref.shape[-1]
    co = EC // 4
    e = jax.lax.dot_general(
        x_ref[0].reshape(Tr * W, C), w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=f32, precision=prec,
    )
    # channel blocks (p1, p2, c) become spatial (reference order)
    e = e.reshape(Tr, W, 2, 2, co)
    e = jnp.transpose(e, (0, 2, 1, 3, 4)).reshape(2 * Tr, 2 * W, co)
    y = _ln(e, s_ref[...].astype(f32), b_ref[...].astype(f32))
    out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _expand_pallas(x, w, ln_scale, ln_bias, interpret=False):
    B, H, W, C = x.shape
    EC = w.shape[-1]
    co = EC // 4
    Tr = _rows(H, W, EC)
    nT = H // Tr
    cd = x.dtype
    par = lambda *s: pl.BlockSpec(s, lambda b, t: (0,) * len(s), memory_space=pltpu.VMEM)
    return _vcall(
        functools.partial(_expand_kernel, cd == jnp.float32, Tr, W),
        out_shape=jax.ShapeDtypeStruct((B, 2 * H, 2 * W, co), cd),
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, Tr, W, C), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            par(C, EC), par(1, co), par(1, co),
        ],
        out_specs=pl.BlockSpec((1, 2 * Tr, 2 * W, co), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, w.astype(cd), ln_scale.astype(jnp.float32)[None],
      ln_bias.astype(jnp.float32)[None])


def composed_expand2(x, w, ln_scale, ln_bias):
    """XLA oracle (and VJP path), fp32 LN matching the kernel."""
    from tramba_tpu.nn.layers import pixel_shuffle

    e = x @ w.astype(x.dtype)
    e = pixel_shuffle(e, 2)
    y = _ln(e.astype(jnp.float32), ln_scale.astype(jnp.float32),
            ln_bias.astype(jnp.float32))
    return y.astype(x.dtype)


@jax.custom_vjp
def fused_expand2(x, w, ln_scale, ln_bias):
    """LN(pixel_shuffle(x @ w, 2)) in one kernel pass."""
    interp = jax.default_backend() != "tpu"
    return _expand_pallas(x, w, ln_scale, ln_bias, interpret=interp)


def _exp_fwd(x, w, ln_scale, ln_bias):
    return fused_expand2(x, w, ln_scale, ln_bias), (x, w, ln_scale, ln_bias)


def _exp_bwd(res, g):
    _, vjp = jax.vjp(composed_expand2, *res)
    return vjp(g)


fused_expand2.defvjp(_exp_fwd, _exp_bwd)
