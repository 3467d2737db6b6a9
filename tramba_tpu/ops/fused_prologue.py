"""Fused SS2D prologue: (LayerNorm ->) in_proj -> depthwise 3x3 -> SiLU.

The reference runs these as separate modules before its selective-scan CUDA
kernel (``Models/vmamba.py:114-158``: Linear2d in_proj, conv2d, SiLU, with
the block's pre-norm just outside).  Composed in XLA that is ~9 HBM passes
over the activation per block; fused it is one read of the narrow input and
one write of the wide projected map.  The 3x3 depthwise conv needs a one-row
halo, provided by reading the neighbouring row-blocks (clamped at the edges
and masked to zero => SAME zero padding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tramba_tpu.ops.fused_mlp import _ln
from tramba_tpu.ops.fused_ss2d import _vcall

__all__ = ["fused_prologue", "composed_prologue", "prologue_fusable"]


def prologue_fusable(H: int, W: int, d_model: int, d_inner: int, dtype, force=False) -> bool:
    # small spatial tiles starve the MXU and measure slower than composed XLA
    # (scripts/op_bench.py: 24px/1024ch fused 2.7 ms vs composed 1.9 ms), so
    # the pixel floor is a perf gate (bypassed by backend='pallas' test mode)
    # bf16 only on hardware: the fp32 tiles double and blow Mosaic's scoped
    # vmem at 384px (the fp32 path is the parity oracle; composed is fine)
    return (
        W % 8 == 0
        and d_inner % 128 == 0
        and (force or H * W >= 2304)
        and (force or jnp.dtype(dtype).itemsize == 2)
        and _row_chunk(H, W, d_inner) >= 2
        and 2 * d_model * d_inner * jnp.dtype(dtype).itemsize <= 8 * 1024 * 1024
    )


def _inner_chunk(d_inner: int) -> int:
    return d_inner if d_inner <= 1024 else 1024


def _row_chunk(H: int, W: int, d_inner: int) -> int:
    """Rows per block: bound the fp32 (Tr+2, W+2, chunk) tile to ~2.5 MB."""
    budget = 5 * 1024 * 1024 // (8 * (W + 2) * _inner_chunk(d_inner))
    best = 0
    for tr in range(2, H + 1, 2):
        if H % tr == 0 and tr + 2 <= budget:
            best = tr
    return best


def _prologue_kernel(hi, has_ln, Tr, H, W, Dc, *refs):
    if has_ln:
        x0_ref, x1_ref, x2_ref, s_ref, b_ref, w_ref, k_ref, out_ref = refs
    else:
        x0_ref, x1_ref, x2_ref, w_ref, k_ref, out_ref = refs
        s_ref = b_ref = None
    prec = jax.lax.Precision.HIGHEST if hi else jax.lax.Precision.DEFAULT
    t = pl.program_id(1)
    f32 = jnp.float32
    Dm = x1_ref.shape[-1]
    D = w_ref.shape[-1]
    xe = jnp.concatenate(
        [x0_ref[0, Tr - 1 :], x1_ref[0], x2_ref[0, :1]], axis=0
    ).astype(f32)  # (Tr+2, W, Dm)
    if has_ln:
        xe = _ln(xe, s_ref[...].astype(f32), b_ref[...].astype(f32))
    xe = xe.reshape((Tr + 2) * W, Dm).astype(x1_ref.dtype)
    grow = jax.lax.broadcasted_iota(jnp.int32, ((Tr + 2) * W, 1), 0) // W + t * Tr - 1
    rmask = (grow >= 0) & (grow < H)
    # chunk d_inner so per-chunk fp32 tiles stay inside scoped VMEM
    for c0 in range(0, D, Dc):
        u = jax.lax.dot_general(
            xe, w_ref[:, c0 : c0 + Dc], (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=prec,
        )
        u = jnp.where(rmask, u, 0.0).reshape(Tr + 2, W, Dc)
        zc = jnp.zeros((Tr + 2, 1, Dc), f32)
        up = jnp.concatenate([zc, u, zc], axis=1)  # (Tr+2, W+2, Dc)
        acc = jnp.zeros((Tr, W, Dc), f32)
        for i in range(3):
            for j in range(3):
                acc = acc + k_ref[i, j, c0 : c0 + Dc].astype(f32) * up[i : i + Tr, j : j + W]
        acc = acc * jax.nn.sigmoid(acc)  # SiLU
        out_ref[0, :, :, c0 : c0 + Dc] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "row_chunk", "inner_chunk"))
def _prologue_pallas(x, ln_scale, ln_bias, w_in, conv_k, interpret=False, row_chunk=0,
                     inner_chunk=0):
    B, H, W, Dm = x.shape
    D = w_in.shape[1]
    Tr = row_chunk or _row_chunk(H, W, D)
    nT = H // Tr
    cd = x.dtype
    has_ln = ln_scale is not None
    vec = lambda v: v.astype(jnp.float32)[None, :]
    par = lambda *s: pl.BlockSpec(s, lambda b, t: (0,) * len(s), memory_space=pltpu.VMEM)
    xspec = lambda f: pl.BlockSpec((1, Tr, W, Dm), lambda b, t: (b, f(t), 0, 0),
                                   memory_space=pltpu.VMEM)
    in_specs = [
        xspec(lambda t: jnp.maximum(t - 1, 0)),
        xspec(lambda t: t),
        xspec(lambda t: jnp.minimum(t + 1, nT - 1)),
    ]
    args = [x, x, x]
    if has_ln:
        in_specs += [par(1, Dm), par(1, Dm)]
        args += [vec(ln_scale), vec(ln_bias)]
    in_specs += [par(Dm, D), par(3, 3, D)]
    args += [w_in.astype(cd), conv_k.reshape(3, 3, D).astype(cd)]
    return _vcall(
        functools.partial(_prologue_kernel, x.dtype == jnp.float32, has_ln, Tr, H, W,
                          inner_chunk or _inner_chunk(D)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, D), x.dtype),
        grid=(B, nT),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Tr, W, D), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)


def composed_prologue(x, ln_scale, ln_bias, w_in, conv_k):
    """XLA oracle (and VJP path), fp32 internals matching the kernel."""
    f32 = jnp.float32
    D = w_in.shape[1]
    if ln_scale is not None:
        x = _ln(x.astype(f32), ln_scale.astype(f32), ln_bias.astype(f32)).astype(x.dtype)
    u = (x @ w_in.astype(x.dtype)).astype(f32)
    dn = jax.lax.conv_dimension_numbers(u.shape, (3, 3, 1, D), ("NHWC", "HWIO", "NHWC"))
    u = jax.lax.conv_general_dilated(
        u, conv_k.astype(f32), (1, 1), "SAME", dimension_numbers=dn,
        feature_group_count=D)
    return (u * jax.nn.sigmoid(u)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _fused_prologue_ln(x, ln_scale, ln_bias, w_in, conv_k):
    interp = jax.default_backend() != "tpu"
    return _prologue_pallas(x, ln_scale, ln_bias, w_in, conv_k, interpret=interp)


def _pro_ln_fwd(x, ln_scale, ln_bias, w_in, conv_k):
    return _fused_prologue_ln(x, ln_scale, ln_bias, w_in, conv_k), (
        x, ln_scale, ln_bias, w_in, conv_k)


def _pro_ln_bwd(res, g):
    _, vjp = jax.vjp(composed_prologue, *res)
    return vjp(g)


_fused_prologue_ln.defvjp(_pro_ln_fwd, _pro_ln_bwd)


@jax.custom_vjp
def _fused_prologue_noln(x, w_in, conv_k):
    interp = jax.default_backend() != "tpu"
    return _prologue_pallas(x, None, None, w_in, conv_k, interpret=interp)


def _pro_fwd(x, w_in, conv_k):
    return _fused_prologue_noln(x, w_in, conv_k), (x, w_in, conv_k)


def _pro_bwd(res, g):
    x, w_in, conv_k = res
    _, vjp = jax.vjp(lambda a, w, k: composed_prologue(a, None, None, w, k),
                     x, w_in, conv_k)
    return vjp(g)


_fused_prologue_noln.defvjp(_pro_fwd, _pro_bwd)


def fused_prologue(x, ln_scale, ln_bias, w_in, conv_k):
    """(LN ->) in_proj -> dw3x3 -> SiLU in one kernel; LN skipped when
    ``ln_scale`` is None."""
    if ln_scale is None:
        return _fused_prologue_noln(x, w_in, conv_k)
    return _fused_prologue_ln(x, ln_scale, ln_bias, w_in, conv_k)
