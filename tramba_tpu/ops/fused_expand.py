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

__all__ = ["fused_expand2", "composed_expand2", "expand2_fusable",
           "fused_final_head", "composed_final_head", "final_head_fusable"]


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


# --- fused final head: Dense(C->16C) + per-slot LN + 1-channel conv --------
#
# The reference ends with FinalPatchExpand_X4 + a 1x1 seg conv
# (modules.py:224-274, Trambav6.py decoder tail).  Composed, the expand
# materializes a 16x-wide tensor in HBM (604 MB at b16/384px) that the LN
# and the 1-channel head immediately reduce away — measured 25.6 ms of the
# ~150 ms forward (scripts/residual_bench.py).  Fused, the expanded hidden
# lives only in VMEM; because the head is LINEAR in the LN output, the
# per-slot LN + head dot collapse into three skinny matmuls against
# block-diagonal selectors:
#
#   seg_s = r_s * (h_s . u  -  m_s * sum(u)) + (b . w_h + b_h)
#
# with u = ln_scale * w_h, m_s/r_s the slot mean/rsqrt-var — so the kernel
# emits only (B, H, W, 16) (4.7 MB), a ~128x traffic reduction.


def final_head_fusable(H: int, W: int, C: int) -> bool:
    return W % 8 == 0 and C % 128 == 0 and _head_rows(H, W, 16 * C) >= 1


def _head_rows(H: int, W: int, EC: int) -> int:
    """Rows per block: the fp32 (Tr*W, EC) hidden tile (+ its square) must
    fit the scoped-vmem budget; ~6 MB each keeps us well under 32 MB."""
    budget = 6 * 1024 * 1024 // (4 * W * EC)
    best = 0
    for tr in range(1, H + 1):
        if H % tr == 0 and tr <= budget:
            best = tr
    return best


def _head_kernel(hi, Tr, W, x_ref, w1_ref, u_ref, o_ref, sc_ref, out_ref):
    prec = jax.lax.Precision.HIGHEST if hi else jax.lax.Precision.DEFAULT
    f32 = jnp.float32
    C = x_ref.shape[-1]
    h = jax.lax.dot_general(
        x_ref[0].reshape(Tr * W, C), w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=f32, precision=prec,
    )  # (Tr*W, 16C) — never leaves VMEM
    P = jax.lax.dot_general(h, u_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=f32, precision=prec)
    M = jax.lax.dot_general(h, o_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=f32, precision=prec) / C
    S2 = jax.lax.dot_general(h * h, o_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=f32, precision=prec) / C
    r = jax.lax.rsqrt(S2 - M * M + 1e-5)
    seg = r * (P - M * sc_ref[0, 0]) + sc_ref[0, 1]
    out_ref[0] = seg.reshape(Tr, W, 16).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _final_head_pallas(x, w1, ln_scale, ln_bias, wh, bh, interpret=False):
    B, H, W, C = x.shape
    EC = w1.shape[-1]
    Tr = _head_rows(H, W, EC)
    nT = H // Tr
    cd = x.dtype
    f32 = jnp.float32
    u = ln_scale.astype(f32) * wh.astype(f32)  # (C,)
    eye = jnp.eye(16, dtype=f32)
    # column k = s*C + c of the expand matmul belongs to slot s, channel c
    U = (eye[:, None, :] * u[None, :, None]).reshape(EC, 16)
    O = jnp.repeat(eye, C, axis=0)
    sc = jnp.stack([jnp.sum(u),
                    jnp.sum(ln_bias.astype(f32) * wh.astype(f32))
                    + jnp.sum(bh.astype(f32))]).reshape(1, 2)
    par = lambda *s: pl.BlockSpec(s, lambda b, t: (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    return _vcall(
        functools.partial(_head_kernel, cd == jnp.float32, Tr, W),
        out_shape=jax.ShapeDtypeStruct((B, H, W, 16), cd),
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, Tr, W, C), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            par(C, EC), par(EC, 16), par(EC, 16), par(1, 2),
        ],
        out_specs=pl.BlockSpec((1, Tr, W, 16), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, w1.astype(cd), U, O, sc)


def composed_final_head(x, w1, ln_scale, ln_bias, wh, bh):
    """XLA oracle (and VJP path): fp32 LN matching the kernel."""
    B, H, W, C = x.shape
    h = (x @ w1.astype(x.dtype)).reshape(B, H, W, 16, C)
    y = _ln(h.astype(jnp.float32), ln_scale.astype(jnp.float32),
            ln_bias.astype(jnp.float32))
    seg = y @ wh.astype(jnp.float32) + jnp.sum(bh.astype(jnp.float32))
    return seg.astype(x.dtype)


@jax.custom_vjp
def fused_final_head(x, w1, ln_scale, ln_bias, wh, bh):
    """seg(B,H,W,16) = head(LN(reshape(x @ w1))) without the 16x HBM tensor."""
    interp = jax.default_backend() != "tpu"
    return _final_head_pallas(x, w1, ln_scale, ln_bias, wh, bh, interpret=interp)


def _head_fwd(*args):
    return fused_final_head(*args), args


def _head_bwd(res, g):
    _, vjp = jax.vjp(composed_final_head, *res)
    return vjp(g)


fused_final_head.defvjp(_head_fwd, _head_bwd)
