"""Fused spatial-reduction attention (PVTv2) — one HBM pass per block.

The reference's SRA (``Models/encoder/pvtv2_encoder.py:57-116``) runs LN ->
q-proj -> (sr conv -> LN -> kv-proj) -> scores -> softmax -> weighted sum ->
out-proj as separate modules: at PVTv2-b4 shapes that is ~8 HBM passes over
the (B, N, C) activation per block, and the head split/merge transposes are
pure bandwidth.  On TPU the reduced K/V are TINY (sr_ratio keeps Lk = 144 at
every 384px stage), so softmax(q kᵀ) v fits comfortably in VMEM: this kernel
reads each query tile once, does LN + q-proj + all heads' attention + the
output projection on-chip, and writes the projected tile once.  K/V (and the
sr conv producing them) stay composed outside — they touch ~Lk rows, not N.

Backward recomputes through the composed oracle (matmul-dominated; XLA
handles it well) — the fused forward is where the HBM traffic was.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tramba_tpu.ops.selective_scan import _vcall

__all__ = ["fused_sra", "sra_fusable", "composed_sra"]

_WEIGHT_BUDGET = 8 * 1024 * 1024


def sra_fusable(N: int, C: int, nh: int, Lk: int, dtype, force=False) -> bool:
    hd = C // nh
    bpe = jnp.dtype(dtype).itemsize
    return (
        N % 8 == 0
        and C % nh == 0
        and hd % 8 == 0
        and Lk % 8 == 0
        and (force or bpe == 2)
        and 2 * C * C * bpe <= _WEIGHT_BUDGET  # wq + wproj resident
        and 2 * nh * Lk * hd * 4 <= 2 * 1024 * 1024  # k, v resident (fp32)
    )


def _pick_tile(N: int, C: int, Lk: int) -> int:
    # bound the fp32 working set: (T, C) q + (T, Lk) scores + (T, C) out
    budget = 1_500_000 // (2 * C + Lk)
    best = 0
    for t in range(8, N + 1, 8):
        if N % t == 0 and t <= budget:
            best = t
    return best or N


def _sra_kernel(nh, eps, hi, x_ref, s_ref, b_ref, wq_ref, bq_ref, k_ref, v_ref,
                wp_ref, bp_ref, out_ref):
    prec = jax.lax.Precision.HIGHEST if hi else jax.lax.Precision.DEFAULT
    f32 = jnp.float32
    cd = x_ref.dtype
    C = x_ref.shape[-1]
    hd = C // nh
    scale = jnp.float32(hd) ** -0.5

    x = x_ref[0].astype(f32)  # (T, C)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * s_ref[...].astype(f32) + b_ref[...].astype(f32)
    q = jax.lax.dot_general(y.astype(cd), wq_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=f32, precision=prec)
    q = (q + bq_ref[...].astype(f32)) * scale  # (T, C)

    heads = []
    for h in range(nh):
        kh = k_ref[0, h]  # (Lk, hd)
        vh = v_ref[0, h]
        qh = q[:, h * hd : (h + 1) * hd].astype(cd)
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=f32, precision=prec)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        heads.append(jax.lax.dot_general(p.astype(cd), vh, (((1,), (0,)), ((), ())),
                                         preferred_element_type=f32,
                                         precision=prec))
    o = jnp.concatenate(heads, axis=-1).astype(cd)  # (T, C), head-merged
    out = jax.lax.dot_general(o, wp_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=f32, precision=prec)
    out_ref[0] = (out + bp_ref[...].astype(f32)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("nh", "eps", "interpret"))
def _sra_pallas(x, ln_s, ln_b, wq, bq, k, v, wp, bp, nh, eps, interpret=False):
    B, N, C = x.shape
    _, _, Lk, hd = k.shape
    T = _pick_tile(N, C, Lk)
    nT = N // T
    cd = x.dtype
    vec = lambda a: a.astype(jnp.float32)[None, :]
    par = lambda *s: pl.BlockSpec(s, lambda b, t: (0,) * len(s), memory_space=pltpu.VMEM)
    return _vcall(
        functools.partial(_sra_kernel, nh, eps, cd == jnp.float32),
        out_shape=jax.ShapeDtypeStruct((B, N, C), cd),
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, T, C), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            par(1, C), par(1, C), par(C, C), par(1, C),
            pl.BlockSpec((1, nh, Lk, hd), lambda b, t: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nh, Lk, hd), lambda b, t: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            par(C, C), par(1, C),
        ],
        out_specs=pl.BlockSpec((1, T, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, vec(ln_s), vec(ln_b), wq.astype(cd), vec(bq), k.astype(cd), v.astype(cd),
      wp.astype(cd), vec(bp))


def composed_sra(x, ln_s, ln_b, wq, bq, k, v, wp, bp, nh, eps=1e-6):
    """XLA oracle (and VJP path), fp32 internals matching the kernel."""
    f32 = jnp.float32
    B, N, C = x.shape
    hd = C // nh
    xf = x.astype(f32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * ln_s.astype(f32) + ln_b.astype(f32)
    q = (y.astype(x.dtype) @ wq.astype(x.dtype)).astype(f32) + bq.astype(f32)
    q = (q * jnp.float32(hd) ** -0.5).reshape(B, N, nh, hd).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhnd,bhkd->bhnk", q.astype(x.dtype).astype(f32),
                   k.astype(x.dtype).astype(f32))
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhnk,bhkd->bhnd", p.astype(x.dtype).astype(f32),
                   v.astype(x.dtype).astype(f32))
    o = o.transpose(0, 2, 1, 3).reshape(B, N, C)
    out = (o.astype(x.dtype) @ wp.astype(x.dtype)).astype(f32) + bp.astype(f32)
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def fused_sra(x, ln_s, ln_b, wq, bq, k, v, wp, bp, nh, eps):
    """out = proj(concat_h(softmax(q_h k_hᵀ/√d) v_h)), q = LN(x) Wq — one kernel.

    ``k``/``v``: (B, nh, Lk, hd) head-split reduced keys/values (from the
    composed sr-conv path).  The residual add stays outside.
    """
    interp = jax.default_backend() != "tpu"
    return _sra_pallas(x, ln_s, ln_b, wq, bq, k, v, wp, bp, nh, eps,
                       interpret=interp)


def _sra_fwd(x, ln_s, ln_b, wq, bq, k, v, wp, bp, nh, eps):
    return (fused_sra(x, ln_s, ln_b, wq, bq, k, v, wp, bp, nh, eps),
            (x, ln_s, ln_b, wq, bq, k, v, wp, bp))


def _sra_bwd(nh, eps, res, g):
    _, vjp = jax.vjp(lambda *a: composed_sra(*a, nh, eps), *res)
    return vjp(g)


fused_sra.defvjp(_sra_fwd, _sra_bwd)
