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

__all__ = ["fused_sra", "sra_fusable", "composed_sra",
           "fused_window_attn", "window_attn_fusable", "composed_window_attn"]

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


# ---------------------------------------------------------------------------
# Fused Swin window attention — one HBM pass per block
# ---------------------------------------------------------------------------
#
# The reference's window attention (``Models/encoder/swin_encoder.py:96-230``)
# runs LN -> window_partition -> qkv -> per-head softmax(qk^T + bias [+ mask])
# -> merge -> proj -> window_reverse as separate modules: ~6 HBM passes over
# the (B, H, W, C) map per block plus the partition/reverse relayouts.  On TPU
# every window is a 144-token tile, so the whole chain fits in VMEM.  This
# kernel folds window_partition/reverse into the BlockSpec index map (the map
# is viewed as (B, nWh, w, nWw, w, C) — a free dim-split — and each grid step
# owns one row of windows), reads each tile once, and writes the projected
# tile once.  Shift rolls and the residual add stay outside (composed rolls
# are two cheap copies on the two shifted blocks per stage pair).


def window_attn_fusable(H: int, W: int, C: int, nh: int, w: int, dtype,
                        force=False) -> bool:
    N = w * w
    bpe = jnp.dtype(dtype).itemsize
    return (
        C % nh == 0
        and (C // nh) % 8 == 0
        and N % 8 == 0
        and H % w == 0
        and W % w == 0
        and (force or bpe == 2)
        and 4 * C * C * bpe <= _WEIGHT_BUDGET          # wqkv (C,3C) + wproj
        and nh * N * N * 4 <= 4 * 1024 * 1024          # resident fp32 bias
        and w * W * 3 * C * 4 <= 8 * 1024 * 1024       # fp32 qkv row strip
    )


def _wattn_kernel(nh, eps, hi, has_mask, x_ref, s_ref, b_ref, wqkv_ref,
                  bqkv_ref, bias_ref, *rest):
    if has_mask:
        mask_ref, wp_ref, bp_ref, out_ref = rest
    else:
        wp_ref, bp_ref, out_ref = rest
    prec = jax.lax.Precision.HIGHEST if hi else jax.lax.Precision.DEFAULT
    f32 = jnp.float32
    cd = x_ref.dtype
    w, nWw, C = x_ref.shape[2], x_ref.shape[3], x_ref.shape[5]
    N = w * w
    hd = C // nh
    scale = jnp.float32(hd) ** -0.5

    x = x_ref[0, 0].astype(f32).reshape(w * nWw * w, C)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * s_ref[...].astype(f32) + b_ref[...].astype(f32)
    qkv = jax.lax.dot_general(y.astype(cd), wqkv_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=f32, precision=prec)
    qkv = (qkv + bqkv_ref[...].astype(f32)).reshape(w, nWw, w, 3 * C)

    for j in range(nWw):
        t = qkv[:, j].reshape(N, 3 * C)  # one window's tokens
        heads = []
        for h in range(nh):
            qh = (t[:, h * hd:(h + 1) * hd] * scale).astype(cd)
            kh = t[:, C + h * hd:C + (h + 1) * hd].astype(cd)
            vh = t[:, 2 * C + h * hd:2 * C + (h + 1) * hd].astype(cd)
            s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                    preferred_element_type=f32, precision=prec)
            s = s + bias_ref[h]
            if has_mask:
                s = s + mask_ref[0, j]
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            heads.append(jax.lax.dot_general(p.astype(cd), vh,
                                             (((1,), (0,)), ((), ())),
                                             preferred_element_type=f32,
                                             precision=prec))
        o = jnp.concatenate(heads, axis=-1).astype(cd)  # (N, C)
        out = jax.lax.dot_general(o, wp_ref[...], (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32, precision=prec)
        out = (out + bp_ref[...].astype(f32)).astype(out_ref.dtype)
        out_ref[0, 0, :, j] = out.reshape(w, w, C)


@functools.partial(jax.jit, static_argnames=("nh", "w", "eps", "interpret"))
def _wattn_pallas(x, ln_s, ln_b, wqkv, bqkv, bias, mask, wp, bp, nh, w, eps,
                  interpret=False):
    B, H, W, C = x.shape
    nWh, nWw = H // w, W // w
    N = w * w
    cd = x.dtype
    x6 = x.reshape(B, nWh, w, nWw, w, C)
    vec = lambda a: a.astype(jnp.float32)[None, :]
    par = lambda *s: pl.BlockSpec(s, lambda b, i: (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((1, 1, w, nWw, w, C), lambda b, i: (b, i, 0, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    in_specs = [tile, par(1, C), par(1, C), par(C, 3 * C), par(1, 3 * C),
                par(nh, N, N)]
    ops = [x6, vec(ln_s), vec(ln_b), wqkv.astype(cd), vec(bqkv),
           bias.astype(jnp.float32)]
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, nWw, N, N), lambda b, i: (i, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        ops.append(mask.astype(jnp.float32).reshape(nWh, nWw, N, N))
    in_specs += [par(C, C), par(1, C)]
    ops += [wp.astype(cd), vec(bp)]
    out = _vcall(
        functools.partial(_wattn_kernel, nh, eps, cd == jnp.float32,
                          mask is not None),
        out_shape=jax.ShapeDtypeStruct((B, nWh, w, nWw, w, C), cd),
        grid=(B, nWh),
        in_specs=in_specs,
        out_specs=tile,
        interpret=interpret,
    )(*ops)
    return out.reshape(B, H, W, C)


def composed_window_attn(x, ln_s, ln_b, wqkv, bqkv, bias, mask, wp, bp, nh,
                         eps=1e-5):
    """XLA oracle (and VJP path), fp32 internals matching the kernel."""
    f32 = jnp.float32
    B, H, W, C = x.shape
    nh_, N, _ = bias.shape
    w = int(round(N ** 0.5))
    nWh, nWw = H // w, W // w
    hd = C // nh
    xf = x.astype(f32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * ln_s.astype(f32) + ln_b.astype(f32)
    win = y.reshape(B, nWh, w, nWw, w, C).transpose(0, 1, 3, 2, 4, 5)
    win = win.reshape(B * nWh * nWw, N, C)
    qkv = (win.astype(x.dtype) @ wqkv.astype(x.dtype)).astype(f32) \
        + bqkv.astype(f32)
    qkv = qkv.reshape(-1, N, 3, nh, hd).transpose(2, 0, 3, 1, 4)
    q = (qkv[0] * jnp.float32(hd) ** -0.5).astype(x.dtype).astype(f32)
    k, v = qkv[1].astype(x.dtype).astype(f32), qkv[2].astype(x.dtype).astype(f32)
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k) + bias.astype(f32)[None]
    if mask is not None:
        nW = nWh * nWw
        s = s.reshape(B, nW, nh, N, N) + mask.astype(f32)[None, :, None]
        s = s.reshape(B * nW, nh, N, N)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhnm,bhmd->bhnd", p.astype(x.dtype).astype(f32), v)
    o = o.transpose(0, 2, 1, 3).reshape(-1, N, C)
    out = (o.astype(x.dtype) @ wp.astype(x.dtype)).astype(f32) + bp.astype(f32)
    out = out.reshape(B, nWh, nWw, w, w, C).transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(B, H, W, C).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def fused_window_attn(x, ln_s, ln_b, wqkv, bqkv, bias, mask, wp, bp, nh, eps):
    """Swin window attention, LN -> qkv -> softmax(+bias+mask) -> proj fused.

    ``x``: (B, H, W, C) NHWC, already cyclically shifted for shifted blocks.
    ``bias``: (nh, N, N) relative-position bias (gathered from the table
    outside).  ``mask``: (nW, N, N) additive shift mask or None.  Partition
    and reverse are BlockSpec index maps — the windowed layout never hits HBM.
    """
    w = int(round(bias.shape[-1] ** 0.5))
    interp = jax.default_backend() != "tpu"
    return _wattn_pallas(x, ln_s, ln_b, wqkv, bqkv, bias, mask, wp, bp,
                         nh, w, eps, interpret=interp)


def _wattn_fwd(x, ln_s, ln_b, wqkv, bqkv, bias, mask, wp, bp, nh, eps):
    return (fused_window_attn(x, ln_s, ln_b, wqkv, bqkv, bias, mask, wp, bp,
                              nh, eps),
            (x, ln_s, ln_b, wqkv, bqkv, bias, mask, wp, bp))


def _wattn_bwd(nh, eps, res, g):
    x, ln_s, ln_b, wqkv, bqkv, bias, mask, wp, bp = res
    diff = (x, ln_s, ln_b, wqkv, bqkv, bias, wp, bp)
    _, vjp = jax.vjp(
        lambda x_, s_, b_, wq_, bq_, bi_, wp_, bp_: composed_window_attn(
            x_, s_, b_, wq_, bq_, bi_, mask, wp_, bp_, nh, eps), *diff)
    dx, ds, db, dwq, dbq, dbi, dwp, dbp = vjp(g)
    return dx, ds, db, dwq, dbq, dbi, None, dwp, dbp


fused_window_attn.defvjp(_wattn_fwd, _wattn_bwd)
