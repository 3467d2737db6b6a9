"""Fused SS2D core: per-direction projections + S6 recurrence in one kernel.

Replaces the composed chain (einsum Δ/B/C projections -> softplus -> exp ->
linear_scan -> C·h + D·u) with a single Pallas kernel that reads each
(chunk, direction) of the scanned sequence once from HBM and writes the
per-direction output once — the Δ/B/C projections ride the MXU in VMEM and
the recurrence carry never leaves the chip.  This is the TPU equivalent of
the reference's fused CUDA kernel ``selective_scan_cuda_oflex``
(csms6s.py:904-923) with the projections (vmamba.py:232-236) fused in.

d_state N == 1 only (every live path in the reference).  The backward pass
is native (see the "Native fused backward" section): the adjoint recurrence
runs as the same chunked Pallas kernels in reverse visiting order,
recomputing intra-chunk state from fp32 chunk-boundary carries the forward
emits — the TPU answer to the reference's fused CUDA backward
(csms6s.py:920-922).  The composed path remains as the VJP oracle in tests.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tramba_tpu.ops.selective_scan import (_dual_scan_on, _scan_masked, _vcall,
                                            linear_scan, scan_rec_log,
                                            scan_rec_log_carry,
                                            scan_rec_log_carry2,
                                            scan_rec_log_carry_line2)

__all__ = ["fused_ss2d_core", "composed_ss2d_core"]


def composed_ss2d_core(xs, x_proj_w, dt_w, dt_b, A_logs, Ds, backend=None):
    """Reference-composed implementation (also the VJP oracle).

    xs: (B, K, L, D); x_proj_w: (K, R+2, D); dt_w: (K, D, R); dt_b: (K, D);
    A_logs: (K, D, 1); Ds: (K, D).  Returns ys (B, K, L, D).
    """
    R = x_proj_w.shape[1] - 2
    # fp32 projections, matching the fused kernel's in-VMEM compute dtype so
    # the composed VJP differentiates the same function the kernel evaluates
    cd = jnp.float32
    dbc = jnp.einsum("bkld,kcd->bklc", xs.astype(cd), x_proj_w.astype(cd))
    dts, Bc, Cc = jnp.split(dbc, [R, R + 1], axis=-1)
    dts = jnp.einsum("bklr,kdr->bkld", dts, dt_w.astype(cd))
    delta = jax.nn.softplus(dts.astype(jnp.float32) + dt_b.astype(jnp.float32)[None, :, None, :])
    A = -jnp.exp(A_logs.astype(jnp.float32))[..., 0]  # (K, D)
    a = jnp.exp(delta * A[None, :, None, :])
    b = delta * xs.astype(jnp.float32) * Bc.astype(jnp.float32)
    h = linear_scan(a, b, backend)
    y = h * Cc.astype(jnp.float32) + xs.astype(jnp.float32) * Ds.astype(jnp.float32)[None, :, None, :]
    return y.astype(xs.dtype)


def _fused_kernel(R, hi, emit, *refs):
    if emit:
        xs_ref, wx_ref, wdt_ref, bias_ref, A_ref, Ds_ref, out_ref, cout_ref, carry = refs
    else:
        xs_ref, wx_ref, wdt_ref, bias_ref, A_ref, Ds_ref, out_ref, carry = refs
        cout_ref = None
    prec = jax.lax.Precision.HIGHEST if hi else jax.lax.Precision.DEFAULT
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    if cout_ref is not None:
        cout_ref[0, 0] = carry[...]  # fp32 carry entering this chunk (for the bwd)

    x = xs_ref[0].astype(jnp.float32)  # (T, D)
    wx = wx_ref[0].astype(jnp.float32)  # (C, D)
    wdt = wdt_ref[0].astype(jnp.float32)  # (D, R)
    T = x.shape[0]

    dbc = jax.lax.dot_general(
        x, wx, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    )  # (T, C)
    dt = jax.lax.dot_general(
        dbc[:, :R], wdt, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )  # (T, D)
    delta = jax.nn.softplus(dt + bias_ref[0].astype(jnp.float32))  # (T,D)+(1,D)
    la = delta * A_ref[0].astype(jnp.float32)
    b = delta * x * dbc[:, R : R + 1]

    h = scan_rec_log_carry(la, b, carry[...], reverse=False)
    carry[...] = h[T - 1 :, :]
    y = h * dbc[:, R + 1 : R + 2] + x * Ds_ref[0].astype(jnp.float32)
    out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("K", "R", "chunk", "interpret", "k_major",
                                             "emit_carries"))
def _fused_pallas(xs3, wx, wdt, bias, A, Ds, K: int, R: int, chunk: int = 256,
                  interpret: bool = False, k_major: bool = False,
                  emit_carries: bool = False):
    BK, L, D = xs3.shape
    T = min(chunk, L)
    nT = pl.cdiv(L, T)
    grid = (BK, nT)
    C = wx.shape[1]
    nB = BK // K
    # row r of xs3 is (b*K + k) by default, or (k*nB + b) when k_major
    kidx = (lambda r: r // nB) if k_major else (lambda r: r % K)
    seq_spec = pl.BlockSpec((1, T, D), lambda r, t: (r, t, 0), memory_space=pltpu.VMEM)
    par_spec = lambda *shape: pl.BlockSpec(
        (1,) + shape, lambda r, t: (kidx(r),) + (0,) * len(shape), memory_space=pltpu.VMEM
    )
    out_shape = [jax.ShapeDtypeStruct((BK, L, D), xs3.dtype)]
    out_specs = [seq_spec]
    if emit_carries:
        # (.., 1, D) trailing dims satisfy the Mosaic (sublane, lane) tiling rule
        out_shape.append(jax.ShapeDtypeStruct((BK, nT, 1, D), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, 1, D), lambda r, t: (r, t, 0, 0),
                                      memory_space=pltpu.VMEM))
    res = _vcall(
        functools.partial(_fused_kernel, R, xs3.dtype == jnp.float32, emit_carries),
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            seq_spec,
            par_spec(C, D),
            par_spec(D, R),
            par_spec(1, D),  # (K, 1, D) row params
            par_spec(1, D),
            par_spec(1, D),
        ],
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((1, D), jnp.float32)],
        interpret=interpret,
    )(xs3, wx, wdt, bias[:, None, :], A[:, None, :], Ds[:, None, :])
    return tuple(res) if emit_carries else res[0]


def _fused_forward(xs, x_proj_w, dt_w, dt_b, A_logs, Ds, emit_carries=False):
    B, K, L, D = xs.shape
    R = x_proj_w.shape[1] - 2
    A = -jnp.exp(A_logs.astype(jnp.float32))[..., 0]  # (K, D)
    on_tpu = jax.default_backend() == "tpu"
    res = _fused_pallas(
        xs.reshape(B * K, L, D),
        x_proj_w.astype(jnp.float32),
        dt_w.astype(jnp.float32),
        dt_b.astype(jnp.float32),
        A,
        Ds.astype(jnp.float32),
        K=K,
        R=R,
        interpret=not on_tpu,
        emit_carries=emit_carries,
    )
    if emit_carries:
        ys, carries = res
        return ys.reshape(B, K, L, D), carries
    return res.reshape(B, K, L, D)


@jax.custom_vjp
def fused_ss2d_core(xs, x_proj_w, dt_w, dt_b, A_logs, Ds):
    """Fused forward with a native fused backward (the adjoint recurrence run
    as the same chunked kernel on reversed visiting order; reference CUDA
    bwd analogue: csms6s.py:920-922)."""
    return _fused_forward(xs, x_proj_w, dt_w, dt_b, A_logs, Ds)


def _fwd(xs, x_proj_w, dt_w, dt_b, A_logs, Ds):
    ys, carries = _fused_forward(xs, x_proj_w, dt_w, dt_b, A_logs, Ds, emit_carries=True)
    return ys, (xs, x_proj_w, dt_w, dt_b, A_logs, Ds, carries)


def _bwd(res, g):
    xs, x_proj_w, dt_w, dt_b, A_logs, Ds, carries = res
    B, K, L, D = xs.shape
    R = x_proj_w.shape[1] - 2
    f32 = jnp.float32
    A = -jnp.exp(A_logs.astype(f32))[..., 0]
    interp = jax.default_backend() != "tpu"
    dx3, partials = _seq_bwd_pallas(
        xs.reshape(B * K, L, D), g.reshape(B * K, L, D), carries,
        x_proj_w.astype(f32), dt_w.astype(f32), dt_b.astype(f32), A, Ds.astype(f32),
        K=K, R=R, interpret=interp,
    )
    red = lambda p: p.reshape(B, K, *p.shape[1:]).sum(0)  # rows r = b*K + k
    r = [red(p) for p in partials]
    dA = r[5][:, 0]
    return (
        dx3.reshape(B, K, L, D).astype(xs.dtype),
        _assemble_wx(r).astype(x_proj_w.dtype),
        r[3].astype(dt_w.dtype),
        r[4][:, 0].astype(dt_b.dtype),
        ((dA * A)[..., None]).astype(A_logs.dtype),
        r[6][:, 0].astype(Ds.dtype),
    )


fused_ss2d_core.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Direction-folded kernels: the raster cross-scan/merge never materializes.
#
# Rows kernel handles directions (0: row-major fwd, 2: row-major reversed) by
# reading row-chunks of the NHWC map via BlockSpec index maps; the reversed
# direction is computed as a *backward* in-chunk scan over mirrored chunks,
# so outputs land directly in pixel order with no flips anywhere.  Cols
# kernel does the same on column-chunks (directions 1, 3), emitting in
# transposed-pixel (w-major) order.  The merge kernel sums the four
# contributions (+ optional pre-merged line directions) and applies
# LayerNorm + exact GELU in one pass.
# ---------------------------------------------------------------------------


def _dirs_kernel(R, transposed, hi, emit, *refs):
    if emit:
        (xs_ref, wx_ref, wdt_ref, bias_ref, A_ref, Ds_ref, out_ref, cout_ref, carry) = refs
    else:
        (xs_ref, wx_ref, wdt_ref, bias_ref, A_ref, Ds_ref, out_ref, carry) = refs
        cout_ref = None
    prec = jax.lax.Precision.HIGHEST if hi else jax.lax.Precision.DEFAULT
    k = pl.program_id(1)
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    if cout_ref is not None:
        cout_ref[0, 0, 0] = carry[...]  # carry entering this chunk, fp32

    blk = xs_ref[0]
    if transposed:
        # (H, Tc, D) -> sequence (Tc*H, D) in w-major order
        blk = jnp.swapaxes(blk, 0, 1)
    T = blk.shape[0] * blk.shape[1]
    x = blk.reshape(T, -1).astype(jnp.float32)

    wx = wx_ref[0].astype(jnp.float32)
    wdt = wdt_ref[0].astype(jnp.float32)
    dbc = jax.lax.dot_general(x, wx, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32, precision=prec)
    dt = jax.lax.dot_general(dbc[:, :R], wdt, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32, precision=prec)
    delta = jax.nn.softplus(dt + bias_ref[0].astype(jnp.float32))
    la = delta * A_ref[0].astype(jnp.float32)
    b = delta * x * dbc[:, R : R + 1]

    def fwd(ab):
        h = scan_rec_log_carry(ab[0], ab[1], carry[...], reverse=False)
        return h, h[T - 1 :, :]

    def bwd(ab):
        h = scan_rec_log_carry(ab[0], ab[1], carry[...], reverse=True)
        return h, h[0:1, :]

    h, new_carry = jax.lax.cond(k == 0, fwd, bwd, (la, b))
    carry[...] = new_carry
    y = h * dbc[:, R + 1 : R + 2] + x * Ds_ref[0].astype(jnp.float32)
    if transposed:
        y = jnp.swapaxes(y.reshape(blk.shape), 0, 1)  # back to (H, Tc, D)
        out_ref[0, 0, 0] = y.astype(out_ref.dtype)
    else:
        out_ref[0, 0, 0] = y.reshape(blk.shape).astype(out_ref.dtype)


def _seq_target(D):
    """Chunk length budget: keep T*D fp32 working set well inside VMEM.

    The budget also sets the Hillis-Steele pass count (log2 of the chunk
    length) — shorter chunks do fewer masked-roll passes per element but more
    grid steps.  TRAMBA_SEQ_BUDGET overrides for on-device A/B probes."""
    budget = int(os.environ.get("TRAMBA_SEQ_BUDGET", "65536"))
    return max(64, min(256, budget // max(D, 1)))


def _row_chunk(H, W, D=256):
    target = _seq_target(D)
    best = 1
    for tr in range(1, H + 1):
        if H % tr == 0 and (tr * W) % 8 == 0 and tr * W <= target:
            best = tr
    if best * W % 8 != 0:  # fall back to whole image
        best = H
    return best


@functools.partial(jax.jit, static_argnames=("interpret", "emit_carries"))
def _rows_pallas(ximg, wx, wdt, bias, A, Ds, interpret=False, emit_carries=False):
    B, H, W, D = ximg.shape
    Tr = _row_chunk(H, W, D)
    nT = H // Tr
    spec_x = pl.BlockSpec(
        (1, Tr, W, D),
        lambda b, k, t: (b, jnp.where(k == 0, t, nT - 1 - t), 0, 0),
        memory_space=pltpu.VMEM,
    )
    par = lambda *s: pl.BlockSpec((1,) + s, lambda b, k, t: (k,) + (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    R = wdt.shape[-1]
    C = wx.shape[1]
    out_shape = [jax.ShapeDtypeStruct((B, 2, nT, Tr, W, D), ximg.dtype)]
    out_specs = [pl.BlockSpec(
        (1, 1, 1, Tr, W, D),
        lambda b, k, t: (b, k, jnp.where(k == 0, t, nT - 1 - t), 0, 0, 0),
        memory_space=pltpu.VMEM,
    )]
    if emit_carries:
        out_shape.append(jax.ShapeDtypeStruct((B, 2, nT, 1, D), jnp.float32))
        out_specs.append(pl.BlockSpec(
            (1, 1, 1, 1, D),
            lambda b, k, t: (b, k, jnp.where(k == 0, t, nT - 1 - t), 0, 0),
            memory_space=pltpu.VMEM,
        ))
    res = _vcall(
        functools.partial(_dirs_kernel, R, False, ximg.dtype == jnp.float32, emit_carries),
        out_shape=out_shape,
        grid=(B, 2, nT),
        in_specs=[spec_x, par(C, D), par(D, R), par(1, D), par(1, D), par(1, D)],
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((1, D), jnp.float32)],
        interpret=interpret,
    )(ximg, wx, wdt, bias[:, None, :], A[:, None, :], Ds[:, None, :])
    return tuple(res) if emit_carries else res[0]


def _col_chunk(W, H, D=256):
    """Largest multiple-of-8 divisor of W with H*Tc within the VMEM budget
    (the TPU block sublane constraint applies to the (Tc, D) trailing dims)."""
    target = max(_seq_target(D), H * 8)
    best = 0
    for tc in range(8, W + 1, 8):
        if W % tc == 0 and H * tc <= target:
            best = tc
    return best or W


@functools.partial(jax.jit, static_argnames=("interpret", "emit_carries"))
def _cols_pallas(ximg, wx, wdt, bias, A, Ds, interpret=False, emit_carries=False):
    B, H, W, D = ximg.shape
    Tc = _col_chunk(W, H, D)
    nT = W // Tc
    R = wdt.shape[-1]
    C = wx.shape[1]
    par = lambda *s: pl.BlockSpec((1,) + s, lambda b, k, t: (k,) + (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((B, 2, nT, H, Tc, D), ximg.dtype)]
    out_specs = [pl.BlockSpec(
        (1, 1, 1, H, Tc, D),
        lambda b, k, t: (b, k, jnp.where(k == 0, t, nT - 1 - t), 0, 0, 0),
        memory_space=pltpu.VMEM,
    )]
    if emit_carries:
        out_shape.append(jax.ShapeDtypeStruct((B, 2, nT, 1, D), jnp.float32))
        out_specs.append(pl.BlockSpec(
            (1, 1, 1, 1, D),
            lambda b, k, t: (b, k, jnp.where(k == 0, t, nT - 1 - t), 0, 0),
            memory_space=pltpu.VMEM,
        ))
    res = _vcall(
        functools.partial(_dirs_kernel, R, True, ximg.dtype == jnp.float32, emit_carries),
        out_shape=out_shape,
        grid=(B, 2, nT),
        in_specs=[
            pl.BlockSpec(
                (1, H, Tc, D),
                lambda b, k, t: (b, 0, jnp.where(k == 0, t, nT - 1 - t), 0),
                memory_space=pltpu.VMEM,
            ),
            par(C, D), par(D, R), par(1, D), par(1, D), par(1, D),
        ],
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((1, D), jnp.float32)],
        interpret=interpret,
    )(ximg, wx, wdt, bias[:, None, :], A[:, None, :], Ds[:, None, :])
    return tuple(res) if emit_carries else res[0]


def _erf(x):
    """Abramowitz-Stegun 7.1.26 erf (max abs err 1.5e-7 — fp32-exact);
    Mosaic has no erf primitive."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _merge_kernel(eps, has_line, hi, emit, *refs):
    if has_line:
        y02_ref, y13_ref, yline_ref, scale_ref, bias_ref, wout_ref, *outs = refs
    else:
        y02_ref, y13_ref, scale_ref, bias_ref, wout_ref, *outs = refs
        yline_ref = None
    out_ref = outs[0]
    ysum_ref = outs[1] if emit else None
    s02 = (y02_ref[0, 0, 0] + y02_ref[0, 1, 0]).astype(jnp.float32)  # (Tr, W, D)
    Tr, W, D = s02.shape
    s13 = (y13_ref[0, 0] + y13_ref[0, 1]).astype(jnp.float32)  # (nTc, Tr, Tc, D)
    nTc, _, Tc, _ = s13.shape
    s13 = jnp.swapaxes(s13, 0, 1).reshape(Tr, W, D)  # (Tr, nTc, Tc, D) -> rows
    y = (s02 + s13).reshape(Tr * W, D)
    if yline_ref is not None:
        y = y + yline_ref[0].astype(jnp.float32)
    if ysum_ref is not None:
        ysum_ref[0] = y.astype(ysum_ref.dtype)  # pre-LN sum, the LN-adjoint residual
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean((y - mean) ** 2, axis=-1, keepdims=True)
    y = (y - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    y = 0.5 * y * (1.0 + _erf(y * jnp.float32(0.7071067811865476)))  # exact GELU
    # out projection on the MXU (the Dense that followed the merge)
    prec = jax.lax.Precision.HIGHEST if hi else jax.lax.Precision.DEFAULT
    y = jax.lax.dot_general(y, wout_ref[...].astype(jnp.float32),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32, precision=prec)
    out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("H", "W", "interpret", "emit_ysum"))
def _merge_pallas(y02, y13, y_line, scale, bias, w_out, H: int, W: int, interpret=False,
                  emit_ysum=False):
    """y02: (B, 2, nTr, Tr, W, D) pixel-row chunks; y13: (B, 2, nTc, H, Tc, D).

    Sums the four direction outputs (+ optional pre-merged line directions),
    then LayerNorm (eps 1e-5) + exact GELU + the (D, d_model) out projection,
    emitting (B, L, d_model) — the wide pre-projection tensor never returns
    to HBM.
    """
    B = y02.shape[0]
    D = y02.shape[-1]
    dm = w_out.shape[-1]
    L = H * W
    nTr, Tr = y02.shape[2], y02.shape[3]
    nTc, Tc = y13.shape[2], y13.shape[4]
    has_line = y_line is not None
    in_specs = [
        pl.BlockSpec((1, 2, 1, Tr, W, D), lambda b, t: (b, 0, t, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, nTc, Tr, Tc, D), lambda b, t: (b, 0, 0, t, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [y02, y13]
    if has_line:
        in_specs.append(pl.BlockSpec((1, Tr * W, D), lambda b, t: (b, t, 0),
                                     memory_space=pltpu.VMEM))
        args.append(y_line)
    in_specs += [
        pl.BlockSpec((1, D), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((D, dm), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
    ]
    args += [scale[None, :].astype(jnp.float32), bias[None, :].astype(jnp.float32), w_out]
    hi = bool(y02.dtype == jnp.float32)
    out_shape = [jax.ShapeDtypeStruct((B, L, dm), y02.dtype)]
    out_specs = [pl.BlockSpec((1, Tr * W, dm), lambda b, t: (b, t, 0),
                              memory_space=pltpu.VMEM)]
    if emit_ysum:
        out_shape.append(jax.ShapeDtypeStruct((B, L, D), y02.dtype))
        out_specs.append(pl.BlockSpec((1, Tr * W, D), lambda b, t: (b, t, 0),
                                      memory_space=pltpu.VMEM))
    res = _vcall(
        functools.partial(_merge_kernel, 1e-5, has_line, hi, emit_ysum),
        out_shape=out_shape,
        grid=(B, nTr),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(*args)
    return tuple(res) if emit_ysum else res[0]


def _ln_gelu_proj(y, ln_scale, ln_bias, w_out, dtype):
    y = y.astype(jnp.float32)
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean((y - mean) ** 2, axis=-1, keepdims=True)
    y = (y - mean) * jax.lax.rsqrt(var + 1e-5)
    y = y * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    y = 0.5 * y * (1.0 + jax.lax.erf(y / jnp.sqrt(2.0).astype(jnp.float32)))
    y = y @ w_out.astype(jnp.float32)
    return y.astype(dtype)


# ---------------------------------------------------------------------------
# Native fused backward.
#
# The adjoint of h_t = a_t h_{t-1} + b_t is the same recurrence run against
# scan order: lam_t = g_h,t + a_{t+1} lam_{t+1}.  The backward kernels visit
# chunks in reverse scan order, recompute the intra-chunk state (projections,
# delta, a, b, h) from x plus the fp32 chunk-entry carry the forward emitted
# (so h never round-trips HBM), run the lam scan as the same Hillis-Steele
# with coefficients shifted by one, and accumulate the per-direction weight
# gradients in VMEM across chunks.  This replaces the composed-VJP fallback
# (reference CUDA bwd: csms6s.py:920-922) with one kernel pass at ~forward
# cost instead of the composed path's multi-pass HBM traffic.
# ---------------------------------------------------------------------------


def _shift_down(x, fill_row):
    """y_t = x_{t-1}; y_0 = fill_row ((1, D) or scalar)."""
    T = x.shape[0]
    r = pltpu.roll(x, shift=1, axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(row == 0, fill_row, r)


def _shift_up(x, fill_row):
    """y_t = x_{t+1}; y_{T-1} = fill_row."""
    T = x.shape[0]
    r = pltpu.roll(x, shift=T - 1, axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(row == T - 1, fill_row, r)


def _bwd_chunk_math(R, prec, k_is_fwd, x, g, carry_fwd, lam_in, wx, wdt, bias, A, Ds):
    """Adjoint of one sequence chunk.  All operands fp32.

    x, g: (T, D); carry_fwd: (1, D) h entering this chunk in scan order;
    lam_in: (1, D) lam carry from the previously processed (scan-later) chunk.
    ``k_is_fwd``: STATIC bool — True if this direction scans ascending (a
    traced cond here would make Mosaic stack-allocate both branches and blow
    the scoped-VMEM limit at the 96x96 stages).
    Returns (dx, lam_out, partials) with partials
    (p_wx_dt (R,D), p_wx_B (1,D), p_wx_C (1,D), p_wdt (D,R), p_bias, p_A, p_D).
    """
    T = x.shape[0]
    dot = lambda l, r, dims: jax.lax.dot_general(
        l, r, dimension_numbers=(dims, ((), ())), preferred_element_type=jnp.float32,
        precision=prec)
    dbc = dot(x, wx, ((1,), (1,)))  # (T, C)
    dts = dbc[:, :R]
    Bc = dbc[:, R : R + 1]
    Cc = dbc[:, R + 1 : R + 2]
    dt_pre = dot(dts, wdt, ((1,), (1,))) + bias
    delta = jax.nn.softplus(dt_pre)
    sig = jax.nn.sigmoid(dt_pre)
    la = delta * A  # log-domain decay; a itself is still needed for daA
    a = jnp.exp(la)
    b = delta * x * Bc
    gh = g * Cc

    def fwd_dir(_):
        # h-scan and lambda-scan are data-independent — interleaved when
        # TRAMBA_DUAL_SCAN=1 (scan_rec_log_carry2; sequential otherwise)
        la_sh = _shift_up(la, 0.0)
        h, lam = scan_rec_log_carry2(la, b, carry_fwd, False,
                                     la_sh, gh, lam_in, True)
        h_prev = _shift_down(h, carry_fwd)
        return h, h_prev, lam, a[0:1] * lam[0:1]

    def rev_dir(_):
        la_sh = _shift_down(la, 0.0)
        h, lam = scan_rec_log_carry2(la, b, carry_fwd, True,
                                     la_sh, gh, lam_in, False)
        h_prev = _shift_up(h, carry_fwd)
        return h, h_prev, lam, a[T - 1 :] * lam[T - 1 :]

    h, h_prev, lam, lam_out = fwd_dir(None) if k_is_fwd else rev_dir(None)

    daA = lam * h_prev * a  # da * a
    ddelta = daA * A + lam * x * Bc
    ddt = ddelta * sig
    dBc = jnp.sum(lam * delta * x, axis=1, keepdims=True)  # (T, 1)
    dCc = jnp.sum(g * h, axis=1, keepdims=True)
    d_dts = dot(ddt, wdt, ((1,), (0,)))  # (T, R)
    dx = lam * delta * Bc + g * Ds
    dx = dx + dot(d_dts, wx[:R], ((1,), (0,)))  # (T, R) @ (R, D)
    dx = dx + dBc * wx[R : R + 1] + dCc * wx[R + 1 : R + 2]
    partials = (
        dot(d_dts, x, ((0,), (0,))),  # p_wx_dt (R, D)
        jnp.sum(dBc * x, axis=0, keepdims=True),  # p_wx_B (1, D)
        jnp.sum(dCc * x, axis=0, keepdims=True),  # p_wx_C (1, D)
        dot(ddt, dts, ((0,), (0,))),  # p_wdt (D, R)
        jnp.sum(ddt, axis=0, keepdims=True),  # p_bias
        jnp.sum(daA * delta, axis=0, keepdims=True),  # p_A
        jnp.sum(g * x, axis=0, keepdims=True),  # p_D
    )
    return dx, lam_out, partials


def _accumulate_partials(t, partial_refs, partials):
    """Accumulate weight-grad partials across the (innermost) t grid axis;
    every t maps to the same output block, so it stays resident in VMEM."""

    @pl.when(t == 0)
    def _():
        for ref, val in zip(partial_refs, partials):
            ref[0] = val

    @pl.when(t > 0)
    def _():
        for ref, val in zip(partial_refs, partials):
            ref[0] += val


def _dirs_bwd_kernel(R, transposed, hi, k_is_fwd, x_ref, g_ref, cin_ref, wx_ref, wdt_ref,
                     bias_ref, A_ref, Ds_ref, dx_ref, *rest):
    partial_refs, lam_carry = rest[:-1], rest[-1]
    prec = jax.lax.Precision.HIGHEST if hi else jax.lax.Precision.DEFAULT
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        lam_carry[...] = jnp.zeros_like(lam_carry)

    blk = x_ref[0]
    gblk = g_ref[0]
    if transposed:
        blk = jnp.swapaxes(blk, 0, 1)
        gblk = jnp.swapaxes(gblk, 0, 1)
    shape3 = blk.shape
    T = shape3[0] * shape3[1]
    x = blk.reshape(T, -1).astype(jnp.float32)
    g = gblk.reshape(T, -1).astype(jnp.float32)

    dx, lam_out, partials = _bwd_chunk_math(
        R, prec, k_is_fwd, x, g, cin_ref[0, 0, 0], lam_carry[...],
        wx_ref[0].astype(jnp.float32), wdt_ref[0].astype(jnp.float32),
        bias_ref[0].astype(jnp.float32), A_ref[0].astype(jnp.float32),
        Ds_ref[0].astype(jnp.float32),
    )
    lam_carry[...] = lam_out
    if transposed:
        dx_ref[0, 0, 0] = jnp.swapaxes(dx.reshape(shape3), 0, 1).astype(dx_ref.dtype)
    else:
        dx_ref[0, 0, 0] = dx.reshape(shape3).astype(dx_ref.dtype)
    _accumulate_partials(t, partial_refs, partials)


_P_SHAPES = lambda C, D, R: [(R, D), (1, D), (1, D), (D, R), (1, D), (1, D), (1, D)]


def _dirs_bwd_call(ximg, gimg, carries, wx, wdt, bias, A, Ds, transposed, blk_shape,
                   nT, interpret):
    """One static-direction backward pallas_call per direction; outputs
    stacked to the forward's (B, 2, nT, ...) layout.  Splitting directions
    into separate calls (instead of a traced cond) halves live VMEM."""
    B, D = ximg.shape[0], ximg.shape[-1]
    R = wdt.shape[-1]
    C = wx.shape[1]
    hi = ximg.dtype == jnp.float32
    p_shapes = _P_SHAPES(C, D, R)
    outs = []
    for k in (0, 1):
        # mirror of the forward visiting order: the forward-scanning direction
        # (k=0) is processed nT-1..0 here, the reversed one (k=1) 0..nT-1
        cmap = (lambda t: nT - 1 - t) if k == 0 else (lambda t: t)
        if transposed:
            jmap_x = lambda b, t, _c=cmap: (b, 0, _c(t), 0)
        else:
            jmap_x = lambda b, t, _c=cmap: (b, _c(t), 0, 0)
        spec_x = pl.BlockSpec((1,) + blk_shape, jmap_x, memory_space=pltpu.VMEM)
        par = lambda *s, _k=k: pl.BlockSpec(
            (1,) + s, lambda b, t, _kk=_k: (_kk,) + (0,) * len(s), memory_space=pltpu.VMEM)
        par_out = lambda *s: pl.BlockSpec((1,) + s, lambda b, t: (b,) + (0,) * len(s),
                                          memory_space=pltpu.VMEM)
        cin_spec = pl.BlockSpec((1, 1, 1, 1, D),
                                lambda b, t, _c=cmap, _k=k: (b, _k, _c(t), 0, 0),
                                memory_space=pltpu.VMEM)
        dx_spec = pl.BlockSpec((1, 1, 1) + blk_shape,
                               lambda b, t, _c=cmap: (b, 0, _c(t)) + (0,) * len(blk_shape),
                               memory_space=pltpu.VMEM)
        res = _vcall(
            functools.partial(_dirs_bwd_kernel, R, transposed, hi, k == 0),
            out_shape=[jax.ShapeDtypeStruct((B, 1, nT) + blk_shape, ximg.dtype)]
            + [jax.ShapeDtypeStruct((B,) + s, jnp.float32) for s in p_shapes],
            grid=(B, nT),
            in_specs=[spec_x, spec_x, cin_spec, par(C, D), par(D, R), par(1, D),
                      par(1, D), par(1, D)],
            out_specs=[dx_spec] + [par_out(*s) for s in p_shapes],
            scratch_shapes=[pltpu.VMEM((1, D), jnp.float32)],
            # the adjoint holds ~2x the forward's live chunk state; the
            # default 16MB scoped limit trips at the 96x96/D=256 stages
            interpret=interpret,
        )(ximg, gimg, carries, wx, wdt, bias[:, None, :], A[:, None, :], Ds[:, None, :])
        outs.append(res)
    dx = jnp.concatenate([outs[0][0], outs[1][0]], axis=1)  # (B, 2, nT, ...)
    partials = tuple(jnp.stack([a, b], axis=1)
                     for a, b in zip(outs[0][1:], outs[1][1:]))  # (B, 2, ...)
    return dx, partials


@functools.partial(jax.jit, static_argnames=("interpret",))
def _rows_bwd_pallas(ximg, gimg, carries, wx, wdt, bias, A, Ds, interpret=False):
    """Backward of _rows_pallas.  Returns (dx (B,2,nT,Tr,W,D), 7 partials (B,2,...))."""
    B, H, W, D = ximg.shape
    Tr = _row_chunk(H, W, D)
    return _dirs_bwd_call(ximg, gimg, carries, wx, wdt, bias, A, Ds, False,
                          (Tr, W, D), H // Tr, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _cols_bwd_pallas(ximg, gimg, carries, wx, wdt, bias, A, Ds, interpret=False):
    """Backward of _cols_pallas.  Returns (dx (B,2,nT,H,Tc,D), partials)."""
    B, H, W, D = ximg.shape
    Tc = _col_chunk(W, H, D)
    return _dirs_bwd_call(ximg, gimg, carries, wx, wdt, bias, A, Ds, True,
                          (H, Tc, D), W // Tc, interpret)


def _seq_bwd_kernel(R, hi, L, x_ref, g_ref, cin_ref, wx_ref, wdt_ref, bias_ref, A_ref,
                    Ds_ref, dx_ref, *rest):
    partial_refs, lam_carry = rest[:-1], rest[-1]
    prec = jax.lax.Precision.HIGHEST if hi else jax.lax.Precision.DEFAULT
    t = pl.program_id(1)
    nT = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        lam_carry[...] = jnp.zeros_like(lam_carry)

    x = x_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    T = x.shape[0]
    if L % T != 0:
        # ragged final chunk: zero out-of-bounds rows (they are processed
        # FIRST here, so pad garbage would otherwise flow into valid chunks)
        pos = (nT - 1 - t) * T + jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        x = jnp.where(pos < L, x, 0.0)
        g = jnp.where(pos < L, g, 0.0)
    dx, lam_out, partials = _bwd_chunk_math(
        R, prec, True, x, g, cin_ref[0, 0], lam_carry[...],
        wx_ref[0].astype(jnp.float32), wdt_ref[0].astype(jnp.float32),
        bias_ref[0].astype(jnp.float32), A_ref[0].astype(jnp.float32),
        Ds_ref[0].astype(jnp.float32),
    )
    lam_carry[...] = lam_out
    dx_ref[0] = dx.astype(dx_ref.dtype)

    @pl.when(t == 0)
    def _():
        for ref, val in zip(partial_refs, partials):
            ref[0] = val

    @pl.when(t > 0)
    def _():
        for ref, val in zip(partial_refs, partials):
            ref[0] += val


@functools.partial(jax.jit, static_argnames=("K", "R", "chunk", "interpret", "k_major"))
def _seq_bwd_pallas(xs3, g3, carries, wx, wdt, bias, A, Ds, K: int, R: int,
                    chunk: int = 256, interpret: bool = False, k_major: bool = False):
    """Backward of _fused_pallas.  Returns (dx (BK,L,D), 7 partials (BK,...))."""
    BK, L, D = xs3.shape
    T = min(chunk, L)
    nT = pl.cdiv(L, T)
    C = wx.shape[1]
    nB = BK // K
    kidx = (lambda r: r // nB) if k_major else (lambda r: r % K)
    seq_spec = pl.BlockSpec((1, T, D), lambda r, t: (r, nT - 1 - t, 0),
                            memory_space=pltpu.VMEM)
    par_spec = lambda *shape: pl.BlockSpec(
        (1,) + shape, lambda r, t: (kidx(r),) + (0,) * len(shape), memory_space=pltpu.VMEM
    )
    par_out = lambda *s: pl.BlockSpec((1,) + s, lambda r, t: (r,) + (0,) * len(s),
                                      memory_space=pltpu.VMEM)
    p_shapes = [(R, D), (1, D), (1, D), (D, R), (1, D), (1, D), (1, D)]
    res = _vcall(
        functools.partial(_seq_bwd_kernel, R, xs3.dtype == jnp.float32, L),
        out_shape=[jax.ShapeDtypeStruct((BK, L, D), xs3.dtype)]
        + [jax.ShapeDtypeStruct((BK,) + s, jnp.float32) for s in p_shapes],
        grid=(BK, nT),
        in_specs=[
            seq_spec,
            seq_spec,
            pl.BlockSpec((1, 1, 1, D), lambda r, t: (r, nT - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),
            par_spec(C, D), par_spec(D, R), par_spec(1, D), par_spec(1, D), par_spec(1, D),
        ],
        out_specs=[seq_spec] + [par_out(*s) for s in p_shapes],
        scratch_shapes=[pltpu.VMEM((1, D), jnp.float32)],
        interpret=interpret,
    )(xs3, g3, carries, wx, wdt, bias[:, None, :], A[:, None, :], Ds[:, None, :])
    return res[0], res[1:]


# ---------------------------------------------------------------------------
# Paired-direction line kernel (inference): each Bresenham family's forward
# direction and its per-line-flipped direction computed from ONE read of the
# family sequence, emitting the two directions' SUM directly in family order.
# The flipped direction never materializes: it is a per-line (segmented)
# reversed scan whose cross-line carry chains forward through the lines, so
# both directions share ascending chunk order.  Replaces 2 extra (B, L, D)
# materializations + 2 scan outputs + flip passes per family
# (~2.3 GB/fwd at 96px, scripts/decoder_bench.py).
# ---------------------------------------------------------------------------


def _scan_lines_log(la, b, Hline):
    """Per-line suffix scan from LOG-domain decay: A_cum[p] = prod_{q>=p in
    line} a[q]; hp[p] the matching suffix recurrence sum.  Lines are
    contiguous rows of length ``Hline`` (chunk length is a multiple of it)."""
    return scan_rec_log(la, b, Hline, reverse=True)


def _line_pair_kernel(R, Hline, hi, x_ref, wxe_ref, wxo_ref, wdte_ref, wdto_ref,
                      be_ref, bo_ref, Ae_ref, Ao_ref, Dse_ref, Dso_ref, out_ref,
                      carry_e, carry_o):
    prec = jax.lax.Precision.HIGHEST if hi else jax.lax.Precision.DEFAULT
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        carry_e[...] = jnp.zeros_like(carry_e)
        carry_o[...] = jnp.zeros_like(carry_o)

    x = x_ref[0].astype(jnp.float32)  # (T, D)
    T = x.shape[0]

    def proj(wx_ref, wdt_ref, bias_ref, A_ref):
        dbc = jax.lax.dot_general(x, wx_ref[0].astype(jnp.float32),
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32, precision=prec)
        dt = jax.lax.dot_general(dbc[:, :R], wdt_ref[0].astype(jnp.float32),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32, precision=prec)
        delta = jax.nn.softplus(dt + bias_ref[0].astype(jnp.float32))
        la = delta * A_ref[0].astype(jnp.float32)
        b = delta * x * dbc[:, R : R + 1]
        return dbc, la, b

    pk = None
    if _pack_dbc_on():
        pk = _proj_ab2(x, wxe_ref[0], wxo_ref[0], wdte_ref[0], wdto_ref[0],
                       be_ref[0], bo_ref[0], Ae_ref[0], Ao_ref[0], R, prec)

    # even direction: continuous forward scan across the whole sequence;
    # odd direction: per-line reversed scan, carry chaining forward through
    # lines (the flipped sequence visits lines in order, pixels reversed).
    # The two scans are independent — their pass loops interleave under
    # TRAMBA_DUAL_SCAN (scan_rec_log_carry_line2; PERF.md 2.10)
    dbc_e, la_e, b_e = pk[0] if pk else proj(wxe_ref, wdte_ref, be_ref, Ae_ref)
    dbc_o, la_o, b_o = pk[1] if pk else proj(wxo_ref, wdto_ref, bo_ref, Ao_ref)
    h_e, (A_ln, hp_ln) = scan_rec_log_carry_line2(
        la_e, b_e, carry_e[...], la_o, b_o, Hline)
    carry_e[...] = h_e[T - 1 :, :]
    c = carry_o[...]  # (1, D)
    segs = []
    for m in range(T // Hline):
        seg_A = A_ln[m * Hline : (m + 1) * Hline]
        seg_h = hp_ln[m * Hline : (m + 1) * Hline]
        segs.append(seg_h + seg_A * c)
        c = seg_h[0:1] + seg_A[0:1] * c  # h at the line's last flipped pos
    h_o = jnp.concatenate(segs, axis=0)
    carry_o[...] = c

    y = h_e * dbc_e[:, R + 1 : R + 2] + x * Dse_ref[0].astype(jnp.float32) \
        + h_o * dbc_o[:, R + 1 : R + 2] + x * Dso_ref[0].astype(jnp.float32)
    out_ref[0] = y.astype(out_ref.dtype)


def _line_pair_chunk(L, Hline, D):
    """Chunk length: multiple of the line length within the VMEM budget.

    Mosaic requires the blocked (sublane) dim be %8 or equal to the full
    array dim, so chunks must also be multiples of 8 unless they cover the
    whole map — at 224px SOD maps (Hline 14/28) the line length itself is
    not %8 and the smallest legal chunk is lcm-like (56) or L."""
    target = max(Hline, (65536 // max(D, 1)) // Hline * Hline)
    valid = [t for t in range(Hline, L + 1, Hline)
             if L % t == 0 and (t % 8 == 0 or t == L)]
    under = [t for t in valid if t <= target]
    return max(under) if under else min(valid)


@functools.partial(jax.jit, static_argnames=("Hline", "R", "interpret"))
def _line_pair_pallas(seq, wx2, wdt2, bias2, A2, Ds2, Hline: int, R: int,
                      interpret: bool = False):
    """seq: (B, L, D) — ONE Bresenham family's sequence.  wx2..Ds2 carry the
    family's two directions [fwd, per-line-flip].  Returns (B, L, D): the two
    directions' sum in family order."""
    B, L, D = seq.shape
    T = _line_pair_chunk(L, Hline, D)
    nT = L // T
    C = wx2.shape[1]
    seq_spec = pl.BlockSpec((1, T, D), lambda r, t: (r, t, 0), memory_space=pltpu.VMEM)
    pe = lambda *s: pl.BlockSpec((1,) + s, lambda r, t: (0,) + (0,) * len(s),
                                 memory_space=pltpu.VMEM)
    po = lambda *s: pl.BlockSpec((1,) + s, lambda r, t: (1,) + (0,) * len(s),
                                 memory_space=pltpu.VMEM)
    return _vcall(
        functools.partial(_line_pair_kernel, R, Hline, seq.dtype == jnp.float32),
        out_shape=jax.ShapeDtypeStruct((B, L, D), seq.dtype),
        grid=(B, nT),
        in_specs=[
            seq_spec,
            pe(C, D), po(C, D), pe(D, R), po(D, R),
            pe(1, D), po(1, D), pe(1, D), po(1, D), pe(1, D), po(1, D),
        ],
        out_specs=seq_spec,
        scratch_shapes=[pltpu.VMEM((1, D), jnp.float32), pltpu.VMEM((1, D), jnp.float32)],
        interpret=interpret,
    )(seq, wx2, wx2, wdt2, wdt2, bias2[:, None, :], bias2[:, None, :],
      A2[:, None, :], A2[:, None, :], Ds2[:, None, :], Ds2[:, None, :])


def _line_pair_forward(x_flat, wx4, wdt4, bias4, A4, Ds4, H, W, interp):
    """4 line directions -> (B, L, D) merged line contribution, via the paired
    kernel (square maps only; line length == H == W)."""
    from tramba_tpu.ops.scan_orders import _line_family_scan, _line_family_merge, _line_selectors

    B, L, D = x_flat.shape
    ximg = x_flat.reshape(B, H, W, D)
    (P1a, Q2a), (P1b, Q2b) = _line_selectors(H, W)
    R = wdt4.shape[-1]
    y = None
    for f, (P1, Q2) in enumerate(((P1a, Q2a), (P1b, Q2b))):
        fam = _line_family_scan(ximg, jnp.asarray(P1), jnp.asarray(Q2))
        ys = _line_pair_pallas(fam, wx4[2 * f : 2 * f + 2], wdt4[2 * f : 2 * f + 2],
                               bias4[2 * f : 2 * f + 2], A4[2 * f : 2 * f + 2],
                               Ds4[2 * f : 2 * f + 2], Hline=H, R=R, interpret=interp)
        m = _line_family_merge(ys, jnp.asarray(P1), jnp.asarray(Q2), H, W)
        y = m if y is None else y + m
    return y.reshape(B, L, D)


def _assemble_wx(p):
    """partials (.., R, D), (.., 1, D), (.., 1, D) -> (.., C, D)."""
    return jnp.concatenate([p[0], p[1], p[2]], axis=-2)


def composed_ss2d_full(x_flat, x_proj_w, dt_w, dt_b, A_logs, Ds, ln_scale, ln_bias, w_out,
                       kind: str, H: int, W: int, backend=None):
    """Composed oracle for the direction-folded path: cross-scan -> per-dir
    core -> cross-merge -> LayerNorm -> exact GELU -> out projection."""
    from tramba_tpu.ops.scan_orders import cross_merge, cross_scan

    xs = cross_scan(x_flat, kind, H, W, 0)
    ys = composed_ss2d_core(xs, x_proj_w, dt_w, dt_b, A_logs, Ds, backend=backend)
    y = cross_merge(ys, kind, H, W, 0)
    return _ln_gelu_proj(y, ln_scale, ln_bias, w_out, x_flat.dtype)


def _two_phase_train() -> bool:
    """Train-forward routing A/B: the two-phase paired kernels emit fewer HBM
    maps but recompute the projections/transcendentals in phase 2 (the
    kernels are compute-bound, so this measured ~neutral: 181-182 vs 174-182
    ms/step).  Default on (fewer kernels, less HBM); TRAMBA_TWO_PHASE_TRAIN=0
    flips to the materializing rows/cols+merge route."""
    return os.environ.get("TRAMBA_TWO_PHASE_TRAIN", "1") != "0"


def _folded_forward(x_flat, x_proj_w, dt_w, dt_b, A_logs, Ds, ln_scale, ln_bias, w_out,
                    kind: str, H: int, W: int, train: bool = False):
    B, L, D = x_flat.shape
    ximg = x_flat.reshape(B, H, W, D)
    interp = jax.default_backend() != "tpu"
    f32 = jnp.float32
    A = -jnp.exp(A_logs.astype(f32))[..., 0]  # (K, D)
    wx, wdt = x_proj_w.astype(f32), dt_w.astype(f32)
    bias, Dsf = dt_b.astype(f32), Ds.astype(f32)

    if not train and (kind == "raster" or H == W):
        # inference: two-phase paired-direction passes (fewer HBM map passes)
        return _two_phase_forward(x_flat, wx, wdt, bias, A, Dsf, ln_scale, ln_bias,
                                  w_out, kind, H, W, interp)
    rows_sel = jnp.asarray([0, 2])
    cols_sel = jnp.asarray([1, 3])
    c02 = c13 = c_line = None
    if train and _two_phase_train() and (kind == "raster" or H == W):
        # train forward via the SAME two-phase paired kernels: the exclusive
        # chunk carries from _pair_carries are exactly the fp32 chunk-entry
        # carries the native backward recomputes from, and the merge tail
        # emits the pre-LN sum — the per-direction outputs never reach HBM
        y_line = None
        if kind == "line":
            from tramba_tpu.ops.scan_orders import _line_dirs_list, _line_merge_dirs

            dirs = _line_dirs_list(x_flat, H, W)
            ys_line, c_line = _fused_pallas(
                jnp.concatenate(dirs, axis=0), wx[4:], wdt[4:], bias[4:], A[4:],
                Dsf[4:], K=4, R=dt_w.shape[-1], interpret=interp, k_major=True,
                emit_carries=True,
            )
            y_line = _line_merge_dirs(
                [ys_line[i * B : (i + 1) * B] for i in range(4)], H, W
            ).astype(x_flat.dtype)
        s13 = _pair_phase1(ximg, wx[cols_sel], wdt[cols_sel], bias[cols_sel],
                           A[cols_sel], transposed=True, interpret=interp)
        c13 = _pair_carries(s13, interpret=interp)
        y13 = _pair_phase2_cols(ximg, c13, wx[cols_sel], wdt[cols_sel],
                                bias[cols_sel], A[cols_sel], Dsf[cols_sel],
                                interpret=interp)
        s02 = _pair_phase1(ximg, wx[rows_sel], wdt[rows_sel], bias[rows_sel],
                           A[rows_sel], transposed=False, interpret=interp)
        c02 = _pair_carries(s02, interpret=interp)
        out, y_sum = _pair_phase2_rows_merge(
            ximg, c02, y13, y_line, wx[rows_sel], wdt[rows_sel], bias[rows_sel],
            A[rows_sel], Dsf[rows_sel], ln_scale, ln_bias, w_out,
            interpret=interp, emit_ysum=True)
        return out, (y_sum, c02[..., None, :], c13[..., None, :], c_line)
    y02 = _rows_pallas(ximg, wx[rows_sel], wdt[rows_sel], bias[rows_sel], A[rows_sel],
                       Dsf[rows_sel], interpret=interp, emit_carries=train)
    y13 = _cols_pallas(ximg, wx[cols_sel], wdt[cols_sel], bias[cols_sel], A[cols_sel],
                       Dsf[cols_sel], interpret=interp, emit_carries=train)
    if train:
        y02, c02 = y02
        y13, c13 = y13
    y_line = None
    if kind == "line":
        if not train and H == W:
            # paired-direction kernel: flipped dirs never materialize
            y_line = _line_pair_forward(x_flat, wx[4:], wdt[4:], bias[4:], A[4:],
                                        Dsf[4:], H, W, interp)
        else:
            from tramba_tpu.ops.scan_orders import _line_dirs_list, _line_merge_dirs

            dirs = _line_dirs_list(x_flat, H, W)  # 4 x (B, L, D), MXU one-hot matmuls
            ys_line = _fused_pallas(
                jnp.concatenate(dirs, axis=0), wx[4:], wdt[4:], bias[4:], A[4:], Dsf[4:],
                K=4, R=dt_w.shape[-1], interpret=interp, k_major=True, emit_carries=train,
            )
            if train:
                ys_line, c_line = ys_line
            y_line = _line_merge_dirs([ys_line[i * B : (i + 1) * B] for i in range(4)], H, W)
    out = _merge_pallas(y02, y13, y_line, ln_scale, ln_bias, w_out, H=H, W=W,
                        interpret=interp, emit_ysum=train)
    if train:
        out, y_sum = out
        return out, (y_sum, c02, c13, c_line)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def fused_ss2d_full(x_flat, x_proj_w, dt_w, dt_b, A_logs, Ds, ln_scale, ln_bias, w_out,
                    kind: str, H: int, W: int):
    """Direction-folded fused SS2D: raster cross-scan/merge live only as
    kernel index maps; merge + LayerNorm + GELU + out projection fused.
    Backward is native: the LN/GELU/proj adjoint runs over the saved pre-LN
    direction sum, then one reverse-order kernel pass per direction family
    recomputes intra-chunk state from the emitted boundary carries."""
    return _folded_forward(x_flat, x_proj_w, dt_w, dt_b, A_logs, Ds, ln_scale, ln_bias,
                           w_out, kind, H, W)


def _full_fwd(x_flat, x_proj_w, dt_w, dt_b, A_logs, Ds, ln_scale, ln_bias, w_out, kind, H, W):
    out, (y_sum, c02, c13, c_line) = _folded_forward(
        x_flat, x_proj_w, dt_w, dt_b, A_logs, Ds, ln_scale, ln_bias, w_out, kind, H, W,
        train=True,
    )
    return out, (x_flat, x_proj_w, dt_w, dt_b, A_logs, Ds, ln_scale, ln_bias, w_out,
                 y_sum, c02, c13, c_line)


def _full_bwd(kind, H, W, res, g):
    (x_flat, x_proj_w, dt_w, dt_b, A_logs, Ds, ln_scale, ln_bias, w_out,
     y_sum, c02, c13, c_line) = res
    B, L, D = x_flat.shape
    f32 = jnp.float32
    interp = jax.default_backend() != "tpu"
    A = -jnp.exp(A_logs.astype(f32))[..., 0]
    wx, wdt = x_proj_w.astype(f32), dt_w.astype(f32)
    bias, Dsf = dt_b.astype(f32), Ds.astype(f32)

    # LN + GELU + out-proj adjoint: one fused XLA pass over the saved sum
    _, vjp_ln = jax.vjp(
        lambda y, s, b, w: _ln_gelu_proj(y, s, b, w, x_flat.dtype),
        y_sum, ln_scale, ln_bias, w_out,
    )
    gy, d_ln_scale, d_ln_bias, d_w_out = vjp_ln(g)
    gimg = gy.reshape(B, H, W, D)
    ximg = x_flat.reshape(B, H, W, D)

    rows_sel = jnp.asarray([0, 2])
    cols_sel = jnp.asarray([1, 3])
    dx02, p02 = _rows_bwd_pallas(ximg, gimg, c02, wx[rows_sel], wdt[rows_sel],
                                 bias[rows_sel], A[rows_sel], Dsf[rows_sel],
                                 interpret=interp)
    dx13, p13 = _cols_bwd_pallas(ximg, gimg, c13, wx[cols_sel], wdt[cols_sel],
                                 bias[cols_sel], A[cols_sel], Dsf[cols_sel],
                                 interpret=interp)
    dx = dx02.sum(1).reshape(B, H, W, D)
    dx = dx + dx13.sum(1).transpose(0, 2, 1, 3, 4).reshape(B, H, W, D)

    r02 = [p.sum(0) for p in p02]  # (2, ...) per-direction weight grads
    r13 = [p.sum(0) for p in p13]
    ilv = lambda a, b: jnp.stack([a[0], b[0], a[1], b[1]], axis=0)  # K order 0,1,2,3
    dwx = ilv(_assemble_wx(r02), _assemble_wx(r13))
    dwdt = ilv(r02[3], r13[3])
    dbias = ilv(r02[4][:, 0], r13[4][:, 0])
    dA = ilv(r02[5][:, 0], r13[5][:, 0])
    dDs = ilv(r02[6][:, 0], r13[6][:, 0])

    if kind == "line":
        from tramba_tpu.ops.scan_orders import _line_dirs_list, _line_merge_dirs

        dirs, vjp_dirs = jax.vjp(
            lambda xf: jnp.concatenate(_line_dirs_list(xf, H, W), axis=0), x_flat
        )
        zeros = tuple(jnp.zeros((B, L, D), f32) for _ in range(4))
        _, vjp_merge = jax.vjp(lambda ys: _line_merge_dirs(list(ys), H, W), zeros)
        (g_dirs,) = vjp_merge(gy.astype(f32))
        g3 = jnp.concatenate(list(g_dirs), axis=0).astype(dirs.dtype)
        dxs3, pl_line = _seq_bwd_pallas(
            dirs, g3, c_line, wx[4:], wdt[4:], bias[4:], A[4:], Dsf[4:],
            K=4, R=dt_w.shape[-1], interpret=interp, k_major=True,
        )
        (dx_line,) = vjp_dirs(dxs3)
        dx = dx + dx_line.reshape(B, H, W, D)
        rl = [p.reshape(4, B, *p.shape[1:]).sum(1) for p in pl_line]  # k-major rows
        dwx = jnp.concatenate([dwx, _assemble_wx(rl)], axis=0)
        dwdt = jnp.concatenate([dwdt, rl[3]], axis=0)
        dbias = jnp.concatenate([dbias, rl[4][:, 0]], axis=0)
        dA = jnp.concatenate([dA, rl[5][:, 0]], axis=0)
        dDs = jnp.concatenate([dDs, rl[6][:, 0]], axis=0)

    return (
        dx.reshape(B, L, D).astype(x_flat.dtype),
        dwx.astype(x_proj_w.dtype),
        dwdt.astype(dt_w.dtype),
        dbias.astype(dt_b.dtype),
        ((dA * A)[..., None]).astype(A_logs.dtype),
        dDs.astype(Ds.dtype),
        d_ln_scale,
        d_ln_bias,
        d_w_out,
    )


fused_ss2d_full.defvjp(_full_fwd, _full_bwd)


# ---------------------------------------------------------------------------
# Permuted-sequence folding: dilated and windowed orders (the DFVSS branches)
# reuse the rows kernel on a pre-permuted view.
#
# Key identities (square maps, L % rate == 0):
#   dilation dir0 = row-major of xp  := phase_major(x)
#   dilation dir2 = full reverse of dir0            -> rows kernel backward
#   dilation dir1/dir3 = the same over transpose(x)
#   window  dir0 = row-major of xw  := window_order(x);  dir1 = full reverse
#   window  dir2/dir3 = the same over transpose(x)
# so each order is two rows-kernel calls; outputs come back in permuted-pixel
# order and one inverse layout pass restores image order.
# ---------------------------------------------------------------------------


def _seq_width(L, D):
    Wc = 1
    for w in range(8, min(L, 512) + 1, 8):
        if L % w == 0 and w * 1 <= _seq_target(D):
            Wc = w
    if Wc == 1:
        Wc = L  # tiny sequences: single row
    return Wc


def _seq_rows(x_perm, wx, wdt, bias, A, Ds, interp, emit_carries=False):
    """rows kernel over a flat (B, L, D) sequence via a 2-D view."""
    B, L, D = x_perm.shape
    Wc = _seq_width(L, D)
    view = x_perm.reshape(B, L // Wc, Wc, D)
    res = _rows_pallas(view, wx, wdt, bias, A, Ds, interpret=interp,
                       emit_carries=emit_carries)
    if emit_carries:
        ys, carries = res
        return ys.reshape(B, 2, L, D), carries
    return res.reshape(B, 2, L, D)


def _seq_rows_bwd(x_perm, g_seq, carries, wx, wdt, bias, A, Ds, interp):
    """Backward of _seq_rows: returns (dx (B, L, D) summed over the two
    directions, partials).  ``g_seq``: (B, L, D) — the same cotangent feeds
    both directions (their outputs were summed)."""
    B, L, D = x_perm.shape
    Wc = _seq_width(L, D)
    view = x_perm.reshape(B, L // Wc, Wc, D)
    gview = g_seq.reshape(B, L // Wc, Wc, D)
    dxv, partials = _rows_bwd_pallas(view, gview, carries, wx, wdt, bias, A, Ds,
                                     interpret=interp)
    return dxv.sum(1).reshape(B, L, D), partials


def _freq_perms(kind: str, H: int, W: int, param: int):
    """(permute fn x -> (xp, xpt), inverse-combine fn (sa, sb) -> y, sel_a, sel_b)."""
    from tramba_tpu.ops import scan_orders as so

    if kind == "dilation":
        rate = param or 4

        def perm(xf):
            return so._phase_major(xf, rate), so._phase_major(so._t(xf, H, W), rate)

        def inv(sa, sb):
            return so._phase_major_inv(sa, rate) + so._t(so._phase_major_inv(sb, rate), W, H)

        return perm, inv, jnp.asarray([0, 2]), jnp.asarray([1, 3])

    ws = param

    def perm(xf):
        return (so._window_order(xf, H, W, ws),
                so._window_order(so._t(xf, H, W), W, H, ws))

    def inv(sa, sb):
        return (so._window_order_inv(sa, H, W, ws)
                + so._t(so._window_order_inv(sb, W, H, ws), W, H))

    return perm, inv, jnp.asarray([0, 1]), jnp.asarray([2, 3])


def _folded_freq_forward(x_flat, x_proj_w, dt_w, dt_b, A_logs, Ds, ln_scale, ln_bias, w_out,
                         kind: str, H: int, W: int, param: int, train: bool = False):
    B, L, D = x_flat.shape
    interp = jax.default_backend() != "tpu"
    f32 = jnp.float32
    A = -jnp.exp(A_logs.astype(f32))[..., 0]
    wx, wdt = x_proj_w.astype(f32), dt_w.astype(f32)
    bias, Dsf = dt_b.astype(f32), Ds.astype(f32)

    perm, inv, sel_a, sel_b = _freq_perms(kind, H, W, param)
    xp, xpt = perm(x_flat)
    prm = (param or 4) if kind == "dilation" else param
    if train and not _two_phase_train():
        ys_a, ca = _seq_rows(xp, wx[sel_a], wdt[sel_a], bias[sel_a], A[sel_a],
                             Dsf[sel_a], interp, emit_carries=True)
        ys_b, cb = _seq_rows(xpt, wx[sel_b], wdt[sel_b], bias[sel_b], A[sel_b],
                             Dsf[sel_b], interp, emit_carries=True)
        sa = ys_a[:, 0] + ys_a[:, 1]
        sb = ys_b[:, 0] + ys_b[:, 1]
        y = inv(sa, sb).astype(f32)
        out = _ln_gelu_proj(y, ln_scale, ln_bias, w_out, x_flat.dtype)
        return out, (y, ca, cb)
    if not train:
        # two-phase paired directions: each family's sum in one output map
        sa = _seq_pair(xp, wx[sel_a], wdt[sel_a], bias[sel_a], A[sel_a],
                       Dsf[sel_a], interp)
        sb = _seq_pair(xpt, wx[sel_b], wdt[sel_b], bias[sel_b], A[sel_b],
                       Dsf[sel_b], interp)
        if _freq_merge_ok(kind, H, W, D, prm, B, jnp.dtype(x_flat.dtype).itemsize):
            # fold inverse permutation + LN/GELU/proj into one kernel
            return _freq_merge_pallas(sa, sb, ln_scale, ln_bias, w_out, kind, H, W,
                                      prm, interpret=interp)
        y = inv(sa, sb).astype(f32)
        return _ln_gelu_proj(y, ln_scale, ln_bias, w_out, x_flat.dtype)
    # train: the SAME two-phase paired kernels, with the exclusive chunk
    # carries emitted for the native backward — the per-direction outputs
    # never reach HBM (the pair kernel emits each family's sum directly)
    def fam(x_perm, sel):
        Wc = _seq_width(L, D)
        view = x_perm.reshape(B, L // Wc, Wc, D)
        s = _pair_phase1(view, wx[sel], wdt[sel], bias[sel], A[sel],
                         transposed=False, interpret=interp)
        c = _pair_carries(s, interpret=interp)
        ysum = _pair_phase2_rows_plain(view, c, wx[sel], wdt[sel], bias[sel],
                                       A[sel], Dsf[sel], interpret=interp)
        return ysum.reshape(B, L, D), c[..., None, :]

    sa, ca = fam(xp, sel_a)
    sb, cb = fam(xpt, sel_b)
    y = inv(sa, sb).astype(f32)
    out = _ln_gelu_proj(y, ln_scale, ln_bias, w_out, x_flat.dtype)
    return out, (y, ca, cb)


# ---------------------------------------------------------------------------
# Two-phase direction pairs (inference): recompute is near-free on this VPU
# (scripts/vpu_probe.py: the softplus/exp chain runs at ~copy bandwidth), so
# a cheap summary pass + a tiny XLA carry scan let one second pass compute a
# family's forward AND reversed directions together and emit their SUM —
# and the rows pass doubles as the final merge (+ LN + GELU + out proj).
# Raster core HBM passes drop from ~10.5 to ~6.25 map-sizes.
# ---------------------------------------------------------------------------


def _proj_ab(x, wx, wdt, bias, A, R, prec):
    f32 = jnp.float32
    dbc = jax.lax.dot_general(x, wx.astype(f32), (((1,), (1,)), ((), ())),
                              preferred_element_type=f32, precision=prec)
    dt = jax.lax.dot_general(dbc[:, :R], wdt.astype(f32), (((1,), (1,)), ((), ())),
                             preferred_element_type=f32, precision=prec)
    delta = jax.nn.softplus(dt + bias.astype(f32))
    la = delta * A.astype(f32)  # LOG-domain decay; scan entries exp() as needed
    b = delta * x * dbc[:, R : R + 1]
    return dbc, la, b


def _pack_dbc_on():
    """Default ON (round 4 tail): interleaved seg_ab 0.97-1.00 on all 13
    segments, TOTAL 0.99; full-model scan_ab 136.88 vs 138.09 ms median
    (0.991x), on-arm strictly faster in all 4 rounds.  docs/PERF.md 2.8."""
    return os.environ.get("TRAMBA_PACK_DBC", "1") == "1"


def _packed_dbc(x, wx0, wx1, prec):
    """One (T,D)@(D,2C) matmul for two directions' dbc projections sharing a
    source ``x``; returns the dir-0 / dir-1 column slices.  The split width C
    comes from the weights themselves (each ``wx`` is (C, D)), never
    recomputed from R — so a projection-width change cannot silently
    misalign dir 1's columns (ADVICE r4).  Shared by :func:`_proj_ab2` and
    the smallmap megakernel so the packing stays numerically in one place."""
    assert wx0.shape == wx1.shape, (wx0.shape, wx1.shape)
    f32 = jnp.float32
    C = wx0.shape[0]
    w2 = jnp.concatenate([wx0.astype(f32), wx1.astype(f32)], axis=0)
    d2 = jax.lax.dot_general(x.astype(f32), w2, (((1,), (1,)), ((), ())),
                             preferred_element_type=f32, precision=prec)
    return d2[:, :C], d2[:, C:]


def _proj_ab2(x, wx0, wx1, wdt0, wdt1, bias0, bias1, A0, A1, R, prec):
    """Both directions of a pair projected from ONE x, with the two
    (T,D)@(D,C) dbc matmuls (C=R+2, ~34 of 128 MXU lanes each) PACKED into a
    single (T,D)@(D,2C) matmul — halves MXU passes at the price of dir 1's
    dbc columns starting at an unaligned lane offset (a Mosaic relayout on
    the slice).  Trace-time knob ``TRAMBA_PACK_DBC``; callers keep their
    original textual op order when it is off.  Per-column dot products are
    identical, so on/off is numerically exact (tests/test_pack_dbc.py)."""
    f32 = jnp.float32
    dbc_a, dbc_b = _packed_dbc(x, wx0, wx1, prec)

    def tail(dbc, wdt, bias, A):
        dt = jax.lax.dot_general(dbc[:, :R], wdt.astype(f32),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=f32, precision=prec)
        delta = jax.nn.softplus(dt + bias.astype(f32))
        la = delta * A.astype(f32)
        b = delta * x * dbc[:, R : R + 1]
        return dbc, la, b

    return (tail(dbc_a, wdt0, bias0, A0),
            tail(dbc_b, wdt1, bias1, A1))


def _reduce_chunk(a, b, reverse):
    """Chunk total of the recurrence as a pairwise tree — O(T) work (the
    phase-1 pass must NOT pay the O(T log T) scan; vpu_probe.py shows the
    scan is the kernels' dominant compute).  Returns (A_prod, h_total)."""
    if os.environ.get("TRAMBA_EMPTY_SCAN", "0") == "1":
        return a[0:1], b[0:1]  # floor-measurement twin (see _scan_masked)
    T = a.shape[0]
    D = a.shape[-1]
    while T > 1 and T % 2 == 0:
        a2 = a.reshape(T // 2, 2, D)
        b2 = b.reshape(T // 2, 2, D)
        if reverse:  # segment fold, later rows applied first: h = b0 + a0*b1
            b = b2[:, 0] + a2[:, 0] * b2[:, 1]
        else:  # h = a1 * b0 + b1
            b = a2[:, 1] * b2[:, 0] + b2[:, 1]
        a = a2[:, 0] * a2[:, 1]
        T //= 2
    # small odd residue: sequential fold over the remaining segment results
    At, bt = a[0:1], b[0:1]
    for i in range(1, T):
        if reverse:
            bt = bt + At * b[i : i + 1]
        else:
            bt = a[i : i + 1] * bt + b[i : i + 1]
        At = At * a[i : i + 1]
    return At, bt


def _pair_phase1_kernel(R, transposed, hi, x_ref, wx_ref, wdt_ref, bias_ref, A_ref,
                        out_ref):
    """Per-chunk scan summaries for a (fwd, rev) direction pair: out block
    (1, 1, 2, 2, D) = [dir][A_prod | h_local]."""
    prec = jax.lax.Precision.HIGHEST if hi else jax.lax.Precision.DEFAULT
    blk = x_ref[0]
    if transposed:
        blk = jnp.swapaxes(blk, 0, 1)
    T = blk.shape[0] * blk.shape[1]
    x = blk.reshape(T, -1).astype(jnp.float32)
    if _pack_dbc_on():
        (_, la_e, b_e), (_, la_o, b_o) = _proj_ab2(
            x, wx_ref[0], wx_ref[1], wdt_ref[0], wdt_ref[1],
            bias_ref[0], bias_ref[1], A_ref[0], A_ref[1], R, prec)
        Ae, he = _reduce_chunk(jnp.exp(la_e), b_e, reverse=False)
        Ao, ho = _reduce_chunk(jnp.exp(la_o), b_o, reverse=True)
    else:
        _, la_e, b_e = _proj_ab(x, wx_ref[0], wdt_ref[0], bias_ref[0], A_ref[0], R, prec)
        Ae, he = _reduce_chunk(jnp.exp(la_e), b_e, reverse=False)
        _, la_o, b_o = _proj_ab(x, wx_ref[1], wdt_ref[1], bias_ref[1], A_ref[1], R, prec)
        Ao, ho = _reduce_chunk(jnp.exp(la_o), b_o, reverse=True)
    out_ref[0, 0, 0, 0] = Ae[0]
    out_ref[0, 0, 0, 1] = he[0]
    out_ref[0, 0, 1, 0] = Ao[0]
    out_ref[0, 0, 1, 1] = ho[0]


def _carries_kernel(nT, s_ref, out_ref):
    """Exclusive (A, h) chains over the chunk summaries — one tiny kernel
    per family instead of XLA associative scans (whose fixed per-op cost at
    these sizes ate the two-phase savings)."""
    f32 = jnp.float32
    c = jnp.zeros((1, s_ref.shape[-1]), f32)
    for t in range(nT):  # fwd dir: ascending chunks
        out_ref[0, 0, t] = c[0]
        c = s_ref[0, t, 0, 0].astype(f32) * c + s_ref[0, t, 0, 1].astype(f32)
    c = jnp.zeros_like(c)
    for t in range(nT - 1, -1, -1):  # rev dir: descending chunks
        out_ref[0, 1, t] = c[0]
        c = s_ref[0, t, 1, 0].astype(f32) * c + s_ref[0, t, 1, 1].astype(f32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pair_carries(summ, interpret=False):
    """summ (B, nT, 2, 2, D) f32 -> carries (B, 2, nT, D): exclusive chain of
    (A, h) pairs — ascending chunks for the fwd dir, descending for rev."""
    B, nT, _, _, D = summ.shape
    return _vcall(
        functools.partial(_carries_kernel, nT),
        out_shape=jax.ShapeDtypeStruct((B, 2, nT, D), jnp.float32),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, nT, 2, 2, D), lambda b: (b, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, nT, D), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(summ)


def _pair_phase2_kernel(R, transposed, hi, emit_merge, has_line, emit_ysum,
                        x_ref, c_ref, wx_ref, wdt_ref, bias_ref, A_ref, Ds_ref,
                        *rest):
    """Both directions of a family with precomputed carries, emitted SUMMED.
    ``emit_merge``: also read the other family's summed map (+ optional line
    map) and finish with LN + GELU + out projection.  ``emit_ysum``: also
    write the pre-LN direction sum (the LN-adjoint residual for training)."""
    prec = jax.lax.Precision.HIGHEST if hi else jax.lax.Precision.DEFAULT
    f32 = jnp.float32
    ysum_ref = None
    if emit_merge:
        if has_line:
            yob_ref, yline_ref, s_ref, b_ref, wout_ref, *outs = rest
        else:
            yob_ref, s_ref, b_ref, wout_ref, *outs = rest
            yline_ref = None
        out_ref = outs[0]
        if emit_ysum:
            ysum_ref = outs[1]
    else:
        (out_ref,) = rest
    blk = x_ref[0]
    if transposed:
        blk = jnp.swapaxes(blk, 0, 1)
    shp = blk.shape
    T = shp[0] * shp[1]
    x = blk.reshape(T, -1).astype(f32)
    if _dual_scan_on():
        # interleave the two independent direction scans (scan_rec_log_carry2
        # docstring): both projections first, then alternating pass loops
        if _pack_dbc_on():
            (dbc0, la0, b0), (dbc1, la1, b1) = _proj_ab2(
                x, wx_ref[0], wx_ref[1], wdt_ref[0], wdt_ref[1],
                bias_ref[0], bias_ref[1], A_ref[0], A_ref[1], R, prec)
        else:
            dbc0, la0, b0 = _proj_ab(x, wx_ref[0], wdt_ref[0], bias_ref[0], A_ref[0], R, prec)
            dbc1, la1, b1 = _proj_ab(x, wx_ref[1], wdt_ref[1], bias_ref[1], A_ref[1], R, prec)
        h0, h1 = scan_rec_log_carry2(
            la0, b0, c_ref[0, 0, 0, 0].astype(f32), False,
            la1, b1, c_ref[0, 1, 0, 0].astype(f32), True)
        y = (h0 * dbc0[:, R + 1 : R + 2] + x * Ds_ref[0].astype(f32)) \
            + (h1 * dbc1[:, R + 1 : R + 2] + x * Ds_ref[1].astype(f32))
    else:
        packed = None
        if _pack_dbc_on():
            packed = _proj_ab2(x, wx_ref[0], wx_ref[1], wdt_ref[0], wdt_ref[1],
                               bias_ref[0], bias_ref[1], A_ref[0], A_ref[1], R, prec)
        y = None
        for d, rev in ((0, False), (1, True)):
            if packed is not None:
                dbc, la, b = packed[d]
            else:
                dbc, la, b = _proj_ab(x, wx_ref[d], wdt_ref[d], bias_ref[d], A_ref[d], R, prec)
            h = scan_rec_log_carry(la, b, c_ref[0, d, 0, 0].astype(f32), reverse=rev)
            yk = h * dbc[:, R + 1 : R + 2] + x * Ds_ref[d].astype(f32)
            y = yk if y is None else y + yk
    if not emit_merge:
        if transposed:
            out_ref[0, 0] = jnp.swapaxes(y.reshape(shp), 0, 1).astype(out_ref.dtype)
        else:
            out_ref[0, 0] = y.reshape(shp).astype(out_ref.dtype)
        return
    # merge tail: + other family's (w-major) summed map, + line map, LN/GELU/proj
    Tr, W, D = shp
    yob = yob_ref[0].astype(f32)  # (nTc, Tr, Tc, D)
    yob = jnp.swapaxes(yob, 0, 1).reshape(T, D)
    y = y + yob
    if yline_ref is not None:
        y = y + yline_ref[0].astype(f32)
    if ysum_ref is not None:
        ysum_ref[0] = y.astype(ysum_ref.dtype)  # pre-LN sum for the bwd
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean((y - mean) ** 2, axis=-1, keepdims=True)
    y = (y - mean) * jax.lax.rsqrt(var + 1e-5)
    y = y * s_ref[...].astype(f32) + b_ref[...].astype(f32)
    y = 0.5 * y * (1.0 + _erf(y * jnp.float32(0.7071067811865476)))
    y = jax.lax.dot_general(y.astype(wout_ref.dtype), wout_ref[...],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=f32, precision=prec)
    out_ref[0] = y.astype(out_ref.dtype)


def _pair_par(*s):
    return pl.BlockSpec(s, lambda b, t: (0,) * len(s), memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("transposed", "interpret"))
def _pair_phase1(ximg, wx2, wdt2, bias2, A2, transposed=False, interpret=False):
    B, H, W, D = ximg.shape
    if transposed:
        Tc = _col_chunk(W, H, D)
        nT = W // Tc
        x_spec = pl.BlockSpec((1, H, Tc, D), lambda b, t: (b, 0, t, 0),
                              memory_space=pltpu.VMEM)
    else:
        Tr = _row_chunk(H, W, D)
        nT = H // Tr
        x_spec = pl.BlockSpec((1, Tr, W, D), lambda b, t: (b, t, 0, 0),
                              memory_space=pltpu.VMEM)
    R = wdt2.shape[-1]
    C = wx2.shape[1]
    return _vcall(
        functools.partial(_pair_phase1_kernel, R, transposed,
                          ximg.dtype == jnp.float32),
        out_shape=jax.ShapeDtypeStruct((B, nT, 2, 2, D), jnp.float32),
        grid=(B, nT),
        in_specs=[x_spec, _pair_par(2, C, D), _pair_par(2, D, R), _pair_par(2, 1, D),
                  _pair_par(2, 1, D)],
        out_specs=pl.BlockSpec((1, 1, 2, 2, D), lambda b, t: (b, t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(ximg, wx2, wdt2, bias2[:, None, :], A2[:, None, :])


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pair_phase2_cols(ximg, carries, wx2, wdt2, bias2, A2, Ds2, interpret=False):
    """Summed (dir1 + dir3) map in w-major chunk layout (B, nTc, H, Tc, D)."""
    B, H, W, D = ximg.shape
    Tc = _col_chunk(W, H, D)
    nT = W // Tc
    R = wdt2.shape[-1]
    C = wx2.shape[1]
    return _vcall(
        functools.partial(_pair_phase2_kernel, R, True, ximg.dtype == jnp.float32,
                          False, False, False),
        out_shape=jax.ShapeDtypeStruct((B, nT, H, Tc, D), ximg.dtype),
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, H, Tc, D), lambda b, t: (b, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 1, 1, D), lambda b, t: (b, 0, t, 0, 0),
                         memory_space=pltpu.VMEM),
            _pair_par(2, C, D), _pair_par(2, D, R), _pair_par(2, 1, D),
            _pair_par(2, 1, D), _pair_par(2, 1, D),
        ],
        out_specs=pl.BlockSpec((1, 1, H, Tc, D), lambda b, t: (b, t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(ximg, carries[:, :, :, None], wx2, wdt2, bias2[:, None, :], A2[:, None, :],
      Ds2[:, None, :])


@functools.partial(jax.jit, static_argnames=("interpret", "emit_ysum"))
def _pair_phase2_rows_merge(ximg, carries, y13sum, y_line, wx2, wdt2, bias2, A2, Ds2,
                            ln_scale, ln_bias, w_out, interpret=False,
                            emit_ysum=False):
    """Rows family (dir0 + dir2) + full merge tail -> (B, L, d_model).
    ``emit_ysum``: also emit the pre-LN direction sum (train forward)."""
    B, H, W, D = ximg.shape
    Tr = _row_chunk(H, W, D)
    nT = H // Tr
    nTc, Tc = y13sum.shape[1], y13sum.shape[3]
    dm = w_out.shape[-1]
    R = wdt2.shape[-1]
    C = wx2.shape[1]
    has_line = y_line is not None
    in_specs = [
        pl.BlockSpec((1, Tr, W, D), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, 1, 1, D), lambda b, t: (b, 0, t, 0, 0),
                     memory_space=pltpu.VMEM),
        _pair_par(2, C, D), _pair_par(2, D, R), _pair_par(2, 1, D),
        _pair_par(2, 1, D), _pair_par(2, 1, D),
        pl.BlockSpec((1, nTc, Tr, Tc, D), lambda b, t: (b, 0, t, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [ximg, carries[:, :, :, None], wx2, wdt2, bias2[:, None, :],
            A2[:, None, :], Ds2[:, None, :], y13sum]
    if has_line:
        in_specs.append(pl.BlockSpec((1, Tr * W, D), lambda b, t: (b, t, 0),
                                     memory_space=pltpu.VMEM))
        args.append(y_line)
    in_specs += [_pair_par(1, D), _pair_par(1, D), _pair_par(D, dm)]
    args += [ln_scale.astype(jnp.float32)[None], ln_bias.astype(jnp.float32)[None],
             w_out.astype(ximg.dtype)]
    out_shape = [jax.ShapeDtypeStruct((B, H * W, dm), ximg.dtype)]
    out_specs = [pl.BlockSpec((1, Tr * W, dm), lambda b, t: (b, t, 0),
                              memory_space=pltpu.VMEM)]
    if emit_ysum:
        out_shape.append(jax.ShapeDtypeStruct((B, H * W, D), ximg.dtype))
        out_specs.append(pl.BlockSpec((1, Tr * W, D), lambda b, t: (b, t, 0),
                                      memory_space=pltpu.VMEM))
    res = _vcall(
        functools.partial(_pair_phase2_kernel, R, False, ximg.dtype == jnp.float32,
                          True, has_line, emit_ysum),
        out_shape=out_shape,
        grid=(B, nT),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(*args)
    return tuple(res) if emit_ysum else res[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pair_phase2_rows_plain(ximg, carries, wx2, wdt2, bias2, A2, Ds2, interpret=False):
    """Summed (fwd + rev) map in row-chunk pixel layout (B, nT, Tr, W, D)."""
    B, H, W, D = ximg.shape
    Tr = _row_chunk(H, W, D)
    nT = H // Tr
    R = wdt2.shape[-1]
    C = wx2.shape[1]
    return _vcall(
        functools.partial(_pair_phase2_kernel, R, False, ximg.dtype == jnp.float32,
                          False, False, False),
        out_shape=jax.ShapeDtypeStruct((B, nT, Tr, W, D), ximg.dtype),
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, Tr, W, D), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 1, 1, D), lambda b, t: (b, 0, t, 0, 0),
                         memory_space=pltpu.VMEM),
            _pair_par(2, C, D), _pair_par(2, D, R), _pair_par(2, 1, D),
            _pair_par(2, 1, D), _pair_par(2, 1, D),
        ],
        out_specs=pl.BlockSpec((1, 1, Tr, W, D), lambda b, t: (b, t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(ximg, carries[:, :, :, None], wx2, wdt2, bias2[:, None, :], A2[:, None, :],
      Ds2[:, None, :])


def _seq_pair(x_perm, wx2, wdt2, bias2, A2, Ds2, interp):
    """Two-phase (fwd + rev) pair over a flat permuted sequence: returns the
    directions' SUM (B, L, D) — replaces _seq_rows + the XLA direction sum."""
    B, L, D = x_perm.shape
    Wc = _seq_width(L, D)
    view = x_perm.reshape(B, L // Wc, Wc, D)
    s = _pair_phase1(view, wx2, wdt2, bias2, A2, transposed=False, interpret=interp)
    c = _pair_carries(s, interpret=interp)
    y = _pair_phase2_rows_plain(view, c, wx2, wdt2, bias2, A2, Ds2, interpret=interp)
    return y.reshape(B, L, D)


def _two_phase_forward(x_flat, wx, wdt, bias, A, Dsf, ln_scale, ln_bias, w_out,
                       kind, H, W, interp):
    """Inference raster/line core via summary + carry + paired-direction
    passes; reference CUDA fwd being replaced: csms6s.py:918-919."""
    B, L, D = x_flat.shape
    ximg = x_flat.reshape(B, H, W, D)
    rows_sel = jnp.asarray([0, 2])
    cols_sel = jnp.asarray([1, 3])
    y_line = None
    if kind == "line":
        y_line = _line_pair_forward(x_flat, wx[4:], wdt[4:], bias[4:], A[4:],
                                    Dsf[4:], H, W, interp).astype(x_flat.dtype)
    s13 = _pair_phase1(ximg, wx[cols_sel], wdt[cols_sel], bias[cols_sel],
                       A[cols_sel], transposed=True, interpret=interp)
    c13 = _pair_carries(s13, interpret=interp)
    y13 = _pair_phase2_cols(ximg, c13, wx[cols_sel], wdt[cols_sel], bias[cols_sel],
                            A[cols_sel], Dsf[cols_sel], interpret=interp)
    s02 = _pair_phase1(ximg, wx[rows_sel], wdt[rows_sel], bias[rows_sel],
                       A[rows_sel], transposed=False, interpret=interp)
    c02 = _pair_carries(s02, interpret=interp)
    return _pair_phase2_rows_merge(ximg, c02, y13, y_line, wx[rows_sel],
                                   wdt[rows_sel], bias[rows_sel], A[rows_sel],
                                   Dsf[rows_sel], ln_scale, ln_bias, w_out,
                                   interpret=interp)


# ---------------------------------------------------------------------------
# Freq merge fold: direction sum + inverse permutation (+ transposed-family
# combine) + LayerNorm + GELU + out projection in ONE kernel.  The dilated /
# windowed orders are block-structured, so the inverse permutation is a
# BlockSpec view + an in-VMEM transpose — the permuted sums, the un-permuted
# maps and the wide pre-projection tensor never reach HBM.
# ---------------------------------------------------------------------------


def _freq_merge_kernel(eps, kind, prm, Tr, W, hi, a_ref, b_ref, s_ref, bi_ref,
                       w_ref, out_ref):
    f32 = jnp.float32
    D = a_ref.shape[-1]
    if kind == "dilation":
        r = prm
        sa = a_ref[0].astype(f32)  # (r, Tr*W//r, D)
        sa = jnp.transpose(sa, (1, 0, 2)).reshape(Tr * W, D)  # p = i*r + phase
        sb = b_ref[0].astype(f32)  # (r, W, Tr//r, D)
        sb = jnp.transpose(sb, (2, 0, 1, 3)).reshape(Tr * W, D)  # (h, w) major
    else:  # window
        ws = prm
        nwi = W // ws
        sa = a_ref[0, 0].astype(f32).reshape(nwi, ws, ws, D)
        sa = jnp.transpose(sa, (1, 0, 2, 3)).reshape(Tr * W, D)  # (r_in, wi, c_in)
        sb = b_ref[0, :, 0].astype(f32).reshape(nwi, ws, ws, D)
        sb = jnp.transpose(sb, (2, 0, 1, 3)).reshape(Tr * W, D)  # (h_in, wi, w_in)
    y = sa + sb
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean((y - mean) ** 2, axis=-1, keepdims=True)
    y = (y - mean) * jax.lax.rsqrt(var + eps)
    y = y * s_ref[...].astype(f32) + bi_ref[...].astype(f32)
    y = 0.5 * y * (1.0 + _erf(y * jnp.float32(0.7071067811865476)))
    prec = jax.lax.Precision.HIGHEST if hi else jax.lax.Precision.DEFAULT
    y = jax.lax.dot_general(y.astype(w_ref.dtype), w_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=f32, precision=prec)
    out_ref[0] = y.astype(out_ref.dtype)


def _freq_merge_rows(kind, H, W, D, prm, itemsize=2):
    if kind == "window":
        return prm  # one window band per step
    # dilation: whole map when it fits the dtype-scaled budget (24/48px);
    # otherwise row-chunked — the transposed family's block trailing dims are
    # (Tr/r, D), so Mosaic's sublane rule needs Tr/r % 8 == 0 (at 96px r=4
    # the only sub-H candidate is Tr=32, unlocked by the raised vmem limit)
    r = prm
    if H * W * D * itemsize <= 2_500_000:
        return H
    for tr in range(8 * r, H, 8 * r):
        if H % tr == 0 and tr * W * D * itemsize <= 2_000_000:
            return tr
    return 0


@functools.partial(jax.jit, static_argnames=("kind", "H", "W", "prm", "interpret"))
def _freq_merge_pallas(sa, sb, ln_scale, ln_bias, w_out, kind: str, H: int, W: int,
                       prm: int, interpret=False):
    """sa: (B, L, D) direction-summed map in permuted order; sb: same over
    the transposed map.  Emits (B, L, d_model) in pixel order."""
    B, L, D = sa.shape
    dm = w_out.shape[-1]
    Tr = _freq_merge_rows(kind, H, W, D, prm, jnp.dtype(sa.dtype).itemsize)
    nT = H // Tr
    if kind == "dilation":
        r = prm
        a_view = sa.reshape(B, r, L // r, D)
        a_spec = pl.BlockSpec((1, r, Tr * W // r, D), lambda b, t: (b, 0, t, 0),
                              memory_space=pltpu.VMEM)
        b_view = sb.reshape(B, r, W, H // r, D)
        b_spec = pl.BlockSpec((1, r, W, Tr // r, D), lambda b, t: (b, 0, 0, t, 0),
                              memory_space=pltpu.VMEM)
    else:
        ws = prm
        a_view = sa.reshape(B, H // ws, (W // ws) * ws * ws, D)
        a_spec = pl.BlockSpec((1, 1, (W // ws) * ws * ws, D),
                              lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM)
        b_view = sb.reshape(B, W // ws, H // ws, ws * ws, D)
        b_spec = pl.BlockSpec((1, W // ws, 1, ws * ws, D),
                              lambda b, t: (b, 0, t, 0, 0), memory_space=pltpu.VMEM)
    par = lambda *s: pl.BlockSpec(s, lambda b, t: (0,) * len(s), memory_space=pltpu.VMEM)
    hi = bool(sa.dtype == jnp.float32)
    return _vcall(
        functools.partial(_freq_merge_kernel, 1e-5, kind, prm, Tr, W, hi),
        out_shape=jax.ShapeDtypeStruct((B, L, dm), sa.dtype),
        grid=(B, nT),
        in_specs=[a_spec, b_spec, par(1, D), par(1, D), par(D, dm)],
        out_specs=pl.BlockSpec((1, Tr * W, dm), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a_view, b_view, ln_scale.astype(jnp.float32)[None, :],
      ln_bias.astype(jnp.float32)[None, :], w_out.astype(sa.dtype))


def _freq_merge_ok(kind, H, W, D, prm, B=16, itemsize=2):
    if kind == "window":
        ws = prm
        # band tile must fit (fp32 at 96px does not; that path composes)
        if ws * W * D * itemsize > 1_600_000:
            return False
    if kind == "dilation":
        r = prm
        # whole-map fold at 24/48px; row-chunked at 96px (round-4, under the
        # raised vmem limit).  The dtype-scaled budgets keep the fp32 parity
        # path within the DEFAULT 16 MB scoped vmem (external jits may not
        # raise it); bf16 needs utils/jit.tramba_jit's 32 MB limit at 48px+.
        return (H % r == 0 and W % r == 0 and (H * W) % 8 == 0
                and _freq_merge_rows(kind, H, W, D, r, itemsize) > 0
                and B <= 32)
    ws = prm
    return H % ws == 0 and W % ws == 0 and (ws * ws) % 8 == 0


def composed_ss2d_full_p(x_flat, x_proj_w, dt_w, dt_b, A_logs, Ds, ln_scale, ln_bias, w_out,
                         kind: str, H: int, W: int, param: int, backend=None):
    from tramba_tpu.ops.scan_orders import cross_merge, cross_scan

    xs = cross_scan(x_flat, kind, H, W, param)
    ys = composed_ss2d_core(xs, x_proj_w, dt_w, dt_b, A_logs, Ds, backend=backend)
    y = cross_merge(ys, kind, H, W, param)
    return _ln_gelu_proj(y, ln_scale, ln_bias, w_out, x_flat.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def fused_ss2d_freq(x_flat, x_proj_w, dt_w, dt_b, A_logs, Ds, ln_scale, ln_bias, w_out,
                    kind: str, H: int, W: int, param: int):
    """Folded SS2D for the DFVSS dilated/windowed orders (K=4)."""
    return _folded_freq_forward(x_flat, x_proj_w, dt_w, dt_b, A_logs, Ds, ln_scale,
                                ln_bias, w_out, kind, H, W, param)


def _freq_fwd(x_flat, x_proj_w, dt_w, dt_b, A_logs, Ds, ln_scale, ln_bias, w_out,
              kind, H, W, param):
    out, (y, ca, cb) = _folded_freq_forward(
        x_flat, x_proj_w, dt_w, dt_b, A_logs, Ds, ln_scale, ln_bias, w_out,
        kind, H, W, param, train=True,
    )
    return out, (x_flat, x_proj_w, dt_w, dt_b, A_logs, Ds, ln_scale, ln_bias, w_out,
                 y, ca, cb)


def _freq_bwd(kind, H, W, param, res, g):
    (x_flat, x_proj_w, dt_w, dt_b, A_logs, Ds, ln_scale, ln_bias, w_out, y, ca, cb) = res
    B, L, D = x_flat.shape
    f32 = jnp.float32
    interp = jax.default_backend() != "tpu"
    A = -jnp.exp(A_logs.astype(f32))[..., 0]
    wx, wdt = x_proj_w.astype(f32), dt_w.astype(f32)
    bias, Dsf = dt_b.astype(f32), Ds.astype(f32)

    _, vjp_ln = jax.vjp(
        lambda yy, s, b, w: _ln_gelu_proj(yy, s, b, w, x_flat.dtype),
        y, ln_scale, ln_bias, w_out,
    )
    gy, d_ln_scale, d_ln_bias, d_w_out = vjp_ln(g)

    perm, inv, sel_a, sel_b = _freq_perms(kind, H, W, param)
    (xp, xpt), vjp_perm = jax.vjp(perm, x_flat)
    zero = jnp.zeros((B, L, D), f32)
    _, vjp_inv = jax.vjp(inv, zero, zero)
    gsa, gsb = vjp_inv(gy.astype(f32))

    dxp, pa = _seq_rows_bwd(xp, gsa.astype(xp.dtype), ca, wx[sel_a], wdt[sel_a],
                            bias[sel_a], A[sel_a], Dsf[sel_a], interp)
    dxpt, pb = _seq_rows_bwd(xpt, gsb.astype(xpt.dtype), cb, wx[sel_b], wdt[sel_b],
                             bias[sel_b], A[sel_b], Dsf[sel_b], interp)
    (dx,) = vjp_perm((dxp, dxpt))

    ra = [p.sum(0) for p in pa]  # (2, ...)
    rb = [p.sum(0) for p in pb]
    if kind == "dilation":  # sel_a = [0, 2], sel_b = [1, 3]
        mix = lambda a, b: jnp.stack([a[0], b[0], a[1], b[1]], axis=0)
    else:  # window: sel_a = [0, 1], sel_b = [2, 3]
        mix = lambda a, b: jnp.concatenate([a, b], axis=0)
    dwx = mix(_assemble_wx(ra), _assemble_wx(rb))
    dwdt = mix(ra[3], rb[3])
    dbias = mix(ra[4][:, 0], rb[4][:, 0])
    dA = mix(ra[5][:, 0], rb[5][:, 0])
    dDs = mix(ra[6][:, 0], rb[6][:, 0])

    return (
        dx.astype(x_flat.dtype),
        dwx.astype(x_proj_w.dtype),
        dwdt.astype(dt_w.dtype),
        dbias.astype(dt_b.dtype),
        ((dA * A)[..., None]).astype(A_logs.dtype),
        dDs.astype(Ds.dtype),
        d_ln_scale,
        d_ln_bias,
        d_w_out,
    )


fused_ss2d_freq.defvjp(_freq_fwd, _freq_bwd)
