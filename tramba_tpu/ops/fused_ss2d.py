"""Fused SS2D core: per-direction projections + S6 recurrence in one kernel.

Replaces the composed chain (einsum Δ/B/C projections -> softplus -> exp ->
linear_scan -> C·h + D·u) with a single Pallas kernel that reads each
(chunk, direction) of the scanned sequence once from HBM and writes the
per-direction output once — the Δ/B/C projections ride the MXU in VMEM and
the recurrence carry never leaves the chip.  This is the TPU equivalent of
the reference's fused CUDA kernel ``selective_scan_cuda_oflex``
(csms6s.py:904-923) with the projections (vmamba.py:232-236) fused in.

d_state N == 1 only (every live path in the reference).  The backward pass
reuses the composed implementation's VJP (numerically equivalent), so the
fused forward is safe under autodiff.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tramba_tpu.ops.selective_scan import linear_scan

__all__ = ["fused_ss2d_core", "composed_ss2d_core"]


def composed_ss2d_core(xs, x_proj_w, dt_w, dt_b, A_logs, Ds, backend=None):
    """Reference-composed implementation (also the VJP oracle).

    xs: (B, K, L, D); x_proj_w: (K, R+2, D); dt_w: (K, D, R); dt_b: (K, D);
    A_logs: (K, D, 1); Ds: (K, D).  Returns ys (B, K, L, D).
    """
    R = x_proj_w.shape[1] - 2
    cd = xs.dtype
    dbc = jnp.einsum("bkld,kcd->bklc", xs, x_proj_w.astype(cd))
    dts, Bc, Cc = jnp.split(dbc, [R, R + 1], axis=-1)
    dts = jnp.einsum("bklr,kdr->bkld", dts, dt_w.astype(cd))
    delta = jax.nn.softplus(dts.astype(jnp.float32) + dt_b.astype(jnp.float32)[None, :, None, :])
    A = -jnp.exp(A_logs.astype(jnp.float32))[..., 0]  # (K, D)
    a = jnp.exp(delta * A[None, :, None, :])
    b = delta * xs.astype(jnp.float32) * Bc.astype(jnp.float32)
    h = linear_scan(a, b, backend)
    y = h * Cc.astype(jnp.float32) + xs.astype(jnp.float32) * Ds.astype(jnp.float32)[None, :, None, :]
    return y.astype(xs.dtype)


def _fused_kernel(R, hi, xs_ref, wx_ref, wdt_ref, bias_ref, A_ref, Ds_ref, out_ref, carry):
    prec = jax.lax.Precision.HIGHEST if hi else jax.lax.Precision.DEFAULT
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

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
    a = jnp.exp(delta * A_ref[0].astype(jnp.float32))
    b = delta * x * dbc[:, R : R + 1]

    row = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    s = 1
    while s < T:
        a_sh = pltpu.roll(a, shift=s, axis=0)
        b_sh = pltpu.roll(b, shift=s, axis=0)
        valid = row >= s
        a_sh = jnp.where(valid, a_sh, 1.0)
        b_sh = jnp.where(valid, b_sh, 0.0)
        b = b + a * b_sh
        a = a * a_sh
        s *= 2
    h = a * carry[...] + b
    carry[...] = h[T - 1 :, :]
    y = h * dbc[:, R + 1 : R + 2] + x * Ds_ref[0].astype(jnp.float32)
    out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("K", "R", "chunk", "interpret", "k_major"))
def _fused_pallas(xs3, wx, wdt, bias, A, Ds, K: int, R: int, chunk: int = 256,
                  interpret: bool = False, k_major: bool = False):
    BK, L, D = xs3.shape
    T = min(chunk, L)
    grid = (BK, pl.cdiv(L, T))
    C = wx.shape[1]
    nB = BK // K
    # row r of xs3 is (b*K + k) by default, or (k*nB + b) when k_major
    kidx = (lambda r: r // nB) if k_major else (lambda r: r % K)
    seq_spec = pl.BlockSpec((1, T, D), lambda r, t: (r, t, 0), memory_space=pltpu.VMEM)
    par_spec = lambda *shape: pl.BlockSpec(
        (1,) + shape, lambda r, t: (kidx(r),) + (0,) * len(shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_fused_kernel, R, xs3.dtype == jnp.float32),
        out_shape=jax.ShapeDtypeStruct((BK, L, D), xs3.dtype),
        grid=grid,
        in_specs=[
            seq_spec,
            par_spec(C, D),
            par_spec(D, R),
            par_spec(1, D),  # (K, 1, D) row params
            par_spec(1, D),
            par_spec(1, D),
        ],
        out_specs=seq_spec,
        scratch_shapes=[pltpu.VMEM((1, D), jnp.float32)],
        interpret=interpret,
    )(xs3, wx, wdt, bias[:, None, :], A[:, None, :], Ds[:, None, :])


def _fused_forward(xs, x_proj_w, dt_w, dt_b, A_logs, Ds):
    B, K, L, D = xs.shape
    R = x_proj_w.shape[1] - 2
    A = -jnp.exp(A_logs.astype(jnp.float32))[..., 0]  # (K, D)
    on_tpu = jax.default_backend() == "tpu"
    ys = _fused_pallas(
        xs.reshape(B * K, L, D),
        x_proj_w.astype(jnp.float32),
        dt_w.astype(jnp.float32),
        dt_b.astype(jnp.float32),
        A,
        Ds.astype(jnp.float32),
        K=K,
        R=R,
        interpret=not on_tpu,
    )
    return ys.reshape(B, K, L, D)


@jax.custom_vjp
def fused_ss2d_core(xs, x_proj_w, dt_w, dt_b, A_logs, Ds):
    """Fused forward; backward falls back to the composed path's VJP."""
    return _fused_forward(xs, x_proj_w, dt_w, dt_b, A_logs, Ds)


def _fwd(xs, x_proj_w, dt_w, dt_b, A_logs, Ds):
    return fused_ss2d_core(xs, x_proj_w, dt_w, dt_b, A_logs, Ds), (
        xs, x_proj_w, dt_w, dt_b, A_logs, Ds,
    )


def _bwd(res, g):
    _, vjp = jax.vjp(composed_ss2d_core, *res)
    return vjp(g)


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


def _scan_chunk(a, b, reverse):
    """In-chunk Hillis-Steele; returns (A_cum, h_partial) for carry combine."""
    T = a.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    s = 1
    while s < T:
        if reverse:
            # circular shift up by s == roll by T - s (roll requires shift >= 0)
            a_sh = pltpu.roll(a, shift=T - s, axis=0)
            b_sh = pltpu.roll(b, shift=T - s, axis=0)
            valid = row < T - s
        else:
            a_sh = pltpu.roll(a, shift=s, axis=0)
            b_sh = pltpu.roll(b, shift=s, axis=0)
            valid = row >= s
        a_sh = jnp.where(valid, a_sh, 1.0)
        b_sh = jnp.where(valid, b_sh, 0.0)
        b = b + a * b_sh
        a = a * a_sh
        s *= 2
    return a, b


def _dirs_kernel(R, transposed, hi, xs_ref, wx_ref, wdt_ref, bias_ref, A_ref, Ds_ref,
                 out_ref, carry):
    prec = jax.lax.Precision.HIGHEST if hi else jax.lax.Precision.DEFAULT
    k = pl.program_id(1)
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

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
    a = jnp.exp(delta * A_ref[0].astype(jnp.float32))
    b = delta * x * dbc[:, R : R + 1]

    def fwd(ab):
        A_cum, hp = _scan_chunk(ab[0], ab[1], reverse=False)
        h = A_cum * carry[...] + hp
        return h, h[T - 1 :, :]

    def bwd(ab):
        A_cum, hp = _scan_chunk(ab[0], ab[1], reverse=True)
        h = A_cum * carry[...] + hp
        return h, h[0:1, :]

    h, new_carry = jax.lax.cond(k == 0, fwd, bwd, (a, b))
    carry[...] = new_carry
    y = h * dbc[:, R + 1 : R + 2] + x * Ds_ref[0].astype(jnp.float32)
    if transposed:
        y = jnp.swapaxes(y.reshape(blk.shape), 0, 1)  # back to (H, Tc, D)
        out_ref[0, 0, 0] = y.astype(out_ref.dtype)
    else:
        out_ref[0, 0, 0] = y.reshape(blk.shape).astype(out_ref.dtype)


def _seq_target(D):
    """Chunk length budget: keep T*D fp32 working set well inside VMEM."""
    return max(64, min(256, 65536 // max(D, 1)))


def _row_chunk(H, W, D=256):
    target = _seq_target(D)
    best = 1
    for tr in range(1, H + 1):
        if H % tr == 0 and (tr * W) % 8 == 0 and tr * W <= target:
            best = tr
    if best * W % 8 != 0:  # fall back to whole image
        best = H
    return best


@functools.partial(jax.jit, static_argnames=("interpret",))
def _rows_pallas(ximg, wx, wdt, bias, A, Ds, interpret=False):
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
    return pl.pallas_call(
        functools.partial(_dirs_kernel, R, False, ximg.dtype == jnp.float32),
        out_shape=jax.ShapeDtypeStruct((B, 2, nT, Tr, W, D), ximg.dtype),
        grid=(B, 2, nT),
        in_specs=[spec_x, par(C, D), par(D, R), par(1, D), par(1, D), par(1, D)],
        out_specs=pl.BlockSpec(
            (1, 1, 1, Tr, W, D),
            lambda b, k, t: (b, k, jnp.where(k == 0, t, nT - 1 - t), 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((1, D), jnp.float32)],
        interpret=interpret,
    )(ximg, wx, wdt, bias[:, None, :], A[:, None, :], Ds[:, None, :])


def _col_chunk(W, H, D=256):
    """Largest multiple-of-8 divisor of W with H*Tc within the VMEM budget
    (the TPU block sublane constraint applies to the (Tc, D) trailing dims)."""
    target = max(_seq_target(D), H * 8)
    best = 0
    for tc in range(8, W + 1, 8):
        if W % tc == 0 and H * tc <= target:
            best = tc
    return best or W


@functools.partial(jax.jit, static_argnames=("interpret",))
def _cols_pallas(ximg, wx, wdt, bias, A, Ds, interpret=False):
    B, H, W, D = ximg.shape
    Tc = _col_chunk(W, H, D)
    nT = W // Tc
    R = wdt.shape[-1]
    C = wx.shape[1]
    par = lambda *s: pl.BlockSpec((1,) + s, lambda b, k, t: (k,) + (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_dirs_kernel, R, True, ximg.dtype == jnp.float32),
        out_shape=jax.ShapeDtypeStruct((B, 2, nT, H, Tc, D), ximg.dtype),
        grid=(B, 2, nT),
        in_specs=[
            pl.BlockSpec(
                (1, H, Tc, D),
                lambda b, k, t: (b, 0, jnp.where(k == 0, t, nT - 1 - t), 0),
                memory_space=pltpu.VMEM,
            ),
            par(C, D), par(D, R), par(1, D), par(1, D), par(1, D),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, H, Tc, D),
            lambda b, k, t: (b, k, jnp.where(k == 0, t, nT - 1 - t), 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((1, D), jnp.float32)],
        interpret=interpret,
    )(ximg, wx, wdt, bias[:, None, :], A[:, None, :], Ds[:, None, :])


def _erf(x):
    """Abramowitz-Stegun 7.1.26 erf (max abs err 1.5e-7 — fp32-exact);
    Mosaic has no erf primitive."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _merge_kernel(eps, has_line, hi, *refs):
    if has_line:
        y02_ref, y13_ref, yline_ref, scale_ref, bias_ref, wout_ref, out_ref = refs
    else:
        y02_ref, y13_ref, scale_ref, bias_ref, wout_ref, out_ref = refs
        yline_ref = None
    s02 = (y02_ref[0, 0, 0] + y02_ref[0, 1, 0]).astype(jnp.float32)  # (Tr, W, D)
    Tr, W, D = s02.shape
    s13 = (y13_ref[0, 0] + y13_ref[0, 1]).astype(jnp.float32)  # (nTc, Tr, Tc, D)
    nTc, _, Tc, _ = s13.shape
    s13 = jnp.swapaxes(s13, 0, 1).reshape(Tr, W, D)  # (Tr, nTc, Tc, D) -> rows
    y = (s02 + s13).reshape(Tr * W, D)
    if yline_ref is not None:
        y = y + yline_ref[0].astype(jnp.float32)
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


@functools.partial(jax.jit, static_argnames=("H", "W", "interpret"))
def _merge_pallas(y02, y13, y_line, scale, bias, w_out, H: int, W: int, interpret=False):
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
    return pl.pallas_call(
        functools.partial(_merge_kernel, 1e-5, has_line, hi),
        out_shape=jax.ShapeDtypeStruct((B, L, dm), y02.dtype),
        grid=(B, nTr),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Tr * W, dm), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)


def _ln_gelu_proj(y, ln_scale, ln_bias, w_out, dtype):
    y = y.astype(jnp.float32)
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean((y - mean) ** 2, axis=-1, keepdims=True)
    y = (y - mean) * jax.lax.rsqrt(var + 1e-5)
    y = y * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    y = 0.5 * y * (1.0 + jax.lax.erf(y / jnp.sqrt(2.0).astype(jnp.float32)))
    y = y @ w_out.astype(jnp.float32)
    return y.astype(dtype)


def composed_ss2d_full(x_flat, x_proj_w, dt_w, dt_b, A_logs, Ds, ln_scale, ln_bias, w_out,
                       kind: str, H: int, W: int, backend=None):
    """Composed oracle for the direction-folded path: cross-scan -> per-dir
    core -> cross-merge -> LayerNorm -> exact GELU -> out projection."""
    from tramba_tpu.ops.scan_orders import cross_merge, cross_scan

    xs = cross_scan(x_flat, kind, H, W, 0)
    ys = composed_ss2d_core(xs, x_proj_w, dt_w, dt_b, A_logs, Ds, backend=backend)
    y = cross_merge(ys, kind, H, W, 0)
    return _ln_gelu_proj(y, ln_scale, ln_bias, w_out, x_flat.dtype)


def _folded_forward(x_flat, x_proj_w, dt_w, dt_b, A_logs, Ds, ln_scale, ln_bias, w_out,
                    kind: str, H: int, W: int):


    B, L, D = x_flat.shape
    ximg = x_flat.reshape(B, H, W, D)
    interp = jax.default_backend() != "tpu"
    f32 = jnp.float32
    A = -jnp.exp(A_logs.astype(f32))[..., 0]  # (K, D)
    wx, wdt = x_proj_w.astype(f32), dt_w.astype(f32)
    bias, Dsf = dt_b.astype(f32), Ds.astype(f32)

    rows_sel = jnp.asarray([0, 2])
    cols_sel = jnp.asarray([1, 3])
    y02 = _rows_pallas(ximg, wx[rows_sel], wdt[rows_sel], bias[rows_sel], A[rows_sel],
                       Dsf[rows_sel], interpret=interp)
    y13 = _cols_pallas(ximg, wx[cols_sel], wdt[cols_sel], bias[cols_sel], A[cols_sel],
                       Dsf[cols_sel], interpret=interp)
    y_line = None
    if kind == "line":
        from tramba_tpu.ops.scan_orders import _line_dirs_list, _line_merge_dirs

        dirs = _line_dirs_list(x_flat, H, W)  # 4 x (B, L, D), MXU one-hot matmuls
        ys_line = _fused_pallas(
            jnp.concatenate(dirs, axis=0), wx[4:], wdt[4:], bias[4:], A[4:], Dsf[4:],
            K=4, R=dt_w.shape[-1], interpret=interp, k_major=True,
        )
        y_line = _line_merge_dirs([ys_line[i * B : (i + 1) * B] for i in range(4)], H, W)
    return _merge_pallas(y02, y13, y_line, ln_scale, ln_bias, w_out, H=H, W=W,
                         interpret=interp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def fused_ss2d_full(x_flat, x_proj_w, dt_w, dt_b, A_logs, Ds, ln_scale, ln_bias, w_out,
                    kind: str, H: int, W: int):
    """Direction-folded fused SS2D: raster cross-scan/merge live only as
    kernel index maps; merge + LayerNorm + GELU + out projection fused.
    Forward-optimal; backward delegates to the composed path's VJP."""
    return _folded_forward(x_flat, x_proj_w, dt_w, dt_b, A_logs, Ds, ln_scale, ln_bias,
                           w_out, kind, H, W)


def _full_fwd(x_flat, x_proj_w, dt_w, dt_b, A_logs, Ds, ln_scale, ln_bias, w_out, kind, H, W):
    out = fused_ss2d_full(x_flat, x_proj_w, dt_w, dt_b, A_logs, Ds, ln_scale, ln_bias,
                          w_out, kind, H, W)
    return out, (x_flat, x_proj_w, dt_w, dt_b, A_logs, Ds, ln_scale, ln_bias, w_out)


def _full_bwd(kind, H, W, res, g):
    def oracle(*args):
        return composed_ss2d_full(*args, kind=kind, H=H, W=W)

    _, vjp = jax.vjp(oracle, *res)
    return vjp(g)


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


def _seq_rows(x_perm, wx, wdt, bias, A, Ds, interp):
    """rows kernel over a flat (B, L, D) sequence via a 2-D view."""
    B, L, D = x_perm.shape
    Wc = 1
    for w in range(8, min(L, 512) + 1, 8):
        if L % w == 0 and w * 1 <= _seq_target(D):
            Wc = w
    if Wc == 1:
        Wc = L  # tiny sequences: single row
    view = x_perm.reshape(B, L // Wc, Wc, D)
    ys = _rows_pallas(view, wx, wdt, bias, A, Ds, interpret=interp)
    return ys.reshape(B, 2, L, D)


def _folded_freq_forward(x_flat, x_proj_w, dt_w, dt_b, A_logs, Ds, ln_scale, ln_bias, w_out,
                         kind: str, H: int, W: int, param: int):
    from tramba_tpu.ops import scan_orders as so

    B, L, D = x_flat.shape
    interp = jax.default_backend() != "tpu"
    f32 = jnp.float32
    A = -jnp.exp(A_logs.astype(f32))[..., 0]
    wx, wdt = x_proj_w.astype(f32), dt_w.astype(f32)
    bias, Dsf = dt_b.astype(f32), Ds.astype(f32)

    xt = so._t(x_flat, H, W)
    if kind == "dilation":
        rate = param or 4
        xp = so._phase_major(x_flat, rate)
        xpt = so._phase_major(xt, rate)
        sel_a, sel_b = jnp.asarray([0, 2]), jnp.asarray([1, 3])
    else:  # window
        ws = param
        xp = so._window_order(x_flat, H, W, ws)
        xpt = so._window_order(xt, W, H, ws)
        sel_a, sel_b = jnp.asarray([0, 1]), jnp.asarray([2, 3])

    ys_a = _seq_rows(xp, wx[sel_a], wdt[sel_a], bias[sel_a], A[sel_a], Dsf[sel_a], interp)
    ys_b = _seq_rows(xpt, wx[sel_b], wdt[sel_b], bias[sel_b], A[sel_b], Dsf[sel_b], interp)
    sa = (ys_a[:, 0] + ys_a[:, 1]).astype(f32)
    sb = (ys_b[:, 0] + ys_b[:, 1]).astype(f32)
    if kind == "dilation":
        y = so._phase_major_inv(sa, rate) + so._t(so._phase_major_inv(sb, rate), W, H)
    else:
        y = so._window_order_inv(sa, H, W, ws) + so._t(so._window_order_inv(sb, W, H, ws), W, H)
    return _ln_gelu_proj(y, ln_scale, ln_bias, w_out, x_flat.dtype)


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
    out = fused_ss2d_freq(x_flat, x_proj_w, dt_w, dt_b, A_logs, Ds, ln_scale, ln_bias,
                          w_out, kind, H, W, param)
    return out, (x_flat, x_proj_w, dt_w, dt_b, A_logs, Ds, ln_scale, ln_bias, w_out)


def _freq_bwd(kind, H, W, param, res, g):
    def oracle(*args):
        return composed_ss2d_full_p(*args, kind=kind, H=H, W=W, param=param)

    _, vjp = jax.vjp(oracle, *res)
    return vjp(g)


fused_ss2d_freq.defvjp(_freq_fwd, _freq_bwd)
