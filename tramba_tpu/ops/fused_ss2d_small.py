"""Small-map SS2D megakernel: the whole raster-SS2D block core in ONE kernel.

At coarse resolutions (24px, 12px — encoder stages 3/4, where 17 of the
flagship's 21 encoder blocks live) the feature map fits in VMEM, so the
entire chain

    (LayerNorm ->) in_proj -> dw3x3 -> SiLU -> 4-direction selective scan
    -> merge -> LayerNorm -> GELU -> out_proj

runs per-batch-element in a single kernel program: one read of the narrow
input, one write of the narrow output.  The chunked multi-kernel pipeline
(fused_ss2d.fused_ss2d_full) stays for large maps and for training (its
native backward machinery consumes per-chunk carries).

Reference hot path being replaced: Models/vmamba.py:114-273.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tramba_tpu.ops.fused_ss2d import (_col_chunk, _erf, _pack_dbc_on,
                                       _packed_dbc, _row_chunk, _vcall)
from tramba_tpu.ops.selective_scan import _dual_scan_on, scan_rec_log_multi

__all__ = ["fused_ss2d_small", "smallmap_ok"]


def smallmap_ok(H: int, W: int, d_model: int, d_inner: int, dtype) -> bool:
    """Whole-map kernel eligibility: map + weights resident in VMEM."""
    # routing A/B (same-process interleaved, scripts/scan_ab.py --knob
    # TRAMBA_NO_SMALLMAP): megakernel 149.75 ms vs chunked 150.84 ms
    # full-model median, spread < 0.4 ms — the megakernel stays the default
    if os.environ.get("TRAMBA_NO_SMALLMAP", "0") == "1":
        return False
    bpe = jnp.dtype(dtype).itemsize
    L = H * W
    # the kernel keeps ~4 map-sized buffers in the model dtype plus chunked
    # fp32 working tiles; bf16 only on hardware (the fp32 parity path may be
    # jitted without utils/jit.tramba_jit's raised scoped-vmem limit)
    return (
        L % 8 == 0
        and bpe == 2
        # covers the 384px coarse stages (24/12px) AND the 224px SOD-config
        # stage-3 map (28px, d_inner 1024 = 3.2 MB) under the 64 MB
        # per-kernel scoped-vmem budget (_vcall)
        and L * d_inner * bpe * 2 <= 3_300_000
        and d_inner % 128 == 0
        and (d_model * d_inner + d_inner * d_model) * bpe <= 9 * 1024 * 1024
    )


def _d_chunk(D: int) -> int:
    return D if D <= 256 else 256


def _scan_full_log(la, b, reverse):
    """Full-length scan over axis 0 from LOG-domain decay (no carry — whole
    sequence); dispatches to the MXU-chunked spelling when the shape allows.

    Round-3 negative result (kept for the ledger): a segmented masked-roll
    spelling — log2(72) passes within vreg-aligned 72-row segments + a short
    serial carry chain — measured 1.3-1.6x the flat scan in an ISOLATED
    kernel yet EXACTLY neutral inside the megakernel.  Round-4 CORRECTION:
    the empty-scan twins (docs/PERF.md 2.5) showed the scan still costs ~38%
    of every fused kernel — the serial VPU *latency* (not pass count) is
    what cannot be hidden, which is why pass-halving measured neutral while
    the MXU-chunked spelling (selective_scan._scan_mxu_log) is not."""
    from tramba_tpu.ops.selective_scan import scan_rec_log

    # need_a=False: no carry to combine — the scan skips/shrinks its decay
    # updates (suffix-view spelling, selective_scan._scan_masked round 5)
    _, hp = scan_rec_log(la, b, la.shape[0], reverse, need_a=False)
    return hp


def _small_kernel(R, H, W, has_pro, has_ln, hi, emit, *refs):
    it = iter(refs)
    x_ref = next(it)
    if has_pro:
        if has_ln:
            s1_ref, b1_ref = next(it), next(it)
        w_in_ref, convk_ref = next(it), next(it)
    wx_ref, wdt_ref, bias_ref, A_ref, Ds_ref = (next(it) for _ in range(5))
    s2_ref, b2_ref, wout_ref, out_ref = (next(it) for _ in range(4))
    if emit:
        # train forward: also emit the scan input u (post-SiLU), the pre-LN
        # direction sum, and the chunk-entry carries in exactly the layout
        # the chunked native backward kernels (_rows/_cols_bwd_pallas)
        # consume — the backward then skips the full forward recompute
        u_ref, ysum_ref, c02_ref, c13_ref = (next(it) for _ in range(4))
    prec = jax.lax.Precision.HIGHEST if hi else jax.lax.Precision.DEFAULT
    f32 = jnp.float32
    L = H * W
    cd = x_ref.dtype

    if has_pro:
        D = w_in_ref.shape[-1]
        Dc = _d_chunk(D)
        xin = x_ref[0].astype(f32)  # (L, dm)
        if has_ln:
            mean = jnp.mean(xin, axis=-1, keepdims=True)
            var = jnp.mean((xin - mean) ** 2, axis=-1, keepdims=True)
            xin = (xin - mean) * jax.lax.rsqrt(var + 1e-5)
            xin = xin * s1_ref[0].astype(f32) + b1_ref[0].astype(f32)
        xin = xin.astype(cd)
        # in_proj + dw3x3 + SiLU, D-chunked to bound fp32 tiles; the chunked
        # post-SiLU map is stored in the model dtype (one intermediate, as in
        # the multi-kernel pipeline where it round-trips through HBM)
        xcs = []
        for c0 in range(0, D, Dc):
            u = jax.lax.dot_general(xin, w_in_ref[:, c0 : c0 + Dc],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32, precision=prec)
            u = u.reshape(H, W, Dc)
            zr = jnp.zeros((1, W, Dc), f32)
            zc = jnp.zeros((H + 2, 1, Dc), f32)
            up = jnp.concatenate([zc, jnp.concatenate([zr, u, zr], axis=0), zc], axis=1)
            acc = jnp.zeros((H, W, Dc), f32)
            for i in range(3):
                for j in range(3):
                    acc = acc + convk_ref[i, j, c0 : c0 + Dc].astype(f32) \
                        * up[i : i + H, j : j + W]
            xcs.append((acc * jax.nn.sigmoid(acc)).astype(cd).reshape(L, Dc))
        x = jnp.concatenate(xcs, axis=-1)  # (L, D), model dtype
    else:
        x = x_ref[0]  # (L, D)
        D = x.shape[-1]
        Dc = _d_chunk(D)

    if emit:
        u_ref[0] = x.astype(u_ref.dtype)

    xT = jnp.swapaxes(x.reshape(H, W, D), 0, 1).reshape(L, D)  # w-major view

    # per-direction Δ/B/C projections: full-D contractions, tiny outputs.
    # TRAMBA_PACK_DBC: the two directions sharing a source view pack their
    # (L,D)@(D,C) matmuls into one (L,D)@(D,2C) — see fused_ss2d._proj_ab2.
    if _pack_dbc_on():
        dbc0, dbc2 = _packed_dbc(x, wx_ref[0], wx_ref[2], prec)
        dbc1, dbc3 = _packed_dbc(xT, wx_ref[1], wx_ref[3], prec)
        dbc = [dbc0, dbc1, dbc2, dbc3]
    else:
        dbc = [
            jax.lax.dot_general(seq.astype(f32), wx_ref[k].astype(f32),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=f32, precision=prec)
            for k, seq in ((0, x), (1, xT), (2, x), (3, xT))
        ]

    # chunked direction sums with streaming LN stats, then the LN + GELU +
    # out-proj tail — one kernel end to end (needs the 32 MB scoped-vmem
    # limit set by utils/jit.tramba_jit; ~20 MB stack at stage-3 shapes)
    ln_sum = jnp.zeros((L, 1), f32)
    ln_sq = jnp.zeros((L, 1), f32)
    if emit:
        # chunk lengths of the native backward's visiting grid
        T02 = _row_chunk(H, W, D) * W
        T13 = _col_chunk(W, H, D) * H
        n02, n13 = L // T02, L // T13
    chunks = []
    # direction order per D-chunk; under TRAMBA_DUAL_SCAN the two directions
    # sharing a source view (same sc slice, opposite reverse) run their scan
    # pass loops interleaved (selective_scan.scan_rec_log_multi) — pairs, not
    # all four, to bound live scan temps at 2x (the kernel is scoped-vmem
    # tight, ~20 MB stack at stage-3 shapes)
    if _dual_scan_on():
        dir_groups = (((0, x, False), (2, x, True)), ((1, xT, False), (3, xT, True)))
    else:
        dir_groups = (((0, x, False),), ((1, xT, False),), ((2, x, True),), ((3, xT, True),))
    for c0 in range(0, D, Dc):
        yc = jnp.zeros((L, Dc), f32)   # pixel-order directions (0, 2)
        ycT = jnp.zeros((L, Dc), f32)  # w-major directions (1, 3)
        for grp in dir_groups:
          las_, bs_, scs_ = [], [], []
          for k, seq, rev in grp:
            sc = seq[:, c0 : c0 + Dc].astype(f32)
            dt = jax.lax.dot_general(
                dbc[k][:, :R], wdt_ref[k, c0 : c0 + Dc].astype(f32),
                (((1,), (1,)), ((), ())), preferred_element_type=f32, precision=prec)
            delta = jax.nn.softplus(dt + bias_ref[k, 0, c0 : c0 + Dc].astype(f32))
            la = delta * A_ref[k, 0, c0 : c0 + Dc].astype(f32)
            b = delta * sc * dbc[k][:, R : R + 1]
            las_.append(la)
            bs_.append(b)
            scs_.append(sc)
          hs = scan_rec_log_multi(las_, bs_, [g[2] for g in grp])
          for (k, seq, rev), h, sc in zip(grp, hs, scs_):
            if emit:
                # chunk-entry carries: the recurrence state entering each of
                # the backward kernels' chunks, sliced from the whole-map h
                T, nT = (T02, n02) if k in (0, 2) else (T13, n13)
                cref = c02_ref if k in (0, 2) else c13_ref
                fam = 0 if not rev else 1
                z = jnp.zeros((1, h.shape[-1]), f32)
                if not rev:  # entering chunk j from below: h at j*T - 1
                    rows = [z] + [h[j * T - 1 : j * T] for j in range(1, nT)]
                else:  # reversed scan, entering chunk j from above: h at (j+1)*T
                    rows = [h[(j + 1) * T : (j + 1) * T + 1] for j in range(nT - 1)] + [z]
                cref[0, fam, :, 0, c0 : c0 + Dc] = jnp.concatenate(rows, axis=0)
            yk = h * dbc[k][:, R + 1 : R + 2] + sc * Ds_ref[k, 0, c0 : c0 + Dc].astype(f32)
            if k in (1, 3):  # accumulate in w-major; one untranspose per chunk
                ycT = ycT + yk
            else:
                yc = yc + yk
        yc = yc + jnp.swapaxes(ycT.reshape(W, H, Dc), 0, 1).reshape(L, Dc)
        if emit:
            ysum_ref[0, :, c0 : c0 + Dc] = yc.astype(ysum_ref.dtype)
        ln_sum = ln_sum + jnp.sum(yc, axis=-1, keepdims=True)
        ln_sq = ln_sq + jnp.sum(yc * yc, axis=-1, keepdims=True)
        chunks.append(yc.astype(cd) if cd != f32 else yc)
    mean = ln_sum / D
    var = ln_sq / D - mean * mean
    rstd = jax.lax.rsqrt(var + 1e-5)
    out = jnp.zeros((L, wout_ref.shape[-1]), f32)
    for ci, c0 in enumerate(range(0, D, Dc)):
        y = (chunks[ci].astype(f32) - mean) * rstd * s2_ref[0, c0 : c0 + Dc].astype(f32) \
            + b2_ref[0, c0 : c0 + Dc].astype(f32)
        y = 0.5 * y * (1.0 + _erf(y * jnp.float32(0.7071067811865476)))
        out = out + jax.lax.dot_general(
            y.astype(cd), wout_ref[c0 : c0 + Dc, :], (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=prec)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("H", "W", "interpret", "emit_train"))
def _small_pallas(x, ln1, w_in, conv_k, x_proj_w, dt_w, dt_b, A_logs, Ds,
                  ln_scale, ln_bias, w_out, H: int, W: int, interpret=False,
                  emit_train=False):
    B, L, dm_or_d = x.shape
    has_pro = w_in is not None
    has_ln = ln1[0] is not None  # ln1 is the (scale, bias) tuple itself
    D = w_in.shape[1] if has_pro else dm_or_d
    dm = w_out.shape[-1]
    R = dt_w.shape[-1]
    cd = x.dtype
    f32 = jnp.float32
    A = -jnp.exp(A_logs.astype(f32))[..., 0]  # (4, D)
    par = lambda *s: pl.BlockSpec(s, lambda b: (0,) * len(s), memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec((1, L, dm_or_d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)]
    args = [x]
    if has_pro:
        if has_ln:
            in_specs += [par(1, dm_or_d), par(1, dm_or_d)]
            args += [ln1[0].astype(f32)[None], ln1[1].astype(f32)[None]]
        in_specs += [par(dm_or_d, D), par(3, 3, D)]
        args += [w_in.astype(cd), conv_k.reshape(3, 3, D).astype(cd)]
    C = x_proj_w.shape[1]
    in_specs += [par(4, C, D), par(4, D, R), par(4, 1, D), par(4, 1, D), par(4, 1, D),
                 par(1, D), par(1, D), par(D, dm)]
    args += [x_proj_w.astype(f32), dt_w.astype(f32), dt_b.astype(f32)[:, None],
             A[:, None], Ds.astype(f32)[:, None],
             ln_scale.astype(f32)[None], ln_bias.astype(f32)[None], w_out.astype(cd)]
    bspec = lambda *s: pl.BlockSpec((1,) + s, lambda b: (b,) + (0,) * len(s),
                                    memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((B, L, dm), cd)]
    out_specs = [bspec(L, dm)]
    if emit_train:
        n02 = H // _row_chunk(H, W, D)
        n13 = W // _col_chunk(W, H, D)
        out_shape += [
            jax.ShapeDtypeStruct((B, L, D), cd),                # u (post-SiLU)
            jax.ShapeDtypeStruct((B, L, D), cd),                # pre-LN sum
            jax.ShapeDtypeStruct((B, 2, n02, 1, D), jnp.float32),  # rows carries
            jax.ShapeDtypeStruct((B, 2, n13, 1, D), jnp.float32),  # cols carries
        ]
        out_specs += [bspec(L, D), bspec(L, D), bspec(2, n02, 1, D),
                      bspec(2, n13, 1, D)]
    res = _vcall(
        functools.partial(_small_kernel, R, H, W, has_pro, has_ln,
                          cd == jnp.float32, emit_train),
        out_shape=out_shape,
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(*args)
    return tuple(res) if emit_train else res[0]


def _lgp_kernel(hi, y_ref, s_ref, b_ref, w_ref, out_ref):
    """LayerNorm + exact GELU + out projection over a row chunk."""
    prec = jax.lax.Precision.HIGHEST if hi else jax.lax.Precision.DEFAULT
    f32 = jnp.float32
    y = y_ref[0].astype(f32)
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean((y - mean) ** 2, axis=-1, keepdims=True)
    y = (y - mean) * jax.lax.rsqrt(var + 1e-5)
    y = y * s_ref[...].astype(f32) + b_ref[...].astype(f32)
    y = 0.5 * y * (1.0 + _erf(y * jnp.float32(0.7071067811865476)))
    o = jax.lax.dot_general(y.astype(y_ref.dtype), w_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=f32, precision=prec)
    out_ref[0] = o.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _lgp_pallas(y, ln_scale, ln_bias, w_out, interpret=False):
    B, L, D = y.shape
    dm = w_out.shape[-1]
    T = L
    for t in range(8, L + 1, 8):
        if L % t == 0 and t * D <= 131072:
            T = t
    nT = L // T
    cd = y.dtype
    par = lambda *s: pl.BlockSpec(s, lambda b, t: (0,) * len(s), memory_space=pltpu.VMEM)
    return _vcall(
        functools.partial(_lgp_kernel, cd == jnp.float32),
        out_shape=jax.ShapeDtypeStruct((B, L, dm), cd),
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, T, D), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            par(1, D), par(1, D), par(D, dm),
        ],
        out_specs=pl.BlockSpec((1, T, dm), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(y, ln_scale.astype(jnp.float32)[None], ln_bias.astype(jnp.float32)[None],
      w_out.astype(cd))


def composed_ss2d_small(x, ln1, w_in, conv_k, x_proj_w, dt_w, dt_b, A_logs, Ds,
                        ln_scale, ln_bias, w_out, H, W):
    """XLA oracle (and VJP path): prologue + folded raster core, composed."""
    from tramba_tpu.ops.fused_prologue import composed_prologue
    from tramba_tpu.ops.fused_ss2d import composed_ss2d_full

    B, L, _ = x.shape
    if w_in is not None:
        s, b = ln1 if ln1 is not None else (None, None)
        u = composed_prologue(x.reshape(B, H, W, -1), s, b, w_in, conv_k)
        x = u.reshape(B, L, -1)
    return composed_ss2d_full(x, x_proj_w, dt_w, dt_b, A_logs, Ds, ln_scale, ln_bias,
                              w_out, kind="raster", H=H, W=W, backend="assoc")


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14))
def fused_ss2d_small(x, ln1_s, ln1_b, w_in, conv_k, x_proj_w, dt_w, dt_b, A_logs, Ds,
                     ln_scale, ln_bias, w_out, H, W):
    """Whole-map raster SS2D with fused prologue in one kernel; composed VJP."""
    interp = jax.default_backend() != "tpu"
    return _small_pallas(x, (ln1_s, ln1_b), w_in, conv_k, x_proj_w, dt_w, dt_b,
                         A_logs, Ds, ln_scale, ln_bias, w_out, H, W, interpret=interp)


def _saved_bwd() -> bool:
    """Saved-state adjoint routing (default on): the train forward emits u /
    pre-LN sum / chunk carries from the megakernel, so the backward runs ONLY
    the native adjoint kernels + the prologue VJP — no forward recompute.
    TRAMBA_SMALL_SAVED_BWD=0 falls back to the round-3 full-recompute path
    (megakernel fwd, then prologue + two-phase train fwd inside the bwd)."""
    return os.environ.get("TRAMBA_SMALL_SAVED_BWD", "1") != "0"


def _small_fwd(x, ln1_s, ln1_b, w_in, conv_k, x_proj_w, dt_w, dt_b, A_logs, Ds,
               ln_scale, ln_bias, w_out, H, W):
    if not _saved_bwd():
        out = fused_ss2d_small(x, ln1_s, ln1_b, w_in, conv_k, x_proj_w, dt_w,
                               dt_b, A_logs, Ds, ln_scale, ln_bias, w_out, H, W)
        return out, (x, ln1_s, ln1_b, w_in, conv_k, x_proj_w, dt_w, dt_b,
                     A_logs, Ds, ln_scale, ln_bias, w_out, None)
    interp = jax.default_backend() != "tpu"
    out, u, ysum, c02, c13 = _small_pallas(
        x, (ln1_s, ln1_b), w_in, conv_k, x_proj_w, dt_w, dt_b, A_logs, Ds,
        ln_scale, ln_bias, w_out, H, W, interpret=interp, emit_train=True)
    return out, (x, ln1_s, ln1_b, w_in, conv_k, x_proj_w, dt_w, dt_b, A_logs, Ds,
                 ln_scale, ln_bias, w_out, (u, ysum, c02, c13))


def _small_bwd_recompute(H, W, res, g):
    # round-3 path: fused prologue (composed VJP) feeding the chunked folded
    # core, whose VJP is the native fused backward — re-pays a full forward
    from tramba_tpu.ops.fused_prologue import fused_prologue
    from tramba_tpu.ops.fused_ss2d import fused_ss2d_full

    def f(x, ln1_s, ln1_b, w_in, conv_k, x_proj_w, dt_w, dt_b, A_logs, Ds,
          ln_scale, ln_bias, w_out):
        B, L, _ = x.shape
        u = fused_prologue(x.reshape(B, H, W, -1), ln1_s, ln1_b, w_in, conv_k)
        return fused_ss2d_full(u.reshape(B, L, -1), x_proj_w, dt_w, dt_b, A_logs,
                               Ds, ln_scale, ln_bias, w_out, "raster", H, W)

    _, vjp = jax.vjp(f, *res)
    return vjp(g)


def _small_bwd(H, W, res, g):
    saved = res[-1]
    if saved is None:
        return _small_bwd_recompute(H, W, res[:-1], g)
    (x, ln1_s, ln1_b, w_in, conv_k, x_proj_w, dt_w, dt_b, A_logs, Ds,
     ln_scale, ln_bias, w_out, _) = res
    u, ysum, c02, c13 = saved
    from tramba_tpu.ops.fused_prologue import composed_prologue
    from tramba_tpu.ops.fused_ss2d import (
        _assemble_wx, _cols_bwd_pallas, _ln_gelu_proj, _rows_bwd_pallas,
    )

    B, L, D = u.shape
    f32 = jnp.float32
    interp = jax.default_backend() != "tpu"
    A = -jnp.exp(A_logs.astype(f32))[..., 0]
    wx, wdt = x_proj_w.astype(f32), dt_w.astype(f32)
    bias, Dsf = dt_b.astype(f32), Ds.astype(f32)

    # LN + GELU + out-proj adjoint over the saved pre-LN sum
    _, vjp_ln = jax.vjp(
        lambda y, s, b, w: _ln_gelu_proj(y, s, b, w, x.dtype),
        ysum, ln_scale, ln_bias, w_out)
    gy, d_ln_scale, d_ln_bias, d_w_out = vjp_ln(g)
    uimg = u.reshape(B, H, W, D)
    gimg = gy.reshape(B, H, W, D)

    rows_sel = jnp.asarray([0, 2])
    cols_sel = jnp.asarray([1, 3])
    dx02, p02 = _rows_bwd_pallas(uimg, gimg, c02, wx[rows_sel], wdt[rows_sel],
                                 bias[rows_sel], A[rows_sel], Dsf[rows_sel],
                                 interpret=interp)
    dx13, p13 = _cols_bwd_pallas(uimg, gimg, c13, wx[cols_sel], wdt[cols_sel],
                                 bias[cols_sel], A[cols_sel], Dsf[cols_sel],
                                 interpret=interp)
    du = dx02.sum(1).reshape(B, H, W, D)
    du = du + dx13.sum(1).transpose(0, 2, 1, 3, 4).reshape(B, H, W, D)

    r02 = [p.sum(0) for p in p02]
    r13 = [p.sum(0) for p in p13]
    ilv = lambda a, b: jnp.stack([a[0], b[0], a[1], b[1]], axis=0)  # K order
    dwx = ilv(_assemble_wx(r02), _assemble_wx(r13))
    dwdt = ilv(r02[3], r13[3])
    dbias = ilv(r02[4][:, 0], r13[4][:, 0])
    dA = ilv(r02[5][:, 0], r13[5][:, 0])
    dDs = ilv(r02[6][:, 0], r13[6][:, 0])

    # prologue adjoint (composed VJP from the narrow input — its own forward
    # is cheap at these maps and XLA dead-code-eliminates the unused primal)
    ximg = x.reshape(B, H, W, -1)
    if w_in is not None:
        du = du.astype(x.dtype)
        if ln1_s is not None:
            _, vjp_pro = jax.vjp(composed_prologue, ximg, ln1_s, ln1_b,
                                 w_in, conv_k)
            dx, d_ln1s, d_ln1b, d_win, d_conv = vjp_pro(du)
        else:
            _, vjp_pro = jax.vjp(
                lambda a, w, k: composed_prologue(a, None, None, w, k),
                ximg, w_in, conv_k)
            dx, d_win, d_conv = vjp_pro(du)
            d_ln1s = d_ln1b = None
    else:
        dx, d_win, d_conv, d_ln1s, d_ln1b = du, None, None, None, None

    return (
        dx.reshape(B, L, -1).astype(x.dtype),
        d_ln1s, d_ln1b, d_win, d_conv,
        dwx.astype(x_proj_w.dtype),
        dwdt.astype(dt_w.dtype),
        dbias.astype(dt_b.dtype),
        ((dA * A)[..., None]).astype(A_logs.dtype),
        dDs.astype(Ds.dtype),
        d_ln_scale,
        d_ln_bias,
        d_w_out,
    )


fused_ss2d_small.defvjp(_small_fwd, _small_bwd)


# ---------------------------------------------------------------------------
# Deleted experiment (round 2-3): a whole-map K=8 line variant ran the 4
# Helix directions inside this kernel with (L, L) one-hot Bresenham
# selectors resident in VMEM (the scatter-add merge being the selector
# matmul's adjoint).  Measured on-chip at the flagship's 24px stage it was
# parity-to-slightly-SLOWER than the two-phase paired-line pipeline (150.9
# vs 148.1 ms full model): the 128-wide grid chunks it needed to fit scoped
# vmem made the 8x redundant per-direction projections dominate.  Verdict
# round 2 weak-item #5: make it win or delete it - deleted (git history has
# the kernel; tests/test_ss2d_small.py had it at parity with the composed
# oracle, so the negative is a performance fact, not a correctness one).
# ---------------------------------------------------------------------------
