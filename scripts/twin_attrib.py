"""Attribute the empty-scan twins' time to measured resources (VERDICT r4 #2).

For the three biggest twins (enc_s1 7.2/3.9 ms, dec_s2 13.5/8.5, guide_w96
5.5/3.6 real/twin, PERF.md 2.5) this times every constituent kernel of the
segment STANDALONE (stacked x8 in one jit to amortize the tunnel dispatch
floor) under TRAMBA_EMPTY_SCAN=1 (twin) and =0 (real), and pairs each with:

* its actual HBM I/O bytes (sum of operand + result sizes — the real
  traffic, not the minimal-model bytes bench.py reports), converted to ms
  at the co-measured copy bandwidth;
* its MXU matmul GFLOPs (analytic, dominant terms) at the co-measured MXU
  peak — with the skinny dbc/dt projections' lane waste priced separately
  (C=R+2 of 128 lanes; dbc pair-packed to 2C);
* the residual = measured - HBM - MXU: VPU + relayout + dispatch.

The conclusion this enables: whether each twin sits within ~15% of a
measured resource floor (HBM+MXU), or names the lane/relayout waste worth
attacking.  Run on idle hardware only (CLAUDE.md measurement discipline).
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from tramba_tpu.utils.cache import enable_compilation_cache
from tramba_tpu.utils.jit import tramba_jit

STACK = 8


def _sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def _time_stacked(fn, args, iters=8):
    """fn(*args) -> array; STACK perturbed copies inside one jit, ms/copy."""

    @tramba_jit
    def stacked(*a):
        tot = jnp.float32(0)
        x0 = a[0]
        for i in range(STACK):
            xi = x0 + jnp.asarray(i, x0.dtype) * jnp.asarray(1e-6, x0.dtype)
            tot = tot + jnp.sum(fn(xi, *a[1:]).astype(jnp.float32))
        return tot

    out = stacked(*args)
    _sync(out)
    _sync(stacked(*args))
    t0 = time.perf_counter()
    for _ in range(6):
        out = stacked(*args)
    _sync(out)
    return (time.perf_counter() - t0) / 6 / STACK * 1e3


def _nbytes(*arrs):
    return sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in arrs if a is not None)


def build_segment(name, B=16, dtype=jnp.bfloat16):
    """Returns [(stage_name, fn, args, io_bytes, mxu_gflop, mxu_eff_gflop)].

    mxu_gflop: nominal matmul GFLOPs; mxu_eff_gflop: cycles actually consumed
    expressed as GFLOPs, i.e. nominal scaled by 128/used_lanes for the skinny
    projections (output columns < 128 still occupy full MXU passes).
    """
    import tramba_tpu.ops.fused_ss2d as f
    from tramba_tpu.ops.fused_prologue import fused_prologue

    rng = np.random.default_rng(0)
    H = W = 96
    dm, D = 128, 256
    L = H * W
    R = 8  # ceil(128/16)
    C = R + 2
    K = 8 if name == "dec_s2" else 4
    f32 = jnp.float32

    x = jnp.asarray(rng.normal(size=(B, H, W, dm)).astype(np.float32) * 0.1, dtype)
    ln_s = jnp.ones((dm,), f32)
    ln_b = jnp.zeros((dm,), f32)
    w_in = jnp.asarray(rng.normal(size=(dm, D)).astype(np.float32) * 0.05)
    conv_k = jnp.asarray(rng.normal(size=(3, 3, 1, D)).astype(np.float32) * 0.1)
    wx = jnp.asarray(rng.normal(size=(K, C, D)).astype(np.float32) * 0.05)
    wdt = jnp.asarray(rng.normal(size=(K, D, R)).astype(np.float32) * 0.05)
    bias = jnp.asarray(rng.normal(size=(K, D)).astype(np.float32) * 0.05)
    A = -jnp.exp(jnp.zeros((K, D), f32))
    Ds = jnp.ones((K, D), f32)
    lnD_s = jnp.ones((D,), f32)
    lnD_b = jnp.zeros((D,), f32)
    w_out = jnp.asarray(rng.normal(size=(D, dm)).astype(np.float32) * 0.05)

    u = fused_prologue(x, ln_s, ln_b, w_in, conv_k)
    uimg = u
    uflat = u.reshape(B, L, D)
    rows_sel = jnp.asarray([0, 2])
    cols_sel = jnp.asarray([1, 3])

    # GFLOP formulas (x2 for MAC)
    g = 1e-9
    gf_inproj = 2 * B * L * dm * D * g
    gf_dbc_pair = 2 * B * L * D * (2 * C) * g          # packed (T,D)@(D,2C)
    gf_dt_pair = 2 * 2 * B * L * R * D * g             # two (T,R)@(R,D)
    gf_outproj = 2 * B * L * D * dm * g
    eff = lambda gfl, cols: gfl * (128.0 / min(cols, 128))

    stages = []

    def add(nm, fn, args, outs_bytes_fn=None, gfl=0.0, gfl_eff=None):
        out = fn(*args)
        outs = out if isinstance(out, (tuple, list)) else (out,)
        io = _nbytes(*[a for a in args if hasattr(a, "shape")]) + _nbytes(*outs)
        stages.append((nm, fn, args, io, gfl, gfl_eff if gfl_eff is not None else gfl))
        return out

    add("prologue", lambda xx, *a: fused_prologue(xx, *a),
        (x, ln_s, ln_b, w_in, conv_k), gfl=gf_inproj, gfl_eff=gf_inproj)

    if name in ("enc_s1", "dec_s2"):
        p1 = lambda tr: (lambda ui, w2, d2, b2, a2:
                         f._pair_phase1(ui, w2, d2, b2, a2, transposed=tr))
        s13 = add("p1_cols", p1(True),
                  (uimg, wx[cols_sel], wdt[cols_sel], bias[cols_sel], A[cols_sel]),
                  gfl=gf_dbc_pair + gf_dt_pair,
                  gfl_eff=eff(gf_dbc_pair, 2 * C) + eff(gf_dt_pair, D))
        c13 = add("carries13", lambda s: f._pair_carries(s), (s13,))
        y13 = add("p2_cols", lambda ui, cc, *a: f._pair_phase2_cols(ui, cc, *a),
                  (uimg, c13, wx[cols_sel], wdt[cols_sel], bias[cols_sel],
                   A[cols_sel], Ds[cols_sel]),
                  gfl=gf_dbc_pair + gf_dt_pair,
                  gfl_eff=eff(gf_dbc_pair, 2 * C) + eff(gf_dt_pair, D))
        s02 = add("p1_rows", p1(False),
                  (uimg, wx[rows_sel], wdt[rows_sel], bias[rows_sel], A[rows_sel]),
                  gfl=gf_dbc_pair + gf_dt_pair,
                  gfl_eff=eff(gf_dbc_pair, 2 * C) + eff(gf_dt_pair, D))
        c02 = add("carries02", lambda s: f._pair_carries(s), (s02,))
        y_line = None
        if name == "dec_s2":
            y_line = add("line_pair(2 fams + gathers)",
                         lambda uf, *a: f._line_pair_forward(uf, *a, H, W, False),
                         (uflat, wx[4:], wdt[4:], bias[4:], A[4:], Ds[4:]),
                         gfl=2 * (gf_dbc_pair + gf_dt_pair),
                         gfl_eff=2 * (eff(gf_dbc_pair, 2 * C) + eff(gf_dt_pair, D)))
            y_line = y_line.astype(dtype)
        add("p2_rows+merge",
            (lambda ui, cc, yy, yl, *a: f._pair_phase2_rows_merge(ui, cc, yy, yl, *a))
            if y_line is not None else
            (lambda ui, cc, yy, *a: f._pair_phase2_rows_merge(ui, cc, yy, None, *a)),
            ((uimg, c02, y13) + ((y_line,) if y_line is not None else ()) +
             (wx[rows_sel], wdt[rows_sel], bias[rows_sel], A[rows_sel], Ds[rows_sel],
              lnD_s, lnD_b, w_out)),
            gfl=gf_dbc_pair + gf_dt_pair + gf_outproj,
            gfl_eff=eff(gf_dbc_pair, 2 * C) + eff(gf_dt_pair, D) + gf_outproj)
    else:  # guide_w96: window:16
        kind, prm = "window", 16
        perm, inv, sel_a, sel_b = f._freq_perms(kind, H, W, prm)
        xp, xpt = perm(uflat)
        sa = add("seq_pair_a(perm'd)",
                 lambda xq, *a: f._seq_pair(xq, *a, False),
                 (xp, wx[jnp.asarray(sel_a)], wdt[jnp.asarray(sel_a)],
                  bias[jnp.asarray(sel_a)], A[jnp.asarray(sel_a)],
                  Ds[jnp.asarray(sel_a)]),
                 gfl=gf_dbc_pair + gf_dt_pair,
                 gfl_eff=eff(gf_dbc_pair, 2 * C) + eff(gf_dt_pair, D))
        sb = add("seq_pair_b(transp)",
                 lambda xq, *a: f._seq_pair(xq, *a, False),
                 (xpt, wx[jnp.asarray(sel_b)], wdt[jnp.asarray(sel_b)],
                  bias[jnp.asarray(sel_b)], A[jnp.asarray(sel_b)],
                  Ds[jnp.asarray(sel_b)]),
                 gfl=gf_dbc_pair + gf_dt_pair,
                 gfl_eff=eff(gf_dbc_pair, 2 * C) + eff(gf_dt_pair, D))
        add("freq_merge", lambda a, b, *r: f._freq_merge_pallas(a, b, *r, kind, H, W, prm),
            (sa, sb, lnD_s, lnD_b, w_out), gfl=gf_outproj, gfl_eff=gf_outproj)

    return stages


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--segments", default="enc_s1,dec_s2,guide_w96")
    ap.add_argument("--batch", type=int, default=16)
    opts = ap.parse_args()
    enable_compilation_cache()
    import scripts.roofline as rl

    gbs, _ = rl.measure_hbm_bandwidth()
    mxu_tflops, _ = rl.measure_mxu_peak()
    print(f"probes: HBM {gbs:.1f} GB/s, MXU {mxu_tflops:.1f} bf16 TFLOP/s", flush=True)

    for seg in opts.segments.split(","):
        for mode, flag in (("twin", "1"), ("real", "0")):
            os.environ["TRAMBA_EMPTY_SCAN"] = flag
            jax.clear_caches()
            stages = build_segment(seg, B=opts.batch)
            print(f"\n== {seg} ({mode}) ==")
            print(f"{'stage':<28} {'ms':>7} {'MB':>7} {'hbm_ms':>7} {'mxu_ms':>7} "
                  f"{'mxu_eff':>8} {'resid':>7}")
            tot = th = tm = 0.0
            for nm, fn, args, io, gfl, gfl_eff in stages:
                ms = _time_stacked(fn, args)
                hbm_ms = io / (gbs * 1e9) * 1e3
                mxu_ms = gfl / (mxu_tflops * 1e3) * 1e3
                mxu_eff_ms = gfl_eff / (mxu_tflops * 1e3) * 1e3
                resid = ms - hbm_ms - mxu_eff_ms
                tot += ms
                th += hbm_ms
                tm += mxu_eff_ms
                print(f"{nm:<28} {ms:>7.3f} {io/1e6:>7.1f} {hbm_ms:>7.3f} "
                      f"{mxu_ms:>7.3f} {mxu_eff_ms:>8.3f} {resid:>7.3f}", flush=True)
            print(f"{'TOTAL':<28} {tot:>7.3f} {'':>7} {th:>7.3f} {'':>7} "
                  f"{tm:>8.3f} {tot-th-tm:>7.3f}")
        os.environ.pop("TRAMBA_EMPTY_SCAN", None)


if __name__ == "__main__":
    main()
