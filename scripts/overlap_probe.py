"""Can Mosaic overlap the proj chain with the scan's VPU passes? (round 5)

The pass sweep (scripts/scan_passes_sweep.py) showed scan passes bill
linearly — i.e. inside the live kernels the scan is NOT hidden under the
projection work.  One hypothesis: the kernel body is strictly
proj -> scan dependent, so the scheduler has nothing independent to
interleave; software-pipelining sub-chunks (scan chunk i while proj'ing
chunk i+1) would create the needed independence.  The counter-hypothesis:
both the proj chain (softplus/exp/mul) and the scan are VPU work, the VPU
is the saturated unit, and overlap buys nothing.

Three kernel variants at live-ish shapes (T x D block, dt_rank R):

  serial   — proj(whole T) then scan(whole T): the live structure
  chunked  — m sub-chunks, proj(i) -> scan(i) serially per chunk
             (isolates the cost/benefit of sub-chunking itself)
  pipe     — proj(0); for i: scan(i) & proj(i+1) issued interleaved;
             scan carries chain across sub-chunks

If pipe beats chunked by >10% the scheduler can overlap and the live
kernels should be restructured; if pipe == chunked the VPU-saturation
reading stands (record in docs/PERF.md and stop).

Usage: python scripts/overlap_probe.py [--T 512] [--D 256] [--R 8]
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tramba_tpu.ops.selective_scan import _scan_masked


def _sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def _time(fn, *args, iters=10, warmup=2):
    out = fn(*args)
    _sync(out)
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def _proj(x, wx, wdt, bias, A, R):
    f32 = jnp.float32
    dbc = jax.lax.dot_general(x, wx, (((1,), (1,)), ((), ())),
                              preferred_element_type=f32)
    dt = jax.lax.dot_general(dbc[:, :R], wdt, (((1,), (1,)), ((), ())),
                             preferred_element_type=f32)
    delta = jax.nn.softplus(dt + bias)
    a = jnp.exp(delta * A)
    b = delta * x * dbc[:, R : R + 1]
    return dbc, a, b


def _scan_carry(a, b, c):
    T = a.shape[0]
    a, b = _scan_masked(a, b, T, reverse=False)
    h = a * c + b
    return h, h[T - 1 :, :]


def _body(variant, m, R, x_ref, wx_ref, wdt_ref, bias_ref, A_ref, o_ref):
    f32 = jnp.float32
    x = x_ref[...].astype(f32)
    wx = wx_ref[...].astype(f32)
    wdt = wdt_ref[...].astype(f32)
    bias = bias_ref[...].astype(f32)
    A = A_ref[...].astype(f32)
    T = x.shape[0]
    if variant == "serial":
        dbc, a, b = _proj(x, wx, wdt, bias, A, R)
        h, _ = _scan_carry(a, b, jnp.zeros((1, x.shape[1]), f32))
        o_ref[...] = (h * dbc[:, R + 1 : R + 2]).astype(o_ref.dtype)
        return
    Ts = T // m
    xs = [x[i * Ts : (i + 1) * Ts] for i in range(m)]
    if variant == "chunked":
        c = jnp.zeros((1, x.shape[1]), f32)
        outs = []
        for i in range(m):
            dbc, a, b = _proj(xs[i], wx, wdt, bias, A, R)
            h, c = _scan_carry(a, b, c)
            outs.append(h * dbc[:, R + 1 : R + 2])
        o_ref[...] = jnp.concatenate(outs, axis=0).astype(o_ref.dtype)
        return
    # pipe: proj of chunk i+1 is issued with no data dependence on the scan
    # of chunk i — the scheduler may interleave them
    c = jnp.zeros((1, x.shape[1]), f32)
    outs = []
    dbc, a, b = _proj(xs[0], wx, wdt, bias, A, R)
    for i in range(m):
        if i + 1 < m:
            dbc_n, a_n, b_n = _proj(xs[i + 1], wx, wdt, bias, A, R)
        h, c = _scan_carry(a, b, c)
        outs.append(h * dbc[:, R + 1 : R + 2])
        if i + 1 < m:
            dbc, a, b = dbc_n, a_n, b_n
    o_ref[...] = jnp.concatenate(outs, axis=0).astype(o_ref.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--T", type=int, default=512)
    ap.add_argument("--D", type=int, default=256)
    ap.add_argument("--R", type=int, default=8)
    ap.add_argument("--m", type=int, default=4)
    ap.add_argument("--rows", type=int, default=65536)
    args = ap.parse_args()

    from tramba_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    T, D, R = args.T, args.D, args.R
    C = R + 2
    key = jax.random.key(0)
    x = jax.random.normal(key, (args.rows, D), jnp.bfloat16) * 0.1
    wx = jax.random.normal(key, (C, D), jnp.float32) * 0.05
    wdt = jax.random.normal(key, (D, R), jnp.float32) * 0.05
    bias = jax.random.normal(key, (1, D), jnp.float32) * 0.1
    A = -jnp.abs(jax.random.normal(key, (1, D), jnp.float32)) - 0.1

    spec = pl.BlockSpec((T, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    pspec = lambda *s: pl.BlockSpec(s, lambda i: tuple(0 for _ in s),
                                    memory_space=pltpu.VMEM)
    fns = {}
    for variant in ("serial", "chunked", "pipe"):
        fns[variant] = jax.jit(lambda xx, v=variant: pl.pallas_call(
            functools.partial(_body, v, args.m, R),
            out_shape=jax.ShapeDtypeStruct(xx.shape, xx.dtype),
            grid=(args.rows // T,),
            in_specs=[spec, pspec(C, D), pspec(D, R), pspec(1, D), pspec(1, D)],
            out_specs=spec,
        )(xx, wx, wdt, bias, A))

    # numerics: chunked/pipe must match serial (carry-chained association)
    o0 = fns["serial"](x)
    for v in ("chunked", "pipe"):
        d = float(jnp.max(jnp.abs(fns[v](x).astype(jnp.float32)
                                  - o0.astype(jnp.float32))))
        print(f"{v} vs serial max|d| = {d:.2e}")

    res = {}
    for rnd in range(3):
        order = ("serial", "chunked", "pipe") if rnd % 2 == 0 else (
            "pipe", "chunked", "serial")
        for v in order:
            res.setdefault(v, []).append(_time(fns[v], x) * 1e3)
    print(f"T={T} D={D} R={R} m={args.m} rows={args.rows}")
    base = sorted(res["serial"])[1]
    for v in ("serial", "chunked", "pipe"):
        t = sorted(res[v])[1]
        print(f"{v:>8}: {t:8.3f} ms  ({t / base:.3f}x vs serial)")


if __name__ == "__main__":
    main()
