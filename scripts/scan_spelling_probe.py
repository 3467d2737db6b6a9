"""Per-pass marginal cost of scan spellings, compute-bound (round 4/5).

scripts/scan_passes_sweep.py measured IN-MODEL per-pass marginals (linear,
with the s<8 and s>=64 passes costing 2-3x the mid passes).  This probe
isolates the same curve per SPELLING in a standalone kernel made
compute-bound by chaining REP dependent scans per tile, so HBM cannot hide
the difference:

  roll  — the live masked-roll Hillis-Steele (7 tile-ops/pass)
  slice — vreg-aligned slice+concat for s%8==0 passes (no rotate, no mask,
          shrinking update region), masked roll for s<8

Usage: python scripts/scan_spelling_probe.py [--T 256] [--D 256] [--rep 4]
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


def _sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def _time(fn, *args, iters=20, warmup=3):
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


def _scan_roll(a, b, kmax):
    T = a.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    s, done = 1, 0
    while s < T and done < kmax:
        a_sh = pltpu.roll(a, shift=s, axis=0)
        b_sh = pltpu.roll(b, shift=s, axis=0)
        valid = row >= s
        b = b + a * jnp.where(valid, b_sh, 0.0)
        a = a * jnp.where(valid, a_sh, 1.0)
        s *= 2
        done += 1
    return a, b


def _scan_slice(a, b, kmax):
    T = a.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    s, done = 1, 0
    while s < min(8, T) and done < kmax:
        a_sh = pltpu.roll(a, shift=s, axis=0)
        b_sh = pltpu.roll(b, shift=s, axis=0)
        valid = row >= s
        b = b + a * jnp.where(valid, b_sh, 0.0)
        a = a * jnp.where(valid, a_sh, 1.0)
        s *= 2
        done += 1
    while s < T and done < kmax:
        b = jnp.concatenate([b[:s], b[s:] + a[s:] * b[:-s]], axis=0)
        a = jnp.concatenate([a[:s], a[s:] * a[:-s]], axis=0)
        s *= 2
        done += 1
    return a, b


def _body(spelling, kmax, rep, x_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)
    a = jnp.clip(x * 0.01, -0.9, 0.0) + 0.9
    b = x
    f = _scan_roll if spelling == "roll" else _scan_slice
    for _ in range(rep):
        a2, b = f(a, b, kmax)
        a = a2 * 0.999  # dependent chain: no CSE, no dead code
    o_ref[...] = b.astype(o_ref.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--T", type=int, default=256)
    ap.add_argument("--D", type=int, default=256)
    ap.add_argument("--rep", type=int, default=4)
    ap.add_argument("--rows", type=int, default=131072)
    args = ap.parse_args()

    T, D = args.T, args.D
    x = jnp.ones((args.rows, D), jnp.bfloat16) * 0.5
    spec = pl.BlockSpec((T, D), lambda i: (i, 0), memory_space=pltpu.VMEM)

    from tramba_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import math
    full = int(math.ceil(math.log2(T)))
    ks = sorted({0, 2, 3, 4, 6, full})
    res = {}
    fns = {}
    for spelling in ("roll", "slice"):
        for k in ks:
            f = jax.jit(lambda a, sp=spelling, kk=k: pl.pallas_call(
                functools.partial(_body, sp, kk, args.rep),
                out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
                grid=(args.rows // T,),
                in_specs=[spec],
                out_specs=spec,
            )(a))
            fns[(spelling, k)] = f
    for rnd in range(3):
        for spelling in ("roll", "slice") if rnd % 2 == 0 else ("slice", "roll"):
            for k in ks:
                dt = _time(fns[(spelling, k)], x, iters=10, warmup=1)
                res.setdefault((spelling, k), []).append(dt * 1e3)

    print(f"T={T} D={D} rep={args.rep} rows={args.rows} "
          f"(ms per call; marginal = vs previous k)")
    print(f"{'k':>4} {'roll ms':>9} {'d_roll':>8} {'slice ms':>9} {'d_slice':>8}")
    prev = {}
    for k in ks:
        r = sorted(res[('roll', k)])[1]
        s = sorted(res[('slice', k)])[1]
        dr = r - prev.get('roll', r)
        dsl = s - prev.get('slice', s)
        prev = {'roll': r, 'slice': s}
        shift = 2 ** (k - 1) if k else 0
        print(f"{k:>4} {r:>9.3f} {dr:>+8.3f} {s:>9.3f} {dsl:>+8.3f}   s={shift}")


if __name__ == "__main__":
    main()
