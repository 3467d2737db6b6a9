"""VPU cost calibration: what does each piece of the scan kernels cost?

Times pallas kernels of increasing complexity on identical (rows, 256)
tiles: pure copy (HBM bound), one multiply, exp, the kernels' full
softplus/exp/delta chain, the Hillis-Steele scan alone, and chain+scan —
isolating transcendental vs scan vs bandwidth cost per element.

Usage: python scripts/vpu_probe.py
"""

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


T = 256  # scan chunk length (matches _seq_target at D=256)


def _scan(a, b):
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
    return b


def _scan2(a, b, g=8):
    """Two-level scan: intra-group Hillis-Steele (log2 g full-width steps) +
    group-carry scan on T/g rows + one combine step."""
    Tn, D = a.shape
    row = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    s = 1
    while s < g:  # intra-group
        a_sh = pltpu.roll(a, shift=s, axis=0)
        b_sh = pltpu.roll(b, shift=s, axis=0)
        valid = (row % g) >= s
        b = b + a * jnp.where(valid, b_sh, 0.0)
        a = a * jnp.where(valid, a_sh, 1.0)
        s *= 2
    ng = Tn // g
    ga = a.reshape(ng, g, D)[:, g - 1]  # (ng, D) group totals
    gb = b.reshape(ng, g, D)[:, g - 1]
    grow = jax.lax.broadcasted_iota(jnp.int32, ga.shape, 0)
    s = 1
    while s < ng:  # exclusive scan over group carries (1/g of the data)
        a_sh = pltpu.roll(ga, shift=s, axis=0)
        b_sh = pltpu.roll(gb, shift=s, axis=0)
        valid = grow >= s
        gb = gb + ga * jnp.where(valid, b_sh, 0.0)
        ga = ga * jnp.where(valid, a_sh, 1.0)
        s *= 2
    # carry entering each group = scanned value of the previous group
    cb = jnp.concatenate([jnp.zeros((1, D), b.dtype), gb[:-1]], axis=0)
    carry = jnp.broadcast_to(cb[:, None, :], (ng, g, D)).reshape(Tn, D)
    return b + a * carry


def _scan_slice(a, b, skip_last_a=False):
    """Slice-concat spelling (round-4/5 candidate): for pass shifts s that
    are sublane-aligned (s % 8 == 0), replace roll+mask with vreg-aligned
    static slices — `b = concat(b[:s], b[s:] + a[s:]*b[:-s])` — eliminating
    2 rotates and 2 selects per pass (7 -> 3 tile-ops) AND shrinking the
    updated region as s grows.  Bit-exact vs the masked roll: updated rows
    compute the identical fma; untouched rows keep their full prefixes
    (exactly what the mask preserved).  Sub-sublane shifts (s < 8) keep the
    masked roll (an intra-vreg rotate is unavoidable there).
    ``skip_last_a``: drop the dead a-chain update on the final pass (legal
    when the caller discards a_cum or folds the carry into b[0])."""
    Tn, D = a.shape
    row = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    s = 1
    while s < min(8, Tn):
        a_sh = pltpu.roll(a, shift=s, axis=0)
        b_sh = pltpu.roll(b, shift=s, axis=0)
        valid = row >= s
        b = b + a * jnp.where(valid, b_sh, 0.0)
        a = a * jnp.where(valid, a_sh, 1.0)
        s *= 2
    while s < Tn:
        b = jnp.concatenate([b[:s], b[s:] + a[s:] * b[:-s]], axis=0)
        if not (skip_last_a and s * 2 >= Tn):
            a = jnp.concatenate([a[:s], a[s:] * a[:-s]], axis=0)
        s *= 2
    return b


def _body(kind, x_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)
    if kind == "copy":
        y = x
    elif kind == "mul":
        y = x * 1.0001
    elif kind == "exp":
        y = jnp.exp(x)
    elif kind == "chain":  # the kernels' per-element transcendental work
        delta = jax.nn.softplus(x * 0.1 - 1.0)
        a = jnp.exp(delta * -0.7)
        y = a + delta * x
    elif kind == "scan":
        y = _scan(jnp.clip(x * 0.01, -0.9, 0.0) + 0.9, x)
    elif kind == "chain+scan":
        delta = jax.nn.softplus(x * 0.1 - 1.0)
        a = jnp.exp(delta * -0.7)
        y = _scan(a, delta * x)
    elif kind == "scan2":
        y = _scan2(jnp.clip(x * 0.01, -0.9, 0.0) + 0.9, x)
    elif kind == "chain+scan2":
        delta = jax.nn.softplus(x * 0.1 - 1.0)
        a = jnp.exp(delta * -0.7)
        y = _scan2(a, delta * x)
    elif kind == "scan_slice":
        y = _scan_slice(jnp.clip(x * 0.01, -0.9, 0.0) + 0.9, x)
    elif kind == "scan_slice_noA":
        y = _scan_slice(jnp.clip(x * 0.01, -0.9, 0.0) + 0.9, x, skip_last_a=True)
    elif kind == "chain+scan_slice":
        delta = jax.nn.softplus(x * 0.1 - 1.0)
        a = jnp.exp(delta * -0.7)
        y = _scan_slice(a, delta * x)
    elif kind == "rawcopy":
        y = x_ref[...]
    o_ref[...] = y.astype(o_ref.dtype)


def probe(kind, rows=524288, cols=256, dtype=jnp.bfloat16):
    x = jnp.ones((rows, cols), dtype) * 0.5
    spec = pl.BlockSpec((T, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)
    f = jax.jit(lambda a: pl.pallas_call(
        functools.partial(_body, kind),
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        grid=(rows // T,),
        in_specs=[spec],
        out_specs=spec,
    )(a))
    dt = _time(f, x)
    n = rows * cols
    cyc = dt * 940e6 / n * 1e3  # cycles/element at 940 MHz, per 1k elements -> cycles
    print(f"  {kind:<11} {dt * 1e3:7.3f} ms  {n / dt / 1e9:6.1f} Gelem/s  "
          f"~{dt * 940e6 / n:5.2f} cyc/elem  {2 * n * jnp.dtype(dtype).itemsize / dt / 1e9:6.1f} GB/s")
    return dt


def main():
    print(f"device: {jax.devices()[0]}, tile T={T}, bf16 I/O, fp32 compute")
    # NOTE: a bf16-arithmetic scan (half the vregs per pass) is NOT testable:
    # Mosaic's tpu.dynamic_rotate only lowers for 32-bit data ("Rotate with
    # non-32-bit data" compile error), so pltpu.roll pins scan tiles to fp32.
    # Measured floor at T=256: chain+scan ~29 Gelem/s; the live kernels ride
    # at ~19-36 Gelem/s (scripts/roofline.py segments / scan-element counts).
    for kind in ("rawcopy", "copy", "mul", "exp", "chain", "scan", "scan2",
                 "chain+scan", "chain+scan2", "scan_slice", "scan_slice_noA",
                 "chain+scan_slice"):
        probe(kind)


if __name__ == "__main__":
    main()
