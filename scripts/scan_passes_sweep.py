"""Marginal-cost-per-scan-pass sweep (floor methodology, round 4/5).

Round 4's empty-scan twins showed full scan removal saves ~38% of every
fused kernel, yet halving the pass count (three spellings) measured neutral.
This sweep resolves the contradiction by timing each segment with the
masked-roll scan truncated to k passes (TRAMBA_SCAN_PASSES=k, trace-time,
numerically meaningless below the full count):

  - concave curve (first 3 passes expensive, rest ~free): the sub-sublane
    shifts (s in {1,2,4}, intra-vreg rotates) dominate — a targeted attack
    on small shifts could pay while pass-halving (which removes LATE, cheap
    passes) could not.
  - linear curve: every pass bills the same; the two-level experiments'
    added work must have offset their savings exactly.
  - step at k=1: fixed per-scan overhead (layout change on first rotate).

k=0 should reproduce the TRAMBA_EMPTY_SCAN twin minus the phase-1
tree-reduce cost (which only the EMPTY knob nulls).

Usage: python scripts/scan_passes_sweep.py [--segments enc_s1,enc_s3,...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tramba_tpu.utils.cache import enable_compilation_cache

DEFAULT_SEGS = "enc_s1,enc_s3,dec_s2,guide_w96"
KS = [0, 1, 2, 3, 4, 6, -1]  # -1 = full


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--segments", default=DEFAULT_SEGS)
    ap.add_argument("--batch", type=int, default=16)
    opts = ap.parse_args()
    enable_compilation_cache()
    import scripts.roofline as rl

    want = set(opts.segments.split(","))
    segs = [s for s in rl.FLAGSHIP_SEGMENTS if s[0] in want]
    gbs, _ = rl.measure_hbm_bandwidth()
    print(f"HBM probe: {gbs:.1f} GB/s", flush=True)

    fns = {}
    for k in KS:
        os.environ["TRAMBA_SCAN_PASSES"] = str(k)
        jax.clear_caches()  # trace-cache hazard: see seg_ab.py docstring
        for segname, H, D, kind, n in segs:
            f, args, L = rl._segment_fn(kind, H, D, opts.batch, jnp.bfloat16)
            fns[(k, segname)] = (f.lower(*args).compile(), args)
        print(f"k={k}: traced+compiled", flush=True)
    os.environ.pop("TRAMBA_SCAN_PASSES", None)

    res = {}
    for rnd in range(3):
        order = KS if rnd % 2 == 0 else KS[::-1]
        for k in order:
            for segname, H, D, kind, n in segs:
                f, args = fns[(k, segname)]
                float(f(*args))  # warm
                t0 = time.perf_counter()
                o = None
                for _ in range(8):
                    o = f(*args)
                float(o)
                ms = (time.perf_counter() - t0) / 8 / rl._STACK * 1e3
                res.setdefault((k, segname), []).append(ms)

    hdr = "k".ljust(6) + "".join(f"{s[0]:>12}" for s in segs)
    print("\n" + hdr)
    for k in KS:
        row = f"{('full' if k < 0 else k):<6}"
        for segname, *_ in segs:
            row += f"{sorted(res[(k, segname)])[1]:>12.3f}"
        print(row)
    # marginal per-pass deltas vs previous k
    print("\nmarginal ms per added pass (vs previous row):")
    for i in range(1, len(KS)):
        k0, k1 = KS[i - 1], KS[i]
        row = f"{k0}->{'full' if k1 < 0 else k1}".ljust(10)
        for segname, *_ in segs:
            d = sorted(res[(k1, segname)])[1] - sorted(res[(k0, segname)])[1]
            row += f"{d:>+12.3f}"
        print(row)


if __name__ == "__main__":
    main()
