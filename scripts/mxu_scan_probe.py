"""Probe: MXU-chunked scan spelling vs the masked-roll scan, standalone.

Round-4 motivation: the TRAMBA_EMPTY_SCAN twins (docs/PERF.md section 2.5)
showed the scan costs ~38% of every fused kernel despite round 3's
pass-halving experiments measuring neutral — i.e. the serial VPU latency,
not the pass count, is what Mosaic cannot hide.  This probe tests the only
spelling that removes (nearly) all serial VPU work:

  intra-sub-chunk (T0=8) prefix via two triangular matmuls on the MXU in a
  (G, T0, D) batched layout, computed in LOG domain so the caller's own
  exp(delta*A) is *moved* into the scan, not duplicated:

    cl    = tri @ la          (inclusive cumsum of log-decay)
    ea    = exp(cl)           (local inclusive decay products)
    S     = tri @ (b / ea)
    h_loc = ea * S            (exact: h_t = sum_s exp(cl_t - cl_s) b_s)

  inter-sub-chunk carries via the existing masked-roll scan on the (G, D)
  summaries -- 8x fewer elements, log2(G) passes.

Numerical bound: la clamped at -10 (flushes a < 4.5e-5, i.e. history the
fp32 roll scan also kills within 2 steps), so exp(-cl) <= e^80 < fp32 max
and the largest term of S_t is always the newest => rounding ~eps*|b|.

Usage: python scripts/mxu_scan_probe.py [--T 256] [--D 1024] [--N 48]
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tramba_tpu.ops.selective_scan import _scan_masked, _scan_mxu_log
from tramba_tpu.utils.cache import enable_compilation_cache
from tramba_tpu.utils.jit import tramba_jit


def _kern_roll(seg, reverse, la_ref, b_ref, a_ref, h_ref):
    a = jnp.exp(la_ref[0].astype(jnp.float32))
    ac, h = _scan_masked(a, b_ref[0].astype(jnp.float32), seg, reverse)
    a_ref[0] = ac
    h_ref[0] = h


def _kern_mxu(seg, reverse, la_ref, b_ref, a_ref, h_ref):
    ac, h = _scan_mxu_log(la_ref[0], b_ref[0], seg, reverse)
    a_ref[0] = ac
    h_ref[0] = h


def _kern_twin(seg, reverse, la_ref, b_ref, a_ref, h_ref):
    a_ref[0] = jnp.exp(la_ref[0].astype(jnp.float32))
    h_ref[0] = b_ref[0].astype(jnp.float32)


KERNS = {"roll": _kern_roll, "mxu": _kern_mxu, "twin": _kern_twin}


@functools.partial(tramba_jit, static_argnames=("which", "seg", "reverse", "interpret"))
def run(la, b, which: str, seg: int, reverse: bool, interpret=False):
    N, T, D = la.shape
    spec = pl.BlockSpec((1, T, D), lambda n: (n, 0, 0), memory_space=pltpu.VMEM)
    a, h = pl.pallas_call(
        functools.partial(KERNS[which], seg, reverse),
        out_shape=[jax.ShapeDtypeStruct((N, T, D), jnp.float32)] * 2,
        grid=(N,),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        interpret=interpret,
    )(la, b)
    return a, h


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--T", type=int, default=256)
    ap.add_argument("--D", type=int, default=1024)
    ap.add_argument("--N", type=int, default=48)
    ap.add_argument("--seg", type=int, default=0, help="0 = whole chunk")
    args = ap.parse_args()
    enable_compilation_cache()
    N, T, D = args.N, args.T, args.D
    seg = args.seg or T

    rng = np.random.default_rng(0)
    la = jnp.asarray((-np.exp(rng.normal(size=(N, T, D)) * 0.5 - 0.7))
                     .astype(np.float32))  # log a in ~(-4, -0.05)
    b = jnp.asarray((rng.normal(size=(N, T, D)) * 0.5).astype(np.float32))

    for reverse in (False, True):
        outs = {}
        for which in ("roll", "mxu", "twin"):
            a, h = run(la, b, which, seg, reverse)
            float(jnp.sum(h))  # force
            outs[which] = (a, h)
        for i, nm in enumerate(("a_cum", "h")):
            err = float(jnp.max(jnp.abs(outs["mxu"][i] - outs["roll"][i])))
            ref = float(jnp.max(jnp.abs(outs["roll"][i])))
            print(f"rev={reverse} {nm}: max abs err {err:.3e} (ref magnitude {ref:.2f})")
        # interleaved timing
        res = {}
        for rnd in range(4):
            order = ("roll", "mxu", "twin") if rnd % 2 == 0 else ("twin", "mxu", "roll")
            for which in order:
                a, h = run(la, b, which, seg, reverse)
                float(jnp.sum(h))
                t0 = time.perf_counter()
                for _ in range(6):
                    a, h = run(la, b, which, seg, reverse)
                float(jnp.sum(h))
                res.setdefault(which, []).append((time.perf_counter() - t0) / 6 * 1e3)
        line = " ".join(f"{w}={sorted(v)[1]:.3f}ms" for w, v in res.items())
        gel = N * T * D / (sorted(res['roll'])[1] * 1e-3) / 1e9
        print(f"rev={reverse} [{line}] (roll={gel:.1f} Gelem/s)")


if __name__ == "__main__":
    main()
