"""Profiling & accounting: params, FLOPs, latency/FPS, device traces.

TPU-native replacement for the reference's measurement harnesses: fvcore
FLOP counting with a custom selective-scan handle (csms6s.py:772-793,
926-932), the 500-rep CUDA-event latency loop (Trambav6.py:230-255), and the
FPS harness (test_TSOD.py:71-108).  Here XLA's own cost analysis provides
FLOPs and ``jax.profiler`` provides device traces.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["count_params", "cost_analysis", "selective_scan_flops", "measure_inference_speed",
           "analytic_model_flops", "trace"]


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def cost_analysis(fn: Callable, *args) -> dict:
    """XLA cost analysis of a jitted callable: flops, bytes accessed, etc."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return dict(ca) if ca else {}


def selective_scan_flops(B: int, L: int, D: int, N: int = 1, with_D: bool = True,
                         with_Z: bool = False) -> int:
    """The reference's analytic scan FLOP model: 9*B*L*D*N (csms6s.py:772-793)."""
    flops = 9 * B * L * D * N
    if with_D:
        flops += B * D * L
    if with_Z:
        flops += B * D * L * 3
    return flops


def _prod(xs) -> int:
    out = 1
    for v in xs:
        out *= int(v)
    return out


def _dot_general_flops(eqn) -> int:
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    batch = _prod(lhs.shape[i] for i in lb)
    contract = _prod(lhs.shape[i] for i in lc)
    m = _prod(lhs.shape[i] for i in range(len(lhs.shape)) if i not in lc and i not in lb)
    n = _prod(rhs.shape[i] for i in range(len(rhs.shape)) if i not in rc and i not in rb)
    return 2 * batch * m * n * contract


def _conv_flops(eqn) -> int:
    out = eqn.outvars[0].aval
    kern = eqn.invars[1].aval
    dn = eqn.params["dimension_numbers"]
    out_feat = out.shape[dn.out_spec[1]]
    # per output element: prod(kernel dims)/out_channels MACs (covers groups:
    # the kernel's input-feature dim is already Cin/feature_group_count)
    macs_per_out = _prod(kern.shape) // kern.shape[dn.rhs_spec[0]]
    return 2 * _prod(out.shape) * macs_per_out


def _jaxpr_flops(jaxpr, mult: int = 1):
    """(dot/conv flops, scan-handle flops) of a jaxpr, recursing into calls."""
    dots = 0
    scans = 0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            dots += mult * _dot_general_flops(eqn)
        elif name == "conv_general_dilated":
            dots += mult * _conv_flops(eqn)
        elif name == "scan":
            length = int(eqn.params["length"])
            body = eqn.params["jaxpr"].jaxpr
            d, s = _jaxpr_flops(body, mult * length)
            dots += d
            scans += s
            # the reference's analytic selective-scan handle, 9 flops per
            # scanned element (csms6s.py:772-793): one lax.scan step carries
            # h over (batch..., C) for L steps
            n_carry = eqn.params["num_carry"]
            carry_elems = sum(_prod(v.aval.shape) for v in eqn.outvars[:n_carry])
            scans += mult * 9 * length * carry_elems
        else:
            for key in ("jaxpr", "call_jaxpr"):
                sub = eqn.params.get(key) if eqn.params else None
                if sub is not None:
                    inner = sub.jaxpr if hasattr(sub, "jaxpr") else sub
                    d, s = _jaxpr_flops(inner, mult)
                    dots += d
                    scans += s
                    break
            else:
                if eqn.params and "branches" in eqn.params:
                    d, s = _jaxpr_flops(eqn.params["branches"][0].jaxpr, mult)
                    dots += d
                    scans += s
    return dots, scans


def analytic_model_flops(fn: Callable, *args) -> dict:
    """fvcore-style required-FLOP count: 2MNK for every dot_general/conv in
    the traced program plus the reference's 9-flops/element selective-scan
    handle for every lax.scan carry (csms6s.py:772-793).  Trace ``fn`` with
    a COMPOSED model (ssm_backend='seq') so no work hides inside Pallas
    custom calls; elementwise ops are excluded, matching fvcore's accounting.
    """
    jaxpr = jax.make_jaxpr(fn)(*args)
    dots, scans = _jaxpr_flops(jaxpr.jaxpr)
    return {"matmul_conv_flops": dots, "scan_handle_flops": scans,
            "total_flops": dots + scans}


def _sync(out):
    """Force completion (block_until_ready is unreliable over tunneled backends)."""
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def measure_inference_speed(fn: Callable, args, max_iter: int = 200, num_warmup: int = 5,
                            log_interval: int = 50, batch: int = 1) -> float:
    """FPS harness (test_TSOD.py:71-108 semantics), returns img/s."""
    out = fn(*args)
    _sync(out)
    t0 = None
    for i in range(max_iter):
        if i == num_warmup:
            t0 = time.perf_counter()
        out = fn(*args)
        if (i + 1) % log_interval == 0:
            _sync(out)
            if t0 is not None:
                fps = batch * (i + 1 - num_warmup) / (time.perf_counter() - t0)
                print(f"Done image [{i + 1:<3}/ {max_iter}], fps: {fps:.1f} img / s", flush=True)
    _sync(out)
    fps = batch * (max_iter - num_warmup) / (time.perf_counter() - t0)
    print(f"Overall fps: {fps:.1f} img / s, times per image: {1000 / fps:.2f} ms / img")
    return fps


class trace:
    """Context manager: jax.profiler device trace written to ``logdir``."""

    def __init__(self, logdir: str = "/tmp/tramba_trace"):
        self.logdir = logdir

    def __enter__(self):
        jax.profiler.start_trace(self.logdir)
        return self

    def __exit__(self, *exc):
        jax.profiler.stop_trace()
        print(f"profiler trace written to {self.logdir}")
        return False
