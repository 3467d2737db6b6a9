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
           "trace"]


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
