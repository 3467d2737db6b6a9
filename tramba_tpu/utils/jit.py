"""jit helpers: raised Mosaic scoped-vmem limit for the fused kernels.

The default 16 MB scoped-vmem compiler budget was the binding constraint on
several megakernels (see CLAUDE.md).  ``compiler_options`` on the TOP-LEVEL
jit forwards through the remote AOT compiler (probe-verified: a 22 MB-stack
kernel compiles and matches its oracle under a 32 MB limit), and inner jits
inherit it.  Entry points (bench.py, run.py, test_*.py, __graft_entry__)
jit through :func:`tramba_jit` so kernels may assume the raised limit.
"""

from __future__ import annotations

import jax

SCOPED_VMEM_KIB = 32768


def compiler_options() -> dict:
    """Options for the top-level jit; empty off-TPU (CPU rejects tpu flags)."""
    if jax.default_backend() == "tpu":
        return {"xla_tpu_scoped_vmem_limit_kib": str(SCOPED_VMEM_KIB)}
    return {}


def tramba_jit(fn, **kwargs):
    """jax.jit with the raised scoped-vmem limit on TPU."""
    return jax.jit(fn, compiler_options=compiler_options(), **kwargs)
