"""Persistent XLA compilation cache.

The flagship model takes ~11 minutes to compile its training step on the
tunneled TPU; a persistent on-disk cache makes every process after the first
start in seconds.  (The reference has no analogue — CUDA kernels are AOT.)
"""

from __future__ import annotations

import os

import jax

__all__ = ["enable_compilation_cache"]

_DEFAULT_DIR = os.environ.get(
    "TRAMBA_COMPILATION_CACHE", os.path.expanduser("~/.cache/tramba_tpu/xla_cache")
)


def enable_compilation_cache(cache_dir: str = _DEFAULT_DIR) -> str:
    """Enable the JAX persistent compilation cache (idempotent)."""
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache every program that took noticeable time, regardless of size
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return cache_dir
