"""Debug helpers: NaN/Inf guards (reference's check_nan_inf, csms6s.py:763-768)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["check_nan_inf", "tree_check_finite"]


def check_nan_inf(name: str, x: jnp.ndarray, raise_on_bad: bool = True):
    """Host-side finite check for eager arrays; prints (and raises) on NaN/Inf."""
    import numpy as np

    arr = np.asarray(x)
    bad = ~np.isfinite(arr)
    if bad.any():
        msg = f"{name}: {bad.sum()} non-finite values (shape {arr.shape})"
        print(msg)
        if raise_on_bad:
            raise FloatingPointError(msg)
    return x


def tree_check_finite(tree, prefix: str = "params") -> bool:
    """Check every leaf of a pytree is finite; returns True if clean."""
    import numpy as np

    clean = True
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            print(f"{prefix}{jax.tree_util.keystr(path)}: non-finite values")
            clean = False
    return clean
