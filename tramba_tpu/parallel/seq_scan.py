"""Sequence-parallel linear recurrence over a device mesh.

The scan axis L is sharded across devices; each device scans its local block,
then the inter-device carries are combined with an associative prefix over
the mesh axis (the SSM analogue of ring attention — SURVEY.md §5.7).  This
lifts the fixed-resolution limit of the reference (scan orders precomputed
only for <=96x96, csms6s.py:58-158): inputs larger than one chip's memory
shard the pixel sequence over ICI.

Math: h_t = a_t h_{t-1} + b_t.  A block j is summarized by
(A_j = prod a, s_j = local h at block end); the carry entering block i is
c_i = sum_{j<i} (prod_{j<k<i} A_k) s_j, computed with an exclusive
associative scan over the gathered block summaries.  Each position then
corrects its local result: h_t = P_t * c_i + h_local_t with P_t the in-block
cumulative product of a.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tramba_tpu.ops.selective_scan import linear_scan

__all__ = ["sequence_parallel_linear_scan", "use_sequence_mesh", "current_sequence_mesh"]

_ctx = threading.local()


@contextlib.contextmanager
def use_sequence_mesh(mesh: Mesh, axis_name: str = "seq",
                      batch_axis: Optional[str] = None):
    """Route ``ssm_backend='seq_parallel'`` models through this mesh axis.

    Model code never sees the mesh; SS2D just passes backend='seq_parallel'
    to linear_scan, which picks the ambient mesh up from here (the flag that
    lifts SURVEY §5.7 from an op demo to a model capability).  On a 2-D
    dp x sp mesh pass ``batch_axis`` so the leading (batch) dim shards over
    it instead of being all-gathered at the shard_map boundary.
    """
    prev = getattr(_ctx, "mesh", None)
    _ctx.mesh = (mesh, axis_name, batch_axis)
    try:
        yield
    finally:
        _ctx.mesh = prev


def current_sequence_mesh():
    cur = getattr(_ctx, "mesh", None)
    if cur is None:
        raise RuntimeError(
            "ssm_backend='seq_parallel' requires an ambient mesh: wrap the call in "
            "tramba_tpu.parallel.seq_scan.use_sequence_mesh(mesh, axis_name)"
        )
    return cur


def _combine(left, right):
    a_l, s_l = left
    a_r, s_r = right
    return a_l * a_r, a_r * s_l + s_r


def sequence_parallel_linear_scan(a: jnp.ndarray, b: jnp.ndarray, mesh: Mesh,
                                  axis_name: str = "seq",
                                  backend: Optional[str] = None,
                                  batch_axis: Optional[str] = None) -> jnp.ndarray:
    """h over axis -2 with (a, b) sharded on `axis_name` along axis -2.

    Shapes (..., L, C); L must divide evenly over the mesh axis.  With
    ``batch_axis`` the leading dim additionally shards over that mesh axis
    (dp x sp): the carry prefix only communicates over ``axis_name``, so the
    batch dim stays embarrassingly parallel.
    """
    ndim = a.ndim
    lead = [batch_axis] + [None] * (ndim - 3) if ndim >= 3 else [None] * (ndim - 2)
    spec = P(*(lead + [axis_name, None]))

    def local(a_blk, b_blk):
        h_local = linear_scan(a_blk, b_blk, backend)
        # in-block cumulative product of a (for the carry correction)
        cum_a = jax.lax.associative_scan(jax.lax.mul, a_blk, axis=-2)
        A_tot = cum_a[..., -1:, :]
        s_tot = h_local[..., -1:, :]
        # gather per-block summaries along the mesh axis
        A_all = jax.lax.all_gather(A_tot, axis_name, axis=ndim - 2, tiled=True)
        s_all = jax.lax.all_gather(s_tot, axis_name, axis=ndim - 2, tiled=True)
        # inclusive prefix over blocks, then shift to exclusive
        A_pre, s_pre = jax.lax.associative_scan(_combine, (A_all, s_all), axis=ndim - 2)
        idx = jax.lax.axis_index(axis_name)
        carry = jnp.where(
            idx == 0,
            jnp.zeros_like(s_pre[..., :1, :]),
            jax.lax.dynamic_slice_in_dim(s_pre, jnp.maximum(idx - 1, 0), 1, axis=ndim - 2),
        )
        return h_local + cum_a * carry

    fn = jax.shard_map(local, mesh=mesh, in_specs=(spec, spec), out_specs=spec)
    return fn(a, b)
