"""Tensor (channel) parallelism for the SS2D core over a device mesh.

The S6 recurrence is diagonal in d_inner — every channel scans
independently — so the natural tensor-parallel cut shards d_inner over the
mesh: in_proj column-sharded, the depthwise conv / discretization / scan /
output gating all purely local, with exactly three small collectives per
block:

  1. ``psum`` of the partial Δ/B/C projection (the (B, K, L, R+2) dbc is a
     contraction over the sharded d_inner and is tiny — R+2 ≈ 34 lanes);
  2. ``psum`` of the out-norm statistics (two scalars per position);
  3. ``psum`` of the partial out-projection (a contraction over d_inner).

Everything heavy — the scan itself, the conv, the gating — stays local to
the shard, so the communication volume per block is O(B·L·(R + d_model))
versus O(B·L·d_inner) of compute.  This is the model-parallel axis the
reference cannot express at all (its CUDA kernel owns the whole d_inner);
combined with the 'data' (batch) and 'seq' (L-axis, parallel/seq_scan.py)
axes it completes a 3-D dp x tp x sp mesh for the SSM family.

Scope: this shards the SS2D core (where the SSM-specific coupling lives).
Block FFNs and projections outside SS2D run replicated across the 'model'
axis — they are plain matmuls XLA's GSPMD can shard independently via
parameter sharding annotations (Megatron-style fc1-column/fc2-row), no
custom op needed.

Usage (mirrors parallel/seq_scan.use_sequence_mesh):

    mesh = Mesh(devices, ("model",))
    with use_tensor_mesh(mesh, "model"):
        y = SS2D(..., backend="tensor_parallel")(x, ln=ln)

Reference analogue being surpassed: Models/vmamba.py:114-273 (single-GPU
monolithic core).
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["use_tensor_mesh", "current_tensor_mesh", "ss2d_tensor_parallel"]

_ctx = threading.local()


@contextlib.contextmanager
def use_tensor_mesh(mesh: Mesh, axis_name: str = "model",
                    batch_axis: Optional[str] = None):
    """Route ``backend='tensor_parallel'`` SS2Ds through this mesh axis.

    ``batch_axis``: optionally also shard the batch dimension over a second
    mesh axis (dp x tp), e.g. ``use_tensor_mesh(mesh, "model", "data")``.
    """
    prev = getattr(_ctx, "mesh", None)
    _ctx.mesh = (mesh, axis_name, batch_axis)
    try:
        yield
    finally:
        _ctx.mesh = prev


def current_tensor_mesh():
    cur = getattr(_ctx, "mesh", None)
    if cur is None:
        raise RuntimeError(
            "backend='tensor_parallel' requires an ambient mesh: wrap the call "
            "in tramba_tpu.parallel.tp.use_tensor_mesh(mesh, axis_name)")
    return cur


def ss2d_tensor_parallel(x, ln, w_in, conv_k, x_proj_w, dt_w, dt_b, A_logs, Ds,
                         ln_scale, ln_bias, w_out, scan_kind: str, H: int,
                         W: int, scan_param: int):
    """Channel-sharded SS2D block core: x (B, H, W, dm) -> (B, H, W, dm).

    Weights arrive replicated (the flax param tree); shard_map's in_specs
    slice their d_inner axis per device.  d_state must be 1 (every live
    model config).
    """
    from tramba_tpu.ops.scan_orders import cross_merge, cross_scan
    from tramba_tpu.ops.selective_scan import linear_scan

    mesh, axis, batch_axis = current_tensor_mesh()
    n = mesh.shape[axis]
    D = w_in.shape[1]
    C = x_proj_w.shape[1]
    R = C - 2
    assert A_logs.shape[-1] == 1, "tensor_parallel supports d_state == 1"
    assert D % n == 0, f"d_inner {D} must divide over {n} '{axis}' devices"
    L = H * W
    eps = 1e-5

    if ln is not None:
        # pre-norm is over d_model (replicated) — apply outside the mesh
        f32 = jnp.float32
        xf = x.astype(f32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        x = ((xf - mu) * jax.lax.rsqrt(var + eps) * ln[0].astype(f32)
             + ln[1].astype(f32)).astype(x.dtype)
    bspec = P(batch_axis, None, None, None)

    def local(xb, w_in, conv_k, wx, wdt, bias, A_logs, Ds,
              ln_scale, ln_bias, w_out):
        f32 = jnp.float32
        cd = xb.dtype
        Dl = w_in.shape[1]
        u = xb @ w_in.astype(cd)  # (B, H, W, Dl) — column-sharded in_proj
        dn = jax.lax.conv_dimension_numbers(u.shape, conv_k.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        u = jax.lax.conv_general_dilated(u, conv_k.astype(cd), (1, 1), "SAME",
                                         dimension_numbers=dn,
                                         feature_group_count=Dl)
        u = jax.nn.silu(u)
        xs = cross_scan(u.reshape(u.shape[0], L, Dl), scan_kind, H, W, scan_param)
        # Δ/B/C projection: contraction over the SHARDED d_inner -> psum of
        # tiny (B, K, L, R+2) partials
        dbc = jnp.einsum("bkld,kcd->bklc", xs.astype(f32), wx.astype(f32))
        dbc = jax.lax.psum(dbc, axis)
        dts, Bc, Cc = jnp.split(dbc, [R, R + 1], axis=-1)
        dts = jnp.einsum("bklr,kdr->bkld", dts, wdt.astype(f32))  # D-sharded
        delta = jax.nn.softplus(dts + bias.astype(f32)[None, :, None, :])
        A = -jnp.exp(A_logs.astype(f32))[..., 0]
        a = jnp.exp(delta * A[None, :, None, :])
        b = delta * xs.astype(f32) * Bc
        h = linear_scan(a, b, None)  # per-channel recurrence: fully local
        ys = h * Cc + xs.astype(f32) * Ds.astype(f32)[None, :, None, :]
        y = cross_merge(ys.astype(cd), scan_kind, H, W, scan_param).astype(f32)
        # out-norm over the FULL d_inner: psum the per-position moments
        s1 = jax.lax.psum(jnp.sum(y, axis=-1, keepdims=True), axis)
        s2 = jax.lax.psum(jnp.sum(y * y, axis=-1, keepdims=True), axis)
        mu = s1 / D
        # one-pass E[y^2]-mu^2 form (the composed path centers first); clamp:
        # catastrophic cancellation can drive it slightly negative in fp32
        var = jnp.maximum(s2 / D - mu * mu, 0.0)
        y = (y - mu) * jax.lax.rsqrt(var + eps) * ln_scale.astype(f32) \
            + ln_bias.astype(f32)
        y = jax.nn.gelu(y, approximate=False).astype(cd)
        # row-sharded out-projection -> psum of the (B, L, dm) partials
        out = jax.lax.psum(y @ w_out.astype(cd), axis)
        return out.reshape(xb.shape[0], H, W, -1)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(bspec, P(None, axis), P(None, None, None, axis),
                  P(None, None, axis), P(None, axis, None), P(None, axis),
                  P(None, axis, None), P(None, axis), P(axis), P(axis),
                  P(axis, None)),
        out_specs=bspec,
    )
    return fn(x, w_in, conv_k, x_proj_w, dt_w, dt_b, A_logs, Ds,
              ln_scale, ln_bias, w_out)
