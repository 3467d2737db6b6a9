"""Residual VSSM blocks (flax, NHWC).

Re-designs of ``VSSBlock`` (vmamba.py:327-396), ``VSSMDecoderBlock``
(vmamba.py:522-591) and ``MultiScaleDecoderBlock`` (vmamba.py:632-704 —
the Helix-SS2D block with K=8 line scans and the multi-scale depthwise FFN).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from tramba_tpu.nn.layers import DWMSMlp, DropPath, LayerNorm, Mlp
from tramba_tpu.nn.ssm import SS2D

__all__ = ["VSSBlock", "MultiScaleDecoderBlock", "VSSMDecoderBlock"]

_gelu = functools.partial(nn.gelu, approximate=False)


class VSSBlock(nn.Module):
    """Encoder block: x + DropPath(SS2D(LN(x))); x + DropPath(Mlp(LN(x)))."""

    hidden_dim: int
    drop_path: float = 0.0
    ssm_d_state: int = 1
    ssm_ratio: float = 2.0
    mlp_ratio: float = 4.0
    scan_kind: str = "raster"
    scan_param: int = 0
    k_group: int = 4
    ssm_backend: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.ssm_ratio > 0:
            y = LayerNorm(dtype=self.dtype, name="norm")(x)
            y = SS2D(
                d_model=self.hidden_dim,
                d_state=self.ssm_d_state,
                ssm_ratio=self.ssm_ratio,
                scan_kind=self.scan_kind,
                scan_param=self.scan_param,
                k_group=self.k_group,
                backend=self.ssm_backend,
                dtype=self.dtype,
                name="op",
            )(y)
            x = x + DropPath(self.drop_path)(y, deterministic)
        if self.mlp_ratio > 0:
            y = LayerNorm(dtype=self.dtype, name="norm2")(x)
            y = Mlp(int(self.hidden_dim * self.mlp_ratio), act=_gelu, dtype=self.dtype, name="mlp")(y)
            x = x + DropPath(self.drop_path)(y, deterministic)
        return x


class MultiScaleDecoderBlock(nn.Module):
    """Tramba decoder block: Helix-SS2D (K=8 'line' scan) + DWMSMlp FFN."""

    hidden_dim: int
    drop_path: float = 0.0
    ssm_d_state: int = 1
    ssm_ratio: float = 2.0
    mlp_ratio: float = 4.0
    scan_kind: str = "line"
    scan_param: int = 0
    k_group: int = 8
    ssm_backend: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = LayerNorm(dtype=self.dtype, name="norm1")(x)
        y = SS2D(
            d_model=self.hidden_dim,
            d_state=self.ssm_d_state,
            ssm_ratio=self.ssm_ratio,
            scan_kind=self.scan_kind,
            scan_param=self.scan_param,
            k_group=self.k_group,
            backend=self.ssm_backend,
            dtype=self.dtype,
            name="op",
        )(y)
        x = x + DropPath(self.drop_path)(y, deterministic)
        y = LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = DWMSMlp(int(self.hidden_dim * self.mlp_ratio), act=_gelu, dtype=self.dtype, name="mlp")(y)
        x = x + DropPath(self.drop_path)(y, deterministic)
        return x


class VSSMDecoderBlock(nn.Module):
    """Decoder block with injectable scan order + plain Mlp (BaseUMamba ablation)."""

    hidden_dim: int
    drop_path: float = 0.0
    ssm_d_state: int = 1
    ssm_ratio: float = 2.0
    mlp_ratio: float = 4.0
    scan_kind: str = "line"
    scan_param: int = 0
    k_group: int = 8
    ssm_backend: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = LayerNorm(dtype=self.dtype, name="norm1")(x)
        y = SS2D(
            d_model=self.hidden_dim,
            d_state=self.ssm_d_state,
            ssm_ratio=self.ssm_ratio,
            scan_kind=self.scan_kind,
            scan_param=self.scan_param,
            k_group=self.k_group,
            backend=self.ssm_backend,
            dtype=self.dtype,
            name="op",
        )(y)
        x = x + DropPath(self.drop_path)(y, deterministic)
        y = LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = Mlp(int(self.hidden_dim * self.mlp_ratio), act=_gelu, dtype=self.dtype, name="mlp")(y)
        x = x + DropPath(self.drop_path)(y, deterministic)
        return x
