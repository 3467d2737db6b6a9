"""Residual VSSM blocks (flax, NHWC).

Re-designs of ``VSSBlock`` (vmamba.py:327-396), ``VSSMDecoderBlock``
(vmamba.py:522-591) and ``MultiScaleDecoderBlock`` (vmamba.py:632-704 —
the Helix-SS2D block with K=8 line scans and the multi-scale depthwise FFN).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from tramba_tpu.nn.layers import DWMSMlp, DropPath, LayerNorm, Mlp, conv_kaiming_init, trunc_normal_init
from tramba_tpu.nn.ssm import SS2D, _NormParams
from tramba_tpu.ops.fused_mlp import (
    dwmsmlp_fusable,
    fused_ln_dwmsmlp,
    fused_ln_mlp,
    mlp_fusable,
)

__all__ = ["VSSBlock", "MultiScaleDecoderBlock", "VSSMDecoderBlock"]

_gelu = functools.partial(nn.gelu, approximate=False)


class _DenseP(nn.Module):
    """Dense kernel+bias params, applied inside fused FFN kernels."""

    fin: int
    fout: int

    @nn.compact
    def __call__(self):
        return (
            self.param("kernel", trunc_normal_init, (self.fin, self.fout)),
            self.param("bias", nn.initializers.zeros, (self.fout,)),
        )


class _ConvP(nn.Module):
    """Depthwise-conv kernel+bias params (checkpoint layout of nn.Conv)."""

    k: int
    feat: int

    @nn.compact
    def __call__(self):
        return (
            self.param("kernel", conv_kaiming_init, (self.k, self.k, 1, self.feat)),
            self.param("bias", nn.initializers.zeros, (self.feat,)),
        )


class _DWConvP(nn.Module):
    """Mirrors DWConv's tree: an anonymous nn.Conv -> scope 'Conv_0'."""

    k: int
    feat: int

    @nn.compact
    def __call__(self):
        return _ConvP(self.k, self.feat, name="Conv_0")()


class _MlpP(nn.Module):
    d: int
    hidden: int

    @nn.compact
    def __call__(self):
        return (_DenseP(self.d, self.hidden, name="fc1")(),
                _DenseP(self.hidden, self.d, name="fc2")())


class _DWMSMlpP(nn.Module):
    d: int
    hidden: int

    @nn.compact
    def __call__(self):
        return (
            _DenseP(self.d, self.hidden, name="fc1")(),
            _DWConvP(3, self.hidden, name="dwc3")(),
            _DWConvP(5, self.hidden, name="dwc5")(),
            _DWConvP(7, self.hidden, name="dwc7")(),
            _DenseP(self.hidden, self.d, name="fc2")(),
        )


def _kernel_ok(backend: Optional[str]) -> bool:
    return backend == "pallas" or (backend is None and jax.default_backend() == "tpu")


def ffn_branch(x, dim: int, mlp_ratio: float, backend: Optional[str], dtype,
               kind: str = "plain"):
    """The block FFN: LN -> MLP (no residual).  Fused kernel when eligible.

    Must be called from within a parent module's compact ``__call__`` —
    declares sibling params named ``norm2`` / ``mlp`` matching the composed
    modules' checkpoint tree exactly.
    """
    hidden = int(dim * mlp_ratio)
    B, H, W, _ = x.shape
    if kind == "plain":
        if (_kernel_ok(backend) and (H * W) % 8 == 0
                and mlp_fusable(dim, hidden, dtype, force=backend == "pallas")):
            ln_s, ln_b = _NormParams(dim, name="norm2")()
            (w1, b1), (w2, b2) = _MlpP(dim, hidden, name="mlp")()
            y = fused_ln_mlp(x.reshape(B, H * W, dim), ln_s, ln_b, w1, b1, w2, b2)
            return y.reshape(x.shape)
        y = LayerNorm(dtype=dtype, name="norm2")(x)
        return Mlp(hidden, act=_gelu, dtype=dtype, name="mlp")(y)
    # multi-scale depthwise FFN
    if _kernel_ok(backend) and dwmsmlp_fusable(H, W, dim, hidden, dtype,
                                               force=backend == "pallas"):
        ln_s, ln_b = _NormParams(dim, name="norm2")()
        (w1, b1), (k3, c3), (k5, c5), (k7, c7), (w2, b2) = _DWMSMlpP(dim, hidden, name="mlp")()
        return fused_ln_dwmsmlp(x, ln_s, ln_b, w1, b1, k3, c3, k5, c5, k7, c7, w2, b2)
    y = LayerNorm(dtype=dtype, name="norm2")(x)
    return DWMSMlp(hidden, act=_gelu, dtype=dtype, name="mlp")(y)


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
            ln = _NormParams(self.hidden_dim, name="norm")()
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
            )(x, ln=ln)
            x = x + DropPath(self.drop_path)(y, deterministic)
        if self.mlp_ratio > 0:
            y = ffn_branch(x, self.hidden_dim, self.mlp_ratio, self.ssm_backend, self.dtype)
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
        ln = _NormParams(self.hidden_dim, name="norm1")()
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
        )(x, ln=ln)
        x = x + DropPath(self.drop_path)(y, deterministic)
        y = ffn_branch(x, self.hidden_dim, self.mlp_ratio, self.ssm_backend, self.dtype,
                       kind="dwms")
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
        ln = _NormParams(self.hidden_dim, name="norm1")()
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
        )(x, ln=ln)
        x = x + DropPath(self.drop_path)(y, deterministic)
        y = ffn_branch(x, self.hidden_dim, self.mlp_ratio, self.ssm_backend, self.dtype)
        x = x + DropPath(self.drop_path)(y, deterministic)
        return x
