"""Dual-Frequency Visual State Space (DFVSS) skip-guide modules.

Re-design of ``Models/freq_mamba.py`` (FreqSS2Dv6 / FreqBlockv6) and its DCT
front-end: full-map 2-D DCT -> quadrant split into low/high frequency halves
-> per-branch FreqExpand upsample back to full res -> SS2D with dilated
(low, global structure) vs windowed (high, fine detail) scan orders ->
concat -> Dense -> sigmoid gate on the input feature.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from tramba_tpu.nn.layers import DropPath, FreqExpand2D, LayerNorm, Mlp, trunc_normal_init
from tramba_tpu.nn.ssm import SS2D
from tramba_tpu.ops.dct import dct2d_quadrants

__all__ = ["FreqSS2D", "FreqBlock"]

_gelu = functools.partial(nn.gelu, approximate=False)


class _GateParams(nn.Module):
    """Bare Dense kernel (matches nn.Dense's checkpoint layout)."""

    fin: int
    fout: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", trunc_normal_init, (self.fin, self.fout))


class FreqSS2D(nn.Module):
    """DCT split + dual-branch SS2D gate (freq_mamba.py:11-57).

    ``window`` is the high-frequency window size — [4, 8, 12, 16] for
    resolutions [12, 24, 48, 96] in the reference (csms6s.py:107-111);
    ``dilation`` the low-frequency dilation rate (4, csms6s.py:58-62).
    """

    dim: int
    window: int
    dilation: int = 4
    ssm_backend: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # DCT in the model dtype (fp32 cast doubled its HBM traffic for bf16
        # models; the MXU accumulates in fp32 either way).  Quadrant-direct:
        # only the two used quadrants are ever computed.
        high, low = dct2d_quadrants(x)
        high = FreqExpand2D(dtype=self.dtype, name="h_expand")(high)
        low = FreqExpand2D(dtype=self.dtype, name="l_expand")(low)

        h_out = SS2D(
            d_model=self.dim,
            d_state=1,
            scan_kind="window",
            scan_param=self.window,
            k_group=4,
            backend=self.ssm_backend,
            dtype=self.dtype,
            name="h_ssm",
        )(high)
        l_out = SS2D(
            d_model=self.dim,
            d_state=1,
            scan_kind="dilation",
            scan_param=self.dilation,
            k_group=4,
            backend=self.ssm_backend,
            dtype=self.dtype,
            name="l_ssm",
        )(low)

        # concat + Dense as two matmuls on the kernel's halves: the (B, L, 2C)
        # concat never materializes (identical math, same checkpoint tree)
        w = _GateParams(2 * self.dim, self.dim, name="concat_back_dim")()
        wd = w.astype(self.dtype)
        attn = h_out @ wd[: self.dim] + l_out @ wd[self.dim :]
        return nn.sigmoid(attn) * x


class FreqBlock(nn.Module):
    """Pre-norm residual wrapper around FreqSS2D + Mlp (freq_mamba.py:60-82)."""

    dim: int
    window: int
    dilation: int = 4
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    ssm_backend: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = LayerNorm(dtype=self.dtype, name="norm1")(x)
        y = FreqSS2D(
            dim=self.dim,
            window=self.window,
            dilation=self.dilation,
            ssm_backend=self.ssm_backend,
            dtype=self.dtype,
            name="attn",
        )(y)
        x = x + DropPath(self.drop_path)(y, deterministic)
        from tramba_tpu.nn.blocks import ffn_branch

        y = ffn_branch(x, self.dim, self.mlp_ratio, self.ssm_backend, self.dtype)
        x = x + DropPath(self.drop_path)(y, deterministic)
        return x
