"""Swin Transformer encoder (flax, NHWC).

Re-design of ``Models/encoder/swin_encoder.py``: window attention with
relative position bias, shifted windows with static masks, PatchMerging.
Swin-B @384: embed 128, depths [2, 2, 18, 2], heads [4, 8, 16, 32],
window 12 (Trambav6_enc.py:169-175).

The Tramba assembly consumes the *inputs* of each stage (patch-embed output
and each post-merge map) and discards the final stage-4 block output
(swin_encoder.py:563-582, Trambav6_enc.py:212), so the stage-4 blocks are
dead compute in the reference — this implementation skips running them.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tramba_tpu.nn.layers import DropPath, _NormP, trunc_normal_init

__all__ = ["SwinEncoder", "swin_b_384_config"]


class _DenseP(nn.Module):
    """Dense kernel+bias params, applied inside fused kernels."""

    fin: int
    fout: int

    @nn.compact
    def __call__(self):
        return (self.param("kernel", trunc_normal_init, (self.fin, self.fout)),
                self.param("bias", nn.initializers.zeros, (self.fout,)))


def _fused_ok(force: bool = False) -> bool:
    return force or jax.default_backend() == "tpu"

_dense = lambda f, name, bias=True, dtype=None: nn.Dense(
    f, use_bias=bias, kernel_init=trunc_normal_init, dtype=dtype, name=name)
_ln = lambda name, dtype: nn.LayerNorm(epsilon=1e-5, dtype=dtype, name=name)


@functools.lru_cache(maxsize=None)
def _relative_position_index(w: int) -> np.ndarray:
    """(w*w, w*w) index into the (2w-1)^2 bias table (swin_encoder.py:96-106)."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))  # 2, w, w
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # 2, N, N
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += w - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    return rel.sum(-1)


@functools.lru_cache(maxsize=None)
def _shift_attn_mask(H: int, W: int, window: int, shift: int) -> np.ndarray:
    """(nW, N, N) additive mask for shifted windows (swin_encoder.py:211-230)."""
    img = np.zeros((H, W))
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(H // window, window, W // window, window).transpose(0, 2, 1, 3)
    win = win.reshape(-1, window * window)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    B, H, W, C = x.shape
    x = x.reshape(B, H // w, w, W // w, w, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w * w, C)


def window_reverse(windows: jnp.ndarray, w: int, H: int, W: int) -> jnp.ndarray:
    B = windows.shape[0] // ((H // w) * (W // w))
    x = windows.reshape(B, H // w, W // w, w, w, -1).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, -1)


class WindowAttention(nn.Module):
    dim: int
    window: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, ln=None):
        if ln is not None:
            # fused path: x is the full (B, H, W, C) map (pre-rolled if the
            # block is shifted); LN + qkv + softmax(+bias+mask) + proj run in
            # one kernel, partition/reverse fold into its BlockSpec index map
            from tramba_tpu.ops.fused_attn import fused_window_attn

            C, nh, w = self.dim, self.num_heads, self.window
            wqkv, bqkv = _DenseP(C, 3 * C, name="qkv")()
            wp, bp = _DenseP(C, C, name="proj")()
            table = self.param("relative_position_bias_table", trunc_normal_init,
                               ((2 * w - 1) ** 2, nh))
            idx = _relative_position_index(w).reshape(-1)
            N = w * w
            bias = table[idx].reshape(N, N, nh).transpose(2, 0, 1)
            return fused_window_attn(x, ln[0], ln[1], wqkv, bqkv, bias, mask,
                                     wp, bp, nh, 1e-5)
        Bn, N, C = x.shape
        nh, hd = self.num_heads, C // self.num_heads
        qkv = _dense(3 * C, "qkv", dtype=self.dtype)(x).reshape(Bn, N, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * (hd**-0.5), qkv[1], qkv[2]
        attn = q @ k.transpose(0, 1, 3, 2)  # (Bn, nh, N, N)

        table = self.param("relative_position_bias_table", trunc_normal_init,
                           ((2 * self.window - 1) ** 2, nh))
        idx = _relative_position_index(self.window).reshape(-1)
        bias = table[idx].reshape(N, N, nh).transpose(2, 0, 1)
        attn = attn + bias[None]
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(Bn // nW, nW, nh, N, N) + mask[None, :, None]
            attn = attn.reshape(Bn, nh, N, N)
        attn = nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(Bn, N, C)
        return _dense(C, "proj", dtype=self.dtype)(out)


class SwinBlock(nn.Module):
    dim: int
    resolution: int
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    force_fused: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from tramba_tpu.ops.fused_attn import window_attn_fusable
        from tramba_tpu.ops.fused_mlp import fused_ln_mlp, mlp_fusable

        H = W = self.resolution
        window, shift = self.window, self.shift
        if self.resolution <= window:
            window, shift = self.resolution, 0
        B, L, C = x.shape
        attn = WindowAttention(self.dim, window, self.num_heads,
                               dtype=self.dtype, name="attn")
        mask = jnp.asarray(_shift_attn_mask(H, W, window, shift)) if shift > 0 else None
        if (_fused_ok(self.force_fused)
                and window_attn_fusable(H, W, C, self.num_heads, window,
                                        self.dtype, force=self.force_fused)):
            ln1 = _NormP(C, name="norm1")()
            y = x.reshape(B, H, W, C)
            if shift > 0:
                y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            y = attn(y, mask=mask, ln=ln1)
            if shift > 0:
                y = jnp.roll(y, (shift, shift), axis=(1, 2))
            y = y.reshape(B, L, C)
        else:
            y = _ln("norm1", self.dtype)(x).reshape(B, H, W, C)
            if shift > 0:
                y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            win = window_partition(y, window)
            win = attn(win, mask)
            y = window_reverse(win, window, H, W)
            if shift > 0:
                y = jnp.roll(y, (shift, shift), axis=(1, 2))
            y = y.reshape(B, L, C)
        x = x + DropPath(self.drop_path)(y, deterministic)
        hidden = int(C * self.mlp_ratio)
        if (_fused_ok(self.force_fused) and L % 8 == 0
                and mlp_fusable(C, hidden, self.dtype, force=self.force_fused)):
            ln2 = _NormP(C, name="norm2")()
            w1, b1 = _DenseP(C, hidden, name="mlp_fc1")()
            w2, b2 = _DenseP(hidden, C, name="mlp_fc2")()
            y = fused_ln_mlp(x, ln2[0], ln2[1], w1, b1, w2, b2)
        else:
            y = _ln("norm2", self.dtype)(x)
            y = _dense(hidden, "mlp_fc1", dtype=self.dtype)(y)
            y = nn.gelu(y, approximate=False)
            y = _dense(C, "mlp_fc2", dtype=self.dtype)(y)
        x = x + DropPath(self.drop_path)(y, deterministic)
        return x


class PatchMerging(nn.Module):
    """norm(4C) then Dense(4C -> 2C) on 2x2 neighborhoods (swin_encoder.py:294-331)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, H, W):
        B, L, C = x.shape
        xr = x.reshape(B, H, W, C)
        parts = [xr[:, 0::2, 0::2], xr[:, 1::2, 0::2], xr[:, 0::2, 1::2], xr[:, 1::2, 1::2]]
        y = jnp.concatenate(parts, axis=-1).reshape(B, L // 4, 4 * C)
        y = _ln("norm", self.dtype)(y)
        return _dense(2 * C, "reduction", bias=False, dtype=self.dtype)(y)


def swin_b_384_config():
    return dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32),
                window=12, drop_path_rate=0.1)


class SwinEncoder(nn.Module):
    img_size: int = 384
    patch_size: int = 4
    embed_dim: int = 128
    depths: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (4, 8, 16, 32)
    window: int = 12
    drop_path_rate: float = 0.1
    run_last_stage: bool = False  # reference discards stage-4 block output
    force_fused: bool = False  # exercise fused kernels off-TPU (interpret mode)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size), strides=self.patch_size,
                    dtype=self.dtype, name="patch_embed_proj")(x)
        B, H, W, C = x.shape
        h = x.reshape(B, H * W, C)
        h = _ln("patch_embed_norm", self.dtype)(h)

        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        skips = []  # the *inputs* of each stage, shallow -> deep
        res = H
        dim = self.embed_dim
        n_stages = len(self.depths)
        for s in range(n_stages):
            skips.append(h.reshape(B, res, res, dim))
            if s == n_stages - 1 and not self.run_last_stage:
                break
            for d in range(self.depths[s]):
                h = SwinBlock(
                    dim=dim,
                    resolution=res,
                    num_heads=self.num_heads[s],
                    window=self.window,
                    shift=0 if d % 2 == 0 else self.window // 2,
                    drop_path=float(dpr[sum(self.depths[:s]) + d]),
                    force_fused=self.force_fused,
                    dtype=self.dtype,
                    name=f"layer{s}_block{d}",
                )(h, deterministic)
            if s < n_stages - 1:
                h = PatchMerging(dtype=self.dtype, name=f"layer{s}_downsample")(h, res, res)
                res //= 2
                dim *= 2
        return skips
