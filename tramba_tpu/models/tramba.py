"""Tramba model assemblies: DFVSS-guided VSSM decoder + encoder variants.

Re-design of ``Trambav6.py`` (Tramba-V, VMamba encoder) and ``Trambav6_enc.py``
(Swin / PVTv2 / ResNet encoders): a U-shaped decoder where each stage
upsamples the deep feature (PatchExpand), gates the skip feature through a
dual-frequency FreqBlock guide, concatenates, reduces, and runs two
Helix-SS2D MultiScaleDecoderBlocks; deep supervision emits 4 (or 3) logit
maps at 1/16, 1/8, 1/4 and full resolution.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tramba_tpu.nn.blocks import MultiScaleDecoderBlock
from tramba_tpu.nn.freq import FreqBlock
from tramba_tpu.nn.layers import FinalPatchExpandX4, PatchExpand, conv_kaiming_init, trunc_normal_init
from tramba_tpu.models.vssm_encoder import VSSMEncoder

__all__ = ["TrambaDecoder", "TrambaV", "window_for_resolution"]

# high-frequency window size per resolution (csms6s.py:107-111)
_WINDOW_BY_RES = {12: 4, 24: 8, 48: 12, 96: 16}


def window_for_resolution(res: int) -> int:
    if res in _WINDOW_BY_RES:
        return _WINDOW_BY_RES[res]
    # fallback: nearest divisor of res to res/5 (reference never defines these)
    target = max(2, res // 5)
    divs = [d for d in range(2, res + 1) if res % d == 0]
    return min(divs, key=lambda d: abs(d - target))


class TrambaDecoder(nn.Module):
    """DFVSS-guided VSSM decoder (Trambav6.py:13-139 / Trambav6_enc.py:27-159).

    ``skips``: [image, shallow..deep feature maps] (NHWC); the image slot is
    unused but kept for index parity with the reference.
    """

    features_per_stage: Sequence[int]  # shallow -> deep, e.g. [128, 256, 512, 1024]
    depths: Optional[Sequence[int]] = None
    drop_path_rate: float = 0.2
    img_size: int = 384
    deep_supervision: bool = True
    ssm_backend: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, skips, deterministic: bool = True):
        chans = list(self.features_per_stage)
        n_stages = len(chans)
        depths = list(self.depths) if self.depths is not None else [2] * n_stages
        dpr = np.linspace(self.drop_path_rate, 0, (n_stages - 1) * 2)
        base_res = self.img_size // 2 ** len(depths)

        seg_outputs = []
        x = skips[-1]
        for s in range(n_stages):  # s = stage-1 in reference numbering
            if s < n_stages - 1:
                skip_ch = chans[-(s + 2)]
                res = base_res * 2**s
                x = PatchExpand(dtype=self.dtype, name=f"expand_{s}")(x)
                mid = FreqBlock(
                    dim=skip_ch,
                    window=window_for_resolution(res),
                    dilation=4,
                    drop_path=0.0,
                    ssm_backend=self.ssm_backend,
                    dtype=self.dtype,
                    name=f"guide_{s}",
                )(skips[-(s + 2)], deterministic)
                x = jnp.concatenate([x, mid], axis=-1)
                x = nn.Dense(skip_ch, kernel_init=trunc_normal_init, dtype=self.dtype,
                             name=f"concat_back_dim_{s}")(x)
                for d in range(depths[s]):
                    x = MultiScaleDecoderBlock(
                        hidden_dim=skip_ch,
                        drop_path=float(dpr[sum(depths[:s]) + d]) if sum(depths[:s]) + d < len(dpr) else 0.0,
                        ssm_backend=self.ssm_backend,
                        dtype=self.dtype,
                        name=f"stage_{s}_block_{d}",
                    )(x, deterministic)
            else:
                x = FinalPatchExpandX4(dtype=self.dtype, name=f"expand_{s}")(x)
            if self.deep_supervision or s == n_stages - 1:
                seg = nn.Conv(1, (1, 1), kernel_init=conv_kaiming_init, dtype=self.dtype,
                              name=f"seg_{s}")(x)
                seg_outputs.append(seg)
        return seg_outputs if self.deep_supervision else seg_outputs[-1:]


class TrambaV(nn.Module):
    """Tramba-V: VSSM (VMamba-B) encoder + DFVSS decoder (Trambav6.py:142-200)."""

    img_size: int = 384
    dims: int = 128
    enc_depths: Sequence[int] = (2, 2, 15, 2)
    dec_depths: Sequence[int] = (2, 2, 2, 2)
    deep_supervision: bool = True
    enc_drop_path: float = 0.6
    dec_drop_path: float = 0.2
    ssm_backend: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        skips = VSSMEncoder(
            depths=tuple(self.enc_depths),
            dims=self.dims,
            drop_path_rate=self.enc_drop_path,
            ssm_backend=self.ssm_backend,
            dtype=self.dtype,
            name="vssm_encoder",
        )(x, deterministic)
        return TrambaDecoder(
            features_per_stage=[self.dims * 2**i for i in range(len(self.enc_depths))],
            depths=tuple(self.dec_depths),
            drop_path_rate=self.dec_drop_path,
            img_size=self.img_size,
            deep_supervision=self.deep_supervision,
            ssm_backend=self.ssm_backend,
            dtype=self.dtype,
            name="decoder",
        )(skips, deterministic)
