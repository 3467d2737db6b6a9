"""VMamba-B encoder (flax, NHWC).

Re-design of ``VSSMEncoder`` (Models/vmamba.py:399-518): two-conv stem
(stride 2 each), four stages of VSSBlocks with conv-stride-2 downsampling
between, stochastic-depth linearly increasing to ``drop_path_rate``.
Returns ``[input_image, f1 (1/4, C), f2 (1/8, 2C), f3 (1/16, 4C),
f4 (1/32, 8C)]`` — the raw-image slot kept for skip-index parity with the
reference (vmamba.py:505-518).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tramba_tpu.nn.blocks import VSSBlock
from tramba_tpu.nn.layers import LayerNorm, conv_kaiming_init

__all__ = ["VSSMEncoder"]


class VSSMEncoder(nn.Module):
    depths: Sequence[int] = (2, 2, 15, 2)
    dims: int = 128
    drop_path_rate: float = 0.6
    ssm_backend: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        dims = [self.dims * 2**i for i in range(len(self.depths))]
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))

        skips = [x]
        # stem: conv s2 -> LN -> GELU -> conv s2 -> LN (vmamba.py:473-489)
        h = nn.Conv(dims[0] // 2, (3, 3), strides=2, padding=1, kernel_init=conv_kaiming_init,
                    dtype=self.dtype, name="patch_embed_conv1")(x)
        h = LayerNorm(dtype=self.dtype, name="patch_embed_norm1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(dims[0], (3, 3), strides=2, padding=1, kernel_init=conv_kaiming_init,
                    dtype=self.dtype, name="patch_embed_conv2")(h)
        h = LayerNorm(dtype=self.dtype, name="patch_embed_norm2")(h)

        for s, depth in enumerate(self.depths):
            for d in range(depth):
                h = VSSBlock(
                    hidden_dim=dims[s],
                    drop_path=float(dpr[sum(self.depths[:s]) + d]),
                    ssm_backend=self.ssm_backend,
                    dtype=self.dtype,
                    name=f"layers_{s}_block_{d}",
                )(h, deterministic)
            skips.append(h)
            if s < len(self.depths) - 1:
                # downsample v3: conv k3 s2 + LN (vmamba.py:449-457)
                h = nn.Conv(dims[s] * 2, (3, 3), strides=2, padding=1, kernel_init=conv_kaiming_init,
                            dtype=self.dtype, name=f"downsample_{s}_conv")(h)
                h = LayerNorm(dtype=self.dtype, name=f"downsample_{s}_norm")(h)
        return skips
