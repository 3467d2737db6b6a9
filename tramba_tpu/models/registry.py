"""Model registry: string-keyed factory preserving the reference method names.

Mirrors ``get_model.py:2-31``: 'BaseUMamba-SOD', 'Tramba-V-{TSOD,SOD}',
'Tramba-{S,P,R}-{TSOD,SOD}'.  Returns the flax Module; parameters are
initialized or loaded separately (compat.torch_weights for torch ckpts,
orbax for native ones).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from tramba_tpu.models.tramba import BaseUMamba, TrambaEnc, TrambaV

__all__ = ["build", "METHODS"]

METHODS = (
    "BaseUMamba-SOD",
    "Tramba-V-TSOD",
    "Tramba-V-SOD",
    "Tramba-S-TSOD",
    "Tramba-S-SOD",
    "Tramba-P-TSOD",
    "Tramba-P-SOD",
    "Tramba-R-TSOD",
    "Tramba-R-SOD",
)

_ENC_BY_LETTER = {"S": "swin", "P": "pvt", "R": "resnet"}


def build(model_name: str, args=None, *, img_size: Optional[int] = None,
          dtype=jnp.float32, ssm_backend: Optional[str] = None):
    """Build a model by method string (get_model.py semantics).

    ``args`` may be an argparse namespace with ``img_size`` (reference CLI
    compatibility); keyword overrides win.
    """
    size = img_size or (getattr(args, "img_size", None) if args is not None else None) or 384

    if model_name == "BaseUMamba-SOD":
        return BaseUMamba(img_size=size, dims=128, dtype=dtype, ssm_backend=ssm_backend)
    if model_name in ("Tramba-V-TSOD", "Tramba-V-SOD"):
        return TrambaV(img_size=size, dims=128, dtype=dtype, ssm_backend=ssm_backend)
    parts = model_name.split("-")
    if len(parts) == 3 and parts[0] == "Tramba" and parts[1] in _ENC_BY_LETTER and parts[2] in ("TSOD", "SOD"):
        return TrambaEnc(enc_type=_ENC_BY_LETTER[parts[1]], img_size=size, dtype=dtype,
                         ssm_backend=ssm_backend)
    raise ValueError(f"unknown method: {model_name!r}; known: {METHODS}")
