"""Checkpoint save/resume (Orbax) + torch-checkpoint interop.

Reference formats (train.py:248-263): (a) best-MAE weights-only named
``{method}_MAE_{mae}_{epoch}``, (b) rolling resume dict {model, optimizer,
epoch} every 5 epochs, (c) upstream torch ckpts loaded via key surgery.
Native checkpoints here are Orbax directories with the same naming scheme;
``load_params_any`` also accepts reference ``.pth`` files and converts them.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = [
    "save_params",
    "load_params",
    "save_resume",
    "load_resume",
    "best_mae_path",
    "epoch_from_filename",
    "load_params_any",
    "load_torch_file",
]


def _ckptr():
    return ocp.StandardCheckpointer()


def save_params(path: str, params: Any):
    c = _ckptr()
    c.save(os.path.abspath(path), jax.tree.map(np.asarray, params), force=True)
    c.wait_until_finished()


def load_params(path: str, like: Optional[Any] = None) -> Any:
    if like is not None:
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, like)
        return _ckptr().restore(os.path.abspath(path), target)
    return _ckptr().restore(os.path.abspath(path))


def save_resume(path: str, state, epoch: int):
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
        "epoch": np.asarray(epoch),
    }
    c = _ckptr()
    c.save(os.path.abspath(path), jax.tree.map(np.asarray, payload), force=True)
    c.wait_until_finished()


def load_resume(path: str, state) -> Tuple[Any, int]:
    """Restore (state, next_start_epoch) from a resume checkpoint."""
    target = jax.tree.map(
        ocp.utils.to_shape_dtype_struct,
        {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
            "epoch": np.asarray(0),
        },
    )
    restored = _ckptr().restore(os.path.abspath(path), target)
    new_state = state.replace(
        params=restored["params"], opt_state=restored["opt_state"], step=restored["step"]
    )
    return new_state, int(restored["epoch"]) + 1


def best_mae_path(save_dir: str, method: str, mae: float, epoch: int) -> str:
    return os.path.join(save_dir, f"{method}_MAE_{round(float(mae), 4)}_{epoch + 1}.ckpt")


def epoch_from_filename(path: str) -> int:
    """{method}_MAE_{mae}_{epoch}.{ext} -> epoch (train.py:226-227)."""
    stem = os.path.basename(path)
    stem = re.sub(r"\.(pth|ckpt)$", "", stem)
    return int(stem.split("_")[-1])


def load_torch_file(path: str):
    """Load a torch .pth into a numpy state_dict (no CUDA required)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj and hasattr(obj["model"], "items"):
        return obj  # resume-style dict; caller picks pieces
    return obj


def load_params_any(path: str, method: str, like: Optional[Any] = None) -> Any:
    """Load model params from an Orbax dir or a reference torch .pth file."""
    if path.endswith(".pth"):
        from tramba_tpu.compat import torch_weights as tw

        sd = load_torch_file(path)
        if isinstance(sd, dict) and "model" in sd:
            sd = sd["model"]
        if method.startswith("Tramba-V"):
            return tw.convert_tramba_v(sd)
        if method == "BaseUMamba-SOD":
            return tw.convert_base_umamba(sd)
        enc = {"S": "swin", "P": "pvt", "R": "resnet"}[method.split("-")[1]]
        return tw.convert_tramba_enc(sd, enc)
    return load_params(path, like)
