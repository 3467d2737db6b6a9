"""Saliency-map dump + offline evaluation (test_TSOD.py / evaluate_TSOD.py).

Dump: run the model over a test split, bilinear-resize the full-res logits
back to each image's original resolution, sigmoid, save uint8 PNGs
(test_TSOD.py:54-68 semantics).  Batched on the TPU; per-image host resize.

Evaluate: read dumped maps + GT masks, stream the full metric suite, save
PR curves, print the results row (evaluate_TSOD.py:51-115 semantics).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence

import cv2
import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from tramba_tpu.data.pipeline import BatchLoader, SODDataset, natural_sort
from tramba_tpu.eval.metrics import SODMetrics

__all__ = ["dump_saliency_maps", "evaluate_maps", "format_results_row"]


def dump_saliency_maps(model, variables, data_root: str, save_path: str, img_size: int = 384,
                       sets: Sequence[str] = ("Test",), batch_size: int = 8) -> int:
    """Returns the number of maps written to ``save_path``."""
    os.makedirs(save_path, exist_ok=True)
    ds = SODDataset(data_root, list(sets), img_size, mode="test")
    loader = BatchLoader(ds, batch_size=batch_size, shuffle=False)

    from tramba_tpu.utils.jit import tramba_jit

    @tramba_jit
    def infer(v, images):
        # params passed as arguments (closing over them would embed hundreds
        # of MB of constants into the compiled program)
        outs = model.apply(v, images, deterministic=True)
        return outs[-1][..., 0].astype(jnp.float32)

    infer = functools.partial(infer, variables)

    count = 0
    for batch in loader:
        n = batch["image"].shape[0]
        images = batch["image"]
        if n < batch_size:  # pad to the compiled batch shape
            images = np.concatenate([images, np.repeat(images[-1:], batch_size - n, 0)])
        logits = np.asarray(infer(jnp.asarray(images)))[:n]
        for i in range(n):
            w, h = batch["shape"][i]  # PIL (W, H)
            up = cv2.resize(logits[i], (w, h), interpolation=cv2.INTER_LINEAR)
            pred = 1.0 / (1.0 + np.exp(-up))
            out = (pred * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(save_path, batch["name"][i] + ".png"), out)
            count += 1
    return count


def evaluate_maps(salmap_root: str, gt_root: str, save_pr_dir: Optional[str] = None) -> dict:
    """Offline metric evaluation of dumped maps against GT masks."""
    sal_files = {f for f in os.listdir(salmap_root) if f.endswith((".jpg", ".png"))}
    gt_files = {f for f in os.listdir(gt_root) if f.endswith((".jpg", ".png"))}
    common = natural_sort(sorted(sal_files & gt_files))
    metrics = SODMetrics()
    for f in common:
        sal = np.asarray(Image.open(os.path.join(salmap_root, f)).convert("L"), np.float32)
        gt = np.asarray(Image.open(os.path.join(gt_root, f)).convert("L"), np.float32)
        assert gt.shape == sal.shape, f
        gt = gt / (gt.max() + 1e-8)
        metrics.step(sal / 255.0, gt)
    results = metrics.results()
    results["count"] = metrics.count
    if save_pr_dir is not None:
        p, r = metrics.precision_recall_curves()
        np.save(os.path.join(save_pr_dir, "precision.npy"), p.astype(np.float32))
        np.save(os.path.join(save_pr_dir, "recall.npy"), r.astype(np.float32))
    return results


def format_results_row(model_name: str, dataset: str, r: dict) -> str:
    """LaTeX-ish row matching evaluate_TSOD.py:104-113 column order."""
    cols = [r["adpFm"], r["maxFm"], r["meanFm"], r["adpEm"], r["maxEm"], r["meanEm"],
            r["Smeasure"], r["MAE"]]
    return (f"model: {model_name} | dataset: {dataset} || "
            + " & ".join(str(round(c, 4)) for c in cols))
