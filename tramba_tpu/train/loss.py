"""Training losses: deep-supervision BCE + soft IoU.

Reference semantics: ``utils/loss.py:6-11`` (soft IoU on sigmoid predictions)
and ``train.py:53-95`` (each head bilinear-upsampled to full resolution,
BCEWithLogits + IoU summed with unit weights).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

__all__ = ["bce_with_logits", "iou_loss", "deep_supervision_loss", "structure_loss", "weighted_bce"]


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean binary cross-entropy on logits (torch BCEWithLogitsLoss semantics)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    # log(1+exp(-|x|)) + max(x,0) - x*t  — numerically stable
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(loss)


def iou_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Soft IoU loss on sigmoid predictions (utils/loss.py:6-11).

    Reduces over spatial dims per sample, then averages: 1 - (inter+1)/(union+1).
    """
    pred = jax.nn.sigmoid(logits.astype(jnp.float32))
    targets = targets.astype(jnp.float32)
    axes = tuple(range(1, pred.ndim))
    inter = jnp.sum(pred * targets, axis=axes)
    union = jnp.sum(pred + targets, axis=axes) - inter
    return jnp.mean(1.0 - (inter + 1.0) / (union + 1.0))


def _resize_bilinear(x: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    if x.shape[1] == H and x.shape[2] == W:
        return x
    return jax.image.resize(x, (x.shape[0], H, W, x.shape[3]), method="bilinear")


def deep_supervision_loss(outputs: Sequence[jnp.ndarray], gt: jnp.ndarray,
                          valid=None) -> jnp.ndarray:
    """Sum of (BCE + IoU) over all heads, each upsampled to gt resolution.

    ``valid``: optional (B,) 0/1 weights — rows padded to fill the device
    batch get zero weight and the mean renormalizes over real samples (the
    reference trains on the raw smaller last batch; this matches it exactly).
    """
    H, W = gt.shape[1], gt.shape[2]
    gtf = gt.astype(jnp.float32)
    if valid is None:
        w = jnp.ones((gt.shape[0],), jnp.float32)
    else:
        w = valid.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(w), 1.0)
    axes = tuple(range(1, gt.ndim))
    total = 0.0
    for out in outputs:
        up = _resize_bilinear(out, H, W).astype(jnp.float32)
        bce = jnp.maximum(up, 0) - up * gtf + jnp.log1p(jnp.exp(-jnp.abs(up)))
        bce = jnp.sum(w * jnp.mean(bce, axis=axes)) / denom
        pred = jax.nn.sigmoid(up)
        inter = jnp.sum(pred * gtf, axis=axes)
        union = jnp.sum(pred + gtf, axis=axes) - inter
        iou = jnp.sum(w * (1.0 - (inter + 1.0) / (union + 1.0))) / denom
        total = total + bce + iou
    return total


def structure_loss(logits: jnp.ndarray, mask: jnp.ndarray, weight=None) -> jnp.ndarray:
    """Edge-weighted BCE + weighted IoU on smoothed GT (utils/loss.py:15-34).

    NHWC tensors; the 31x31 average pool computes a local-context deviation
    weight emphasizing boundary pixels.
    """
    logits = logits.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    if weight is None:
        # torch avg_pool2d default counts padded zeros: divide by the full 31*31
        pooled = jax.lax.reduce_window(
            mask, 0.0, jax.lax.add, (1, 31, 31, 1), (1, 1, 1, 1), "SAME"
        ) / (31.0 * 31.0)
        weit = 1 + 5 * jnp.abs(pooled - mask)
    else:
        weit = 1 + 5 * weight
    eps = 0.001
    smooth = (1 - eps) * mask + eps / 2
    raw_bce = jnp.maximum(logits, 0) - logits * smooth + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    axes = (1, 2, 3)
    wbce_v = jnp.sum(weit * raw_bce, axis=axes) / jnp.sum(weit, axis=axes)
    pred = jax.nn.sigmoid(logits)
    inter = jnp.sum(pred * mask * weit, axis=axes)
    union = jnp.sum((pred + mask) * weit, axis=axes)
    wiou = 1 - (inter + 1) / (union - inter + 1)
    return jnp.mean(wbce_v + wiou)


def weighted_bce(logits: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Edge-weighted BCE with a 15x15 context window (utils/loss.py:38-42)."""
    logits = logits.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    pooled = jax.lax.reduce_window(
        mask, 0.0, jax.lax.add, (1, 15, 15, 1), (1, 1, 1, 1), "SAME"
    ) / (15.0 * 15.0)
    weit = 1 + 5 * jnp.abs(pooled - mask)
    raw_bce = jnp.maximum(logits, 0) - logits * mask + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    axes = (1, 2, 3)
    return jnp.mean(jnp.sum(weit * raw_bce, axis=axes) / jnp.sum(weit, axis=axes))
