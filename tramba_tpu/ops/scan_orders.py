"""Scan-order library: multi-directional 2-D traversal orders for Helix-SS2D.

Each *order* turns a feature map flattened to a length-``L = H*W`` sequence
into ``K`` directional sequences (the "cross scan"), and merges ``K``
directional sequences back by accumulation (the "cross merge").  These are the
TPU-native equivalents of the reference's ``Models/SS2D/`` autograd Functions
(``csms6s.py:13-737``) and their index generators (``SpiralLine.py``,
``Dilation.py``, ``Window.py``, ``Spiral.py``, ``Hilbert.py``).

TPU-first design
----------------
* Every direction is a **static int32 gather table** ``idx[k, :]`` of length
  ``L``: sequence position ``p`` of direction ``k`` reads flat pixel
  ``idx[k, p]``.  Tables are pure-numpy, computed once per ``(order, H, W)``
  and cached; they become jit-time constants.
* The merge (scatter-add in the reference, ``SpiralLine.py:109-133``) is
  re-expressed as **gathers from a precomputed multi-slot inverse table**:
  for each output pixel we enumerate the (at most ``max_mult``) sequence
  positions that visited it.  Scatters never appear on the device; merge is
  ``max_mult`` gathers + adds.  For permutation orders (raster, dilation,
  window, spiral, hilbert) ``max_mult == 1``.  Bresenham line orders visit
  some pixels several times and miss others — exactly like the reference's
  ``scatter_add_`` semantics.
* ``scan``/``merge`` are linear maps and exact transposes of one another, so
  each is given a ``custom_vjp`` that calls the other (mirroring
  ``CrossScan.backward == CrossMerge.forward``, ``csms6s.py:24-31/44-55``).

Data layout is channels-last: sequences are ``(..., L, D)`` and the gather
runs over the second-to-last axis, i.e. it moves contiguous channel rows —
the layout TPUs copy efficiently.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "ScanOrder",
    "get_order",
    "cross_scan",
    "cross_merge",
    "raster_tables",
    "line_tables",
    "dilation_tables",
    "window_tables",
    "spiral_tables",
    "hilbert_tables",
]


# ---------------------------------------------------------------------------
# Index-table generators (pure numpy; order-exact wrt the reference)
# ---------------------------------------------------------------------------


def raster_tables(H: int, W: int) -> np.ndarray:
    """4 raster orders: row-major, column-major, and both reversed.

    Matches ``CrossScan`` (csms6s.py:13-31): direction 1 reads the transposed
    map in row-major order, directions 2/3 are directions 0/1 reversed.
    """
    L = H * W
    k0 = np.arange(L, dtype=np.int64)
    i, j = np.divmod(k0, W)
    # transpose read: output position w*H + h reads pixel h*W + w
    k1 = (k0 % H) * W + (k0 // H)
    k2 = k0[::-1]
    k3 = k1[::-1]
    return np.stack([k0, k1, k2, k3]).astype(np.int32)


def _bresenham(x0: int, y0: int, x1: int, y1: int) -> list:
    """Integer line rasterization (SpiralLine.py:3-24 semantics)."""
    pts = []
    dx, dy = abs(x1 - x0), abs(y1 - y0)
    sx = 1 if x0 < x1 else -1
    sy = 1 if y0 < y1 else -1
    err = dx - dy
    while True:
        pts.append((x0, y0))
        if x0 == x1 and y0 == y1:
            break
        e2 = 2 * err
        if e2 > -dy:
            err -= dy
            x0 += sx
        if e2 < dx:
            err += dx
            y0 += sy
    return pts


def line_tables(H: int, W: int) -> np.ndarray:
    """4 "Helix" Bresenham diagonal-line orders (SpiralLine.py:27-82).

    Two interleaved families (even / odd start rows+cols), each also reversed
    per-line.  Flat index convention follows the reference exactly:
    ``flat = x + y * H`` (SpiralLine.py:103) — valid because H == W in all
    live configurations.
    """
    assert H == W, "line scan tables assume square maps (as the reference does)"
    fam0, fam0_flip, fam1, fam1_flip = [], [], [], []
    for start_row in range(0, H, 2):
        pts = _bresenham(0, start_row, H - 1, W - 1 - start_row)
        fam0.extend(pts)
        fam0_flip.extend(pts[::-1])
    start = 0 if H % 2 == 0 else 2
    for start_col in range(start, W, 2):
        pts = _bresenham(start_col, W - 1, H - 1 - start_col, 0)
        fam0.extend(pts)
        fam0_flip.extend(pts[::-1])
    for start_row in range(1, H, 2):
        pts = _bresenham(0, start_row, H - 1, W - 1 - start_row)
        fam1.extend(pts)
        fam1_flip.extend(pts[::-1])
    if H % 2 != 0:
        pts = _bresenham(0, W - 1, H - 1, 0)
        fam1.extend(pts)
        fam1_flip.extend(pts[::-1])
    for start_col in range(1, W, 2):
        pts = _bresenham(start_col, W - 1, H - 1 - start_col, 0)
        fam1.extend(pts)
        fam1_flip.extend(pts[::-1])

    out = []
    for pts in (fam0, fam0_flip, fam1, fam1_flip):
        a = np.asarray(pts, dtype=np.int64)
        assert a.shape[0] == H * W, (a.shape, H, W)
        out.append(a[:, 0] + a[:, 1] * H)
    return np.stack(out).astype(np.int32)


def dilation_tables(H: int, W: int, rate: int = 4) -> np.ndarray:
    """4 stride-``rate`` dilated raster orders (Dilation.py:3-45).

    The base orders are [row-major, transpose, both flipped]; each is then
    re-ordered into ``rate`` interleaved passes (all positions congruent to
    phase p first, then p+1, ...).  Flat index = row * H + col
    (Dilation.py:66; H == W).
    """
    L = H * W
    base = raster_tables(H, W)  # rows give (i, j) visit orders
    # reference coords: c0[(i,j) row-major], c1[(j,i)], c2 = flip c0, c3 = flip c1
    # with flat = p0 * H + p1  => c0 -> identity, c1 -> transpose-read, etc.
    # raster_tables matches this mapping exactly for square maps.
    phase = np.arange(L) % rate
    order = np.concatenate([np.where(phase == p)[0] for p in range(rate)])
    return base[:, order].astype(np.int32)


def window_tables(H: int, W: int, window: int) -> np.ndarray:
    """4 window-partitioned raster orders (Window.py:3-35).

    Horizontal: windows in row-major grid order, pixels row-major within the
    window.  Vertical: same grid order but pixels read from the transposed
    window location ``(j+x, i+y)`` with column-major in-window order.  Both
    also fully reversed.  Flat index = p0 * H + p1 (Window.py:56; H == W).
    """
    assert 0 < window <= H and H % window == 0 and W % window == 0
    horiz, vert = [], []
    for i in range(0, H, window):
        for j in range(0, W, window):
            horiz.extend((i + x, j + y) for x in range(window) for y in range(window))
            vert.extend((j + x, i + y) for y in range(window) for x in range(window))
    tabs = []
    for pts in (horiz, horiz[::-1], vert, vert[::-1]):
        a = np.asarray(pts, dtype=np.int64)
        tabs.append(a[:, 0] * H + a[:, 1])
    return np.stack(tabs).astype(np.int32)


def spiral_tables(H: int, W: int) -> np.ndarray:
    """Clockwise + counter-clockwise inward spirals, each also reversed (K=4).

    Mirrors ``Spiral.py:3-86`` / ``CrossScan_Spiral`` (csms6s.py:264-369):
    start at the top-left, walk the perimeter inward ring by ring.
    """
    order = []
    top, bottom, left, right = 0, H - 1, 0, W - 1
    while top <= bottom and left <= right:
        for j in range(left, right + 1):
            order.append(top * W + j)
        for i in range(top + 1, bottom + 1):
            order.append(i * W + right)
        if top < bottom:
            for j in range(right - 1, left - 1, -1):
                order.append(bottom * W + j)
        if left < right:
            for i in range(bottom - 1, top, -1):
                order.append(i * W + left)
        top, bottom, left, right = top + 1, bottom - 1, left + 1, right - 1
    cw = np.asarray(order, dtype=np.int64)
    assert cw.shape[0] == H * W
    # counter-clockwise: transpose of the clockwise walk
    i, j = np.divmod(cw, W)
    ccw = j * W + i
    return np.stack([cw, ccw, cw[::-1], ccw[::-1]]).astype(np.int32)


def _gilbert2d(width: int, height: int):
    """Generalized Hilbert space-filling curve over an arbitrary rectangle.

    Same algorithm family as the reference's ``Hilbert.py`` (gilbert).
    Yields (x, y) pairs covering the width x height grid exactly once.
    """

    def sgn(v):
        return (v > 0) - (v < 0)

    def generate(x, y, ax, ay, bx, by):
        w = abs(ax + ay)
        h = abs(bx + by)
        dax, day = sgn(ax), sgn(ay)
        dbx, dby = sgn(bx), sgn(by)
        if h == 1:
            for _ in range(w):
                yield (x, y)
                x, y = x + dax, y + day
            return
        if w == 1:
            for _ in range(h):
                yield (x, y)
                x, y = x + dbx, y + dby
            return
        ax2, ay2 = ax // 2, ay // 2
        bx2, by2 = bx // 2, by // 2
        w2 = abs(ax2 + ay2)
        h2 = abs(bx2 + by2)
        if 2 * w > 3 * h:
            if (w2 % 2) and (w > 2):
                ax2, ay2 = ax2 + dax, ay2 + day
            yield from generate(x, y, ax2, ay2, bx, by)
            yield from generate(x + ax2, y + ay2, ax - ax2, ay - ay2, bx, by)
        else:
            if (h2 % 2) and (h > 2):
                bx2, by2 = bx2 + dbx, by2 + dby
            yield from generate(x, y, bx2, by2, ax2, ay2)
            yield from generate(x + bx2, y + by2, ax, ay, bx - bx2, by - by2)
            yield from generate(
                x + (ax - dax) + (bx2 - dbx),
                y + (ay - day) + (by2 - dby),
                -bx2,
                -by2,
                -(ax - ax2),
                -(ay - ay2),
            )

    if width >= height:
        yield from generate(0, 0, width, 0, 0, height)
    else:
        yield from generate(0, 0, 0, height, width, 0)


def hilbert_tables(H: int, W: int) -> np.ndarray:
    """Hilbert curve order, its vertical flip, and both reversed (K=4).

    Mirrors ``CrossScan_Hilbert`` (csms6s.py:372-474) built on the gilbert
    generator (Hilbert.py:370-380).
    """
    pts = np.asarray(list(_gilbert2d(W, H)), dtype=np.int64)  # (L, 2) as (x, y)
    flat = pts[:, 1] * W + pts[:, 0]
    flipped = (H - 1 - pts[:, 1]) * W + pts[:, 0]
    return np.stack([flat, flipped, flat[::-1], flipped[::-1]]).astype(np.int32)


# ---------------------------------------------------------------------------
# ScanOrder: gather table + multi-slot inverse merge table
# ---------------------------------------------------------------------------


class ScanOrder:
    """A K-direction traversal order with precomputed scan & merge tables.

    Attributes
    ----------
    idx : (K, L) int32 — sequence position p of direction k reads pixel idx[k, p].
    inv : (K, max_mult, L) int32 — the sequence positions that wrote pixel l
        (padding slots point at position L, a zero column appended at merge time).
    """

    def __init__(self, idx: np.ndarray):
        idx = np.asarray(idx, dtype=np.int32)
        K, L = idx.shape
        self.K, self.L = K, L
        counts = np.zeros((K, L), dtype=np.int64)
        for k in range(K):
            np.add.at(counts[k], idx[k].astype(np.int64), 1)
        max_mult = int(counts.max())
        inv = np.full((K, max_mult, L), L, dtype=np.int32)
        fill = np.zeros((K, L), dtype=np.int64)
        for k in range(K):
            for p in range(L):
                l = int(idx[k, p])
                inv[k, fill[k, l], l] = p
                fill[k, l] += 1
        self.max_mult = max_mult
        self.is_permutation = max_mult == 1 and bool((counts == 1).all())
        self._idx_np = idx
        self._inv_np = inv

    @property
    def idx(self) -> np.ndarray:
        # kept as numpy: embedded as a jit-time constant per trace (caching a
        # jnp array would leak tracers out of the first trace that builds it)
        return self._idx_np

    @property
    def inv(self) -> np.ndarray:
        return self._inv_np


@functools.lru_cache(maxsize=None)
def get_order(kind: str, H: int, W: int, param: int = 0) -> ScanOrder:
    """Build (and cache) the ScanOrder for a given kind and resolution.

    Kinds: ``raster`` (K=4), ``line`` (K=8: raster + Bresenham lines, the
    Helix order of ``CrossScan_Line``), ``line4`` (K=4 lines only),
    ``dilation`` (K=4, param = dilation rate, default 4),
    ``window`` (K=4, param = window size), ``spiral`` / ``hilbert`` (K=4),
    ``spiral8`` (K=8: raster + spiral, ``CrossScan_Spiral`` csms6s.py:264-369).
    """
    if kind == "raster":
        t = raster_tables(H, W)
    elif kind == "line":
        t = np.concatenate([raster_tables(H, W), line_tables(H, W)], axis=0)
    elif kind == "line4":
        t = line_tables(H, W)
    elif kind == "dilation":
        t = dilation_tables(H, W, param or 4)
    elif kind == "window":
        t = window_tables(H, W, param)
    elif kind == "spiral":
        t = spiral_tables(H, W)
    elif kind == "spiral8":
        t = np.concatenate([raster_tables(H, W), spiral_tables(H, W)], axis=0)
    elif kind == "hilbert":
        t = hilbert_tables(H, W)
    else:
        raise ValueError(f"unknown scan order kind: {kind}")
    return ScanOrder(t)


# ---------------------------------------------------------------------------
# scan / merge ops (linear, mutually-transposed custom VJPs)
# ---------------------------------------------------------------------------


def _scan_impl(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    # x: (B, L, D), idx: (K, L) -> (B, K, L, D)
    return jnp.take(x, idx, axis=1)  # (B, K, L, D)


def _merge_impl(ys: jnp.ndarray, inv: jnp.ndarray) -> jnp.ndarray:
    # ys: (B, K, L, D), inv: (K, M, L) -> (B, L, D)
    B, K, L, D = ys.shape
    M = inv.shape[1]
    zero = jnp.zeros((B, K, 1, D), ys.dtype)
    ys_pad = jnp.concatenate([ys, zero], axis=2)  # (B, K, L+1, D)
    out = jnp.zeros((B, L, D), ys.dtype)
    for k in range(K):
        for m in range(M):
            out = out + jnp.take(ys_pad[:, k], inv[k, m], axis=1)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _scan_op(x, kind, HW, param):
    order = get_order(kind, HW[0], HW[1], param)
    return _scan_impl(x, order.idx)


def _scan_fwd(x, kind, HW, param):
    return _scan_op(x, kind, HW, param), None


def _scan_bwd(kind, HW, param, _, g):
    order = get_order(kind, HW[0], HW[1], param)
    return (_merge_impl(g, order.inv),)


_scan_op.defvjp(_scan_fwd, _scan_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _merge_op(ys, kind, HW, param):
    order = get_order(kind, HW[0], HW[1], param)
    return _merge_impl(ys, order.inv)


def _merge_fwd(ys, kind, HW, param):
    return _merge_op(ys, kind, HW, param), None


def _merge_bwd(kind, HW, param, _, g):
    order = get_order(kind, HW[0], HW[1], param)
    return (_scan_impl(g, order.idx),)


_merge_op.defvjp(_merge_fwd, _merge_bwd)


def cross_scan(x: jnp.ndarray, kind: str, H: int, W: int, param: int = 0) -> jnp.ndarray:
    """(B, L, D) -> (B, K, L, D): gather K directional sequences."""
    return _scan_op(x, kind, (H, W), param)


def cross_merge(ys: jnp.ndarray, kind: str, H: int, W: int, param: int = 0) -> jnp.ndarray:
    """(B, K, L, D) -> (B, L, D): accumulate K directional sequences back."""
    return _merge_op(ys, kind, (H, W), param)
