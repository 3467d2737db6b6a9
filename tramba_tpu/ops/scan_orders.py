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
    "diagonal_tables",
    "ab_tables",
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
    if H != W:
        # The reference defines the Helix orders only on square maps (its
        # flat-index convention x + y*H is square-only, SpiralLine.py:103),
        # and the family-coverage proof relies on the square diagonal
        # structure.  Non-square inputs must use raster/window/dilation
        # scans (see README "Any square resolution").
        raise ValueError(
            f"line (Helix) scan orders are defined on square maps only "
            f"(got {H}x{W}); use scan_kind='raster'/'window'/'dilation' "
            f"for non-square feature maps")
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
    elif kind == "diagonal":
        t = diagonal_tables(H, W)
    elif kind == "diagonal8":
        t = np.concatenate([raster_tables(H, W), diagonal_tables(H, W)], axis=0)
    elif kind == "ab1":
        t = ab_tables(H, W, 1)
    elif kind == "ab2":
        t = ab_tables(H, W, 2)
    else:
        raise ValueError(f"unknown scan order kind: {kind}")
    return ScanOrder(t)


# ---------------------------------------------------------------------------
# structured fast paths: raster / dilation / window orders are pure layout
# ops (reshape / transpose / flip) — no gathers touch the device.  Only the
# Bresenham line directions need real index gathers.
# ---------------------------------------------------------------------------


def _t(x, H, W):
    """Sequence-order transpose: row-major of the transposed map."""
    B, L, D = x.shape
    return x.reshape(B, H, W, D).transpose(0, 2, 1, 3).reshape(B, L, D)


def _raster_scan_fast(x, H, W):
    x1 = _t(x, H, W)
    return jnp.stack([x, x1, jnp.flip(x, 1), jnp.flip(x1, 1)], axis=1)


def _raster_merge_fast(ys, H, W):
    a = ys[:, 0] + jnp.flip(ys[:, 2], 1)
    b = ys[:, 1] + jnp.flip(ys[:, 3], 1)
    return a + _t(b, W, H)


def _phase_major(x, rate):
    """Dilated order: all positions = p (mod rate) first, then p+1, ..."""
    B, L, D = x.shape
    return x.reshape(B, L // rate, rate, D).transpose(0, 2, 1, 3).reshape(B, L, D)


def _phase_major_inv(x, rate):
    B, L, D = x.shape
    return x.reshape(B, rate, L // rate, D).transpose(0, 2, 1, 3).reshape(B, L, D)


def _dilation_scan_fast(x, H, W, rate):
    xt = _t(x, H, W)
    return jnp.stack(
        [
            _phase_major(x, rate),
            _phase_major(xt, rate),
            _phase_major(jnp.flip(x, 1), rate),
            _phase_major(jnp.flip(xt, 1), rate),
        ],
        axis=1,
    )


def _dilation_merge_fast(ys, H, W, rate):
    y0 = _phase_major_inv(ys[:, 0], rate)
    y1 = _phase_major_inv(ys[:, 1], rate)
    y2 = jnp.flip(_phase_major_inv(ys[:, 2], rate), 1)
    y3 = jnp.flip(_phase_major_inv(ys[:, 3], rate), 1)
    return y0 + y2 + _t(y1 + y3, W, H)


def _window_order(x, H, W, ws):
    """Windows in row-major grid order, row-major within each window."""
    B, L, D = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, D)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, L, D)


def _window_order_inv(x, H, W, ws):
    B, L, D = x.shape
    x = x.reshape(B, H // ws, W // ws, ws, ws, D)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, L, D)


def _window_scan_fast(x, H, W, ws):
    h = _window_order(x, H, W, ws)
    v = _window_order(_t(x, H, W), W, H, ws)
    return jnp.stack([h, jnp.flip(h, 1), v, jnp.flip(v, 1)], axis=1)


def _window_merge_fast(ys, H, W, ws):
    h = _window_order_inv(ys[:, 0] + jnp.flip(ys[:, 1], 1), H, W, ws)
    v = _window_order_inv(ys[:, 2] + jnp.flip(ys[:, 3], 1), W, H, ws)
    return h + _t(v, W, H)


@functools.lru_cache(maxsize=None)
def _line_selectors(H: int, W: int):
    """Dense one-hot selectors turning Bresenham line scans into MXU matmuls.

    Structure (verified against the tables): each row-started line visits
    exactly one pixel per column (|dy| <= dx), each column-started line one
    pixel per row with descending row order.  So family f's sequence is
    part1[l, x] = img[Y_f[l, x], x] followed by part2[l, j] = img[W-1-j,
    X_f[l, j]] — per-column / per-row selections, i.e. batched (tiny)
    matmuls with 0/1 matrices instead of scatter/gather.
    """
    out = []
    tabs = line_tables(H, W)
    n1 = ((H + 1) // 2) * H  # row-started lines come first
    for fam_dir in (0, 2):
        tab = tabs[fam_dir].astype(np.int64)
        part1 = tab[:n1].reshape(-1, H)
        y1, x1 = part1 // H, part1 % H
        assert (x1 == np.arange(H)).all()
        P1 = np.zeros((W, part1.shape[0], H), np.float32)  # [x, l, y]
        P1[x1.reshape(-1), np.repeat(np.arange(part1.shape[0]), H), y1.reshape(-1)] = 1
        part2 = tab[n1:].reshape(-1, W)
        y2, x2 = part2 // H, part2 % H
        assert (y2 == np.arange(W - 1, -1, -1)).all()
        n2 = part2.shape[0]
        Q2 = np.zeros((H, n2, W), np.float32)  # [row, l, col]
        rows = (W - 1 - np.repeat(np.arange(W)[None], n2, 0)).reshape(-1)
        Q2[rows, np.repeat(np.arange(n2), W), x2.reshape(-1)] = 1
        out.append((P1, Q2))
    return out


def _sel_precision(dtype):
    # 0/1 selection matmuls must not truncate fp32 activations to bf16
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else jax.lax.Precision.DEFAULT


def _line_family_scan(ximg, P1, Q2):
    """(B, H, W, D) -> (B, L, D) sequence of one Bresenham family."""
    B, H, W, D = ximg.shape
    prec = _sel_precision(ximg.dtype)
    s1 = jnp.einsum("bhwd,wlh->blwd", ximg, P1.astype(ximg.dtype), precision=prec,
                    preferred_element_type=ximg.dtype)
    q = jnp.einsum("bhwd,hlw->blhd", ximg, Q2.astype(ximg.dtype), precision=prec,
                   preferred_element_type=ximg.dtype)
    s2 = jnp.flip(q, axis=2)
    return jnp.concatenate([s1.reshape(B, -1, D), s2.reshape(B, -1, D)], axis=1)


def _line_family_merge(seq, P1, Q2, H, W):
    """Transpose of :func:`_line_family_scan`: (B, L, D) -> (B, H, W, D)."""
    B, L, D = seq.shape
    n1, n2 = P1.shape[1], Q2.shape[1]
    prec = _sel_precision(seq.dtype)
    s1 = seq[:, : n1 * W].reshape(B, n1, W, D)
    s2 = jnp.flip(seq[:, n1 * W :].reshape(B, n2, H, D), axis=2)
    y1 = jnp.einsum("blwd,wlh->bhwd", s1, P1.astype(seq.dtype), precision=prec,
                    preferred_element_type=jnp.float32)
    y2 = jnp.einsum("blhd,hlw->bhwd", s2, Q2.astype(seq.dtype), precision=prec,
                    preferred_element_type=jnp.float32)
    return (y1 + y2).astype(seq.dtype)


def _per_line_flip(seq, H):
    B, L, D = seq.shape
    return jnp.flip(seq.reshape(B, L // H, H, D), axis=2).reshape(B, L, D)


def _line_scan_fast(x, H, W):
    """The 4 Bresenham directions: [fam0, fam0 per-line-flipped, fam1, ...]."""
    ximg = x.reshape(x.shape[0], H, W, x.shape[-1])
    (P1a, Q2a), (P1b, Q2b) = _line_selectors(H, W)
    fam0 = _line_family_scan(ximg, jnp.asarray(P1a), jnp.asarray(Q2a))
    fam1 = _line_family_scan(ximg, jnp.asarray(P1b), jnp.asarray(Q2b))
    return jnp.stack([fam0, _per_line_flip(fam0, H), fam1, _per_line_flip(fam1, H)], axis=1)


def _line_merge_fast(ys, H, W):
    (P1a, Q2a), (P1b, Q2b) = _line_selectors(H, W)
    f0 = ys[:, 0] + _per_line_flip(ys[:, 1], H)
    f1 = ys[:, 2] + _per_line_flip(ys[:, 3], H)
    y = _line_family_merge(f0, jnp.asarray(P1a), jnp.asarray(Q2a), H, W)
    y = y + _line_family_merge(f1, jnp.asarray(P1b), jnp.asarray(Q2b), H, W)
    return y.reshape(ys.shape[0], H * W, ys.shape[-1])


def _structured_scan(x, kind, H, W, param):
    if kind == "raster":
        return _raster_scan_fast(x, H, W)
    if kind == "dilation" and (H * W) % (param or 4) == 0:
        return _dilation_scan_fast(x, H, W, param or 4)
    if kind == "window":
        return _window_scan_fast(x, H, W, param)
    if kind == "line":
        return jnp.concatenate([_raster_scan_fast(x, H, W), _line_scan_fast(x, H, W)], axis=1)
    if kind == "line4":
        return _line_scan_fast(x, H, W)
    return None


def _structured_merge(ys, kind, H, W, param):
    if kind == "raster":
        return _raster_merge_fast(ys, H, W)
    if kind == "dilation" and (H * W) % (param or 4) == 0:
        return _dilation_merge_fast(ys, H, W, param or 4)
    if kind == "window":
        return _window_merge_fast(ys, H, W, param)
    if kind == "line":
        return _raster_merge_fast(ys[:, :4], H, W) + _line_merge_fast(ys[:, 4:], H, W)
    if kind == "line4":
        return _line_merge_fast(ys, H, W)
    return None


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


def _scan_any(x, kind, HW, param):
    out = _structured_scan(x, kind, HW[0], HW[1], param)
    if out is None:
        out = _scan_impl(x, get_order(kind, HW[0], HW[1], param).idx)
    return out


def _merge_any(ys, kind, HW, param):
    out = _structured_merge(ys, kind, HW[0], HW[1], param)
    if out is None:
        out = _merge_impl(ys, get_order(kind, HW[0], HW[1], param).inv)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _scan_op(x, kind, HW, param):
    return _scan_any(x, kind, HW, param)


def _scan_fwd(x, kind, HW, param):
    return _scan_op(x, kind, HW, param), None


def _scan_bwd(kind, HW, param, _, g):
    return (_merge_any(g, kind, HW, param),)


_scan_op.defvjp(_scan_fwd, _scan_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _merge_op(ys, kind, HW, param):
    return _merge_any(ys, kind, HW, param)


def _merge_fwd(ys, kind, HW, param):
    return _merge_op(ys, kind, HW, param), None


def _merge_bwd(kind, HW, param, _, g):
    return (_scan_any(g, kind, HW, param),)


_merge_op.defvjp(_merge_fwd, _merge_bwd)


def cross_scan(x: jnp.ndarray, kind: str, H: int, W: int, param: int = 0) -> jnp.ndarray:
    """(B, L, D) -> (B, K, L, D): gather K directional sequences."""
    return _scan_op(x, kind, (H, W), param)


def cross_merge(ys: jnp.ndarray, kind: str, H: int, W: int, param: int = 0) -> jnp.ndarray:
    """(B, K, L, D) -> (B, L, D): accumulate K directional sequences back."""
    return _merge_op(ys, kind, (H, W), param)


def diagonal_tables(H: int, W: int) -> np.ndarray:
    """Wrap-around (anti)diagonal orders (csms6s.py:478-528 gathers, K=4).

    Direction 0 walks anti-diagonals with wrap (column index shifts by row),
    direction 1 the main diagonals; 2/3 are the reverses.
    """
    rows = np.repeat(np.arange(H), W).reshape(H, W)
    cols = np.tile(np.arange(W), H).reshape(H, W)
    anti = (rows * W + (cols + rows) % W).T.reshape(-1)  # read column-major over shifted cols
    diag = (rows * W + (cols - rows) % W).T.reshape(-1)
    return np.stack([anti, diag, anti[::-1], diag[::-1]]).astype(np.int32)


def ab_tables(H: int, W: int, ndir: int = 1) -> np.ndarray:
    """Ablation orders: the same row-major order repeated K=4 times from
    1 or 2 base directions (csms6s.py:678-737)."""
    L = H * W
    k0 = np.arange(L, dtype=np.int32)
    if ndir == 1:
        return np.stack([k0, k0, k0, k0])
    k1 = raster_tables(H, W)[1]
    return np.stack([k0, k1, k0, k1]).astype(np.int32)


def _line_dirs_list(x, H, W):
    """The 4 Bresenham directions as a list of (B, L, D) arrays (no stack)."""
    ximg = x.reshape(x.shape[0], H, W, x.shape[-1])
    (P1a, Q2a), (P1b, Q2b) = _line_selectors(H, W)
    fam0 = _line_family_scan(ximg, jnp.asarray(P1a), jnp.asarray(Q2a))
    fam1 = _line_family_scan(ximg, jnp.asarray(P1b), jnp.asarray(Q2b))
    return [fam0, _per_line_flip(fam0, H), fam1, _per_line_flip(fam1, H)]


def _line_merge_dirs(ys, H, W):
    """Merge a list of 4 per-direction (B, L, D) arrays (transpose of scan)."""
    (P1a, Q2a), (P1b, Q2b) = _line_selectors(H, W)
    f0 = ys[0] + _per_line_flip(ys[1], H)
    f1 = ys[2] + _per_line_flip(ys[3], H)
    y = _line_family_merge(f0, jnp.asarray(P1a), jnp.asarray(Q2a), H, W)
    y = y + _line_family_merge(f1, jnp.asarray(P1b), jnp.asarray(Q2b), H, W)
    return y.reshape(ys[0].shape[0], H * W, ys[0].shape[-1])
