"""Hierarchical H3/S2-style cell index, resolutions 0–15 (used: 5–12).

No h3/s2 library exists in this environment (SURVEY.md Appendix A), so
this is a from-scratch aperture-4 quadtree over an equirectangular
projection — the same *capability* the north-star names
(BASELINE.json:6 "batched H3/S2 cell encoding at resolutions 5-12"):
a 64-bit integer cell id with O(1) parent/children/neighbor arithmetic
and strict containment hierarchy.

Layout of a cell id (LongType-safe, always positive):

    bits 56..59 : resolution r (0..15)
    bits 0..2r-1: Morton (Z-order) interleave of (x, y)

where at resolution r the world is a 2^r × 2^r grid:
    x = floor((lon + 180) / 360 * 2^r)   (wraps at the anti-meridian)
    y = floor((lat +  90) / 180 * 2^r)   (clamped at the poles)

Morton interleaving gives the quadtree property: the parent at r-1 is
``morton >> 2``, children are ``morton*4 + {0,1,2,3}``, and ids that
share a prefix are spatially collocated — which is exactly what makes
cell-prefix partition pruning and the res-ladder rollup (SURVEY.md §2
A7/A8) cheap.

Two implementations with identical semantics (golden-tested against
each other):

- numpy (``encode_np`` etc.) — used inside pandas-UDF kernels and the
  single-threaded test oracle;
- Spark Column expressions (``cell_encode_col`` etc.) — pure JVM
  bit-twiddling inside whole-stage codegen, no Python worker at all.
  This is the hot path: at 10^12 rows the encode must not pay the
  JVM→Arrow→Python round-trip (SURVEY.md §7 "fuse UDF stages").
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

RES_BITS_SHIFT = 56
MIN_RES, MAX_RES = 0, 15

# Morton spread magic numbers (16 -> 32 bit even positions)
_MAGIC = (
    (16, np.uint64(0x0000FFFF0000FFFF)),
    (8, np.uint64(0x00FF00FF00FF00FF)),
    (4, np.uint64(0x0F0F0F0F0F0F0F0F)),
    (2, np.uint64(0x3333333333333333)),
    (1, np.uint64(0x5555555555555555)),
)


# ---------------------------------------------------------------------------
# numpy implementation
# ---------------------------------------------------------------------------


def _spread_np(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64)
    for shift, mask in _MAGIC:
        v = (v | (v << np.uint64(shift))) & mask
    return v


def _compact_np(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64) & _MAGIC[-1][1]
    v = (v | (v >> np.uint64(1))) & _MAGIC[-2][1]
    v = (v | (v >> np.uint64(2))) & _MAGIC[-3][1]
    v = (v | (v >> np.uint64(4))) & _MAGIC[-4][1]
    v = (v | (v >> np.uint64(8))) & _MAGIC[-5][1]
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v


def xy_np(lon: np.ndarray, lat: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Grid coordinates at ``res``. lon wraps into [-180,180); lat clamps."""
    n = 1 << res
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    lonw = ((lon + 180.0) % 360.0)  # wrap
    x = np.floor(lonw / 360.0 * n).astype(np.int64)
    x = np.clip(x, 0, n - 1)
    y = np.floor((lat + 90.0) / 180.0 * n).astype(np.int64)
    y = np.clip(y, 0, n - 1)
    return x, y


def encode_np(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """Vectorized cell id for arrays of lon/lat."""
    if not (MIN_RES <= res <= MAX_RES):
        raise ValueError(f"res must be in [{MIN_RES},{MAX_RES}], got {res}")
    x, y = xy_np(lon, lat, res)
    morton = _spread_np(x) | (_spread_np(y) << np.uint64(1))
    return (np.uint64(res) << np.uint64(RES_BITS_SHIFT) | morton).astype(np.int64)


def cell_res_np(cell: np.ndarray) -> np.ndarray:
    return (np.asarray(cell).astype(np.uint64) >> np.uint64(RES_BITS_SHIFT)).astype(
        np.int64
    )


def cell_xy_np(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    morton = np.asarray(cell).astype(np.uint64) & np.uint64((1 << RES_BITS_SHIFT) - 1)
    return (
        _compact_np(morton).astype(np.int64),
        _compact_np(morton >> np.uint64(1)).astype(np.int64),
    )


def parent_np(cell: np.ndarray, parent_res: int) -> np.ndarray:
    """Ancestor at ``parent_res`` — pure bit arithmetic, no trig."""
    cell = np.asarray(cell).astype(np.uint64)
    res = cell >> np.uint64(RES_BITS_SHIFT)
    if np.any(res < parent_res):
        raise ValueError("parent_res must be <= cell res")
    morton = cell & np.uint64((1 << RES_BITS_SHIFT) - 1)
    shift = (np.uint64(2) * (res - np.uint64(parent_res))).astype(np.uint64)
    return (
        np.uint64(parent_res) << np.uint64(RES_BITS_SHIFT) | (morton >> shift)
    ).astype(np.int64)


def children_np(cell: int) -> np.ndarray:
    """Four direct children (res+1)."""
    c = np.uint64(cell)
    res = int(c >> np.uint64(RES_BITS_SHIFT))
    if res >= MAX_RES:
        raise ValueError("cell already at max res")
    morton = c & np.uint64((1 << RES_BITS_SHIFT) - 1)
    kids = (morton << np.uint64(2)) + np.arange(4, dtype=np.uint64)
    return (np.uint64(res + 1) << np.uint64(RES_BITS_SHIFT) | kids).astype(np.int64)


def kring_np(cell: int, k: int = 1) -> np.ndarray:
    """All cells within Chebyshev distance k (the (2k+1)² block).
    x wraps across the anti-meridian; y rows beyond the poles are
    dropped. Includes the center cell. Sorted, deduped."""
    c = np.uint64(cell)
    res = int(c >> np.uint64(RES_BITS_SHIFT))
    n = 1 << res
    x, y = cell_xy_np(np.array([cell]))
    dx, dy = np.meshgrid(np.arange(-k, k + 1), np.arange(-k, k + 1))
    xs = (x[0] + dx.ravel()) % n
    ys = y[0] + dy.ravel()
    ok = (ys >= 0) & (ys < n)
    xs, ys = xs[ok], ys[ok]
    morton = _spread_np(xs) | (_spread_np(ys) << np.uint64(1))
    out = (np.uint64(res) << np.uint64(RES_BITS_SHIFT) | morton).astype(np.int64)
    return np.unique(out)


def cell_bounds_np(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(lon_min, lat_min, lon_max, lat_max) of each cell."""
    cell = np.asarray(cell)
    res = cell_res_np(cell)
    n = (np.int64(1) << res).astype(np.float64)
    x, y = cell_xy_np(cell)
    w, h = 360.0 / n, 180.0 / n
    lon0 = -180.0 + x * w
    lat0 = -90.0 + y * h
    return lon0, lat0, lon0 + w, lat0 + h


def cell_size_deg(res: int) -> tuple[float, float]:
    n = 1 << res
    return 360.0 / n, 180.0 / n


def cover_bbox_np(
    xmin: float, ymin: float, xmax: float, ymax: float, res: int
) -> np.ndarray:
    """Cell ids covering a bbox. A bbox with xmax > 180 is treated as
    crossing the anti-meridian (unwrapped coords); x wraps mod 2^r."""
    n = 1 << res
    x0 = int(np.floor((xmin + 180.0) / 360.0 * n))
    x1 = int(np.floor((np.nextafter(xmax, -np.inf) + 180.0) / 360.0 * n))
    y0 = int(np.floor((ymin + 90.0) / 180.0 * n))
    y1 = int(np.floor((np.nextafter(ymax, -np.inf) + 90.0) / 180.0 * n))
    y0, y1 = max(y0, 0), min(y1, n - 1)
    xs = np.arange(x0, x1 + 1, dtype=np.int64) % n
    ys = np.arange(y0, y1 + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys)
    morton = _spread_np(gx.ravel()) | (_spread_np(gy.ravel()) << np.uint64(1))
    return np.unique(
        (np.uint64(res) << np.uint64(RES_BITS_SHIFT) | morton).astype(np.int64)
    )


# ---------------------------------------------------------------------------
# Spark Column implementation (JVM-side, whole-stage-codegen friendly)
# ---------------------------------------------------------------------------


def _spread_col(v: Column) -> Column:
    for shift, mask in _MAGIC:
        v = (v.bitwiseOR(F.shiftleft(v, shift))).bitwiseAND(F.lit(int(mask)))
    return v


def xy_cols(lon: Column, lat: Column, res: int) -> tuple[Column, Column]:
    """Grid (x, y) Column expressions — twin of :func:`xy_np`."""
    n = 1 << res
    lonw = (lon + F.lit(180.0)) % F.lit(360.0)
    x = F.least(F.floor(lonw / F.lit(360.0) * F.lit(n)), F.lit(n - 1)).cast("long")
    x = F.greatest(x, F.lit(0))
    y = F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(n)).cast("long")
    y = F.greatest(F.least(y, F.lit(n - 1)), F.lit(0))
    return x, y


def cell_from_xy_col(x: Column, y: Column, res: int) -> Column:
    morton = _spread_col(x).bitwiseOR(F.shiftleft(_spread_col(y), 1))
    return F.lit(res << RES_BITS_SHIFT).bitwiseOR(morton)


def cell_encode_col(lon: Column, lat: Column, res: int) -> Column:
    """Cell id as a pure Column expression — identical semantics to
    :func:`encode_np` (golden-tested), but runs inside whole-stage
    codegen: the 10^12-row hot path never leaves the JVM."""
    x, y = xy_cols(lon, lat, res)
    return cell_from_xy_col(x, y, res).alias(f"cell_r{res}")


def cell_parent_col(cell: Column, child_res: int, parent_res: int) -> Column:
    """Parent id via bit arithmetic (res known statically, as it always
    is in the tile rollup ladder)."""
    if parent_res > child_res:
        raise ValueError("parent_res must be <= child_res")
    morton = cell.bitwiseAND(F.lit((1 << RES_BITS_SHIFT) - 1))
    shifted = F.shiftright(morton, 2 * (child_res - parent_res))
    return F.lit(parent_res << RES_BITS_SHIFT).bitwiseOR(shifted)


def bbox_cover_ranges(
    lon0: float, lat0: float, lon1: float, lat1: float, res: int
) -> list[tuple[int, int]]:
    """Decompose a (closed) bbox into merged, sorted Morton-id ranges
    at ``res`` — the classic Z-order range decomposition: quadtree
    descent emits each fully-contained cell as one contiguous
    descendant range, boundary cells recurse down to ``res``. The
    union of ranges covers every res-``res`` cell whose bounds
    intersect the bbox (conservative superset — callers refine with
    the exact lon/lat predicate). No anti-meridian wrap: callers
    split a wrapping bbox into two first.

    Driver-side only (the bbox is a query literal): the output feeds
    `cell BETWEEN lo AND hi` predicates that Spark pushes into the
    parquet scan when the table is Z-order clustered
    (io.cluster_write), turning a full-table scan into
    O(matching row groups)."""
    if lon0 > lon1 or lat0 > lat1:
        raise ValueError("bbox min must be <= max (split wrapping boxes first)")
    raw: list[tuple[int, int]] = []

    def rec(x: int, y: int, p: int) -> None:
        n = 1 << p
        w, h = 360.0 / n, 180.0 / n
        clon0, clat0 = -180.0 + x * w, -90.0 + y * h
        clon1, clat1 = clon0 + w, clat0 + h
        if clon0 > lon1 or clon1 < lon0 or clat0 > lat1 or clat1 < lat0:
            return
        inside = lon0 <= clon0 and clon1 <= lon1 and lat0 <= clat0 and clat1 <= lat1
        if inside or p == res:
            m = int(_spread_np(np.array([x], dtype=np.uint64))[0]) | (
                int(_spread_np(np.array([y], dtype=np.uint64))[0]) << 1
            )
            shift = 2 * (res - p)
            raw.append((m << shift, ((m + 1) << shift) - 1))
            return
        for dx in (0, 1):
            for dy in (0, 1):
                rec(2 * x + dx, 2 * y + dy, p + 1)

    rec(0, 0, 0)
    raw.sort()
    merged: list[list[int]] = []
    for lo, hi in raw:
        if merged and lo == merged[-1][1] + 1:
            merged[-1][1] = hi
        else:
            merged.append([lo, hi])
    base = res << RES_BITS_SHIFT
    return [(base | lo, base | hi) for lo, hi in merged]
