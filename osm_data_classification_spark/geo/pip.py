"""Ray-casting point-in-polygon over a packed multipolygon index.

The north-star (BASELINE.json:6) calls for "ray-casting
point-in-polygon joins against OSM boundary multipolygons broadcast as
packed Shapely STRtree indexes". Shapely is absent here (SURVEY.md
Appendix A), so the packed index is built directly: all ring
coordinates of all boundaries live in two flat float64 arrays plus
offset tables — one pickle-able object, broadcast once per job,
rebuilt zero-copy in every Python worker. The coarse spatial filter
(the STRtree role) is done *relationally*: each boundary's bbox is
covered with grid cells (geo/cells.py) and the candidate set comes
from an equi-join on cell id — Catalyst broadcasts it, so candidate
generation is a JVM-side broadcast-hash join, and only the exact
refine runs in (vectorized) Python.

Semantics (documented policy, SURVEY.md §7 M2):

- even-odd (crossing-number) rule; holes are just rings — a point
  inside a hole crosses one extra boundary and flips back to outside;
- the crossing test is the half-open rule ``(y1 > py) != (y2 > py)``
  with ``px < x_edge(py)``: every point gets a deterministic verdict,
  shared edges between adjacent polygons never double-count, and a
  point exactly on a horizontal edge takes the verdict of the cell
  below — the classic simulation-of-simplicity policy;
- anti-meridian: rings may be stored in *unwrapped* longitudes (e.g.
  179 … 181). Points are tested at both ``lon`` and ``lon + 360``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .cells import cover_bbox_np  # noqa: F401 — single-bbox twin, kept public


@dataclass
class PackedPolygons:
    """Flat-array multipolygon set (the broadcastable 'packed STRtree').

    ``xs``/``ys``: concatenated ring coordinates (each ring closed:
    first == last). ``ring_start``: len nr+1 offsets into xs/ys.
    ``ring_boundary``: len nr, index into ``boundary_id``.
    ``bbox``: (nb, 4) per-boundary (xmin, ymin, xmax, ymax) in the
    same (possibly unwrapped) coordinate frame as the rings.
    """

    boundary_id: np.ndarray  # int64[nb]
    bbox: np.ndarray  # float64[nb, 4]
    ring_start: np.ndarray  # int64[nr + 1]
    ring_boundary: np.ndarray  # int64[nr]
    xs: np.ndarray  # float64[npts]
    ys: np.ndarray  # float64[npts]

    @property
    def n_boundaries(self) -> int:
        return len(self.boundary_id)

    def index_of(self, bids: np.ndarray) -> np.ndarray:
        """Map external boundary_id values to internal row indexes.
        The id sort lives in ``_ensure_index`` (built once per worker)
        so each Arrow batch pays only the O(k log nb) searchsorted,
        not a fresh O(nb log nb) argsort (VERDICT r2 nit 1)."""
        self._ensure_index()
        pos = np.searchsorted(self._ids_sorted, bids)
        return self._id_order[pos]

    @classmethod
    def from_rows(cls, rows) -> "PackedPolygons":
        """Build from an iterable of (boundary_id, part, ring, xs, ys)
        rows — the boundary-table shape from FIXTURES.md §2.2."""
        ids, ring_bnd, ring_start, xs_all, ys_all = [], [], [0], [], []
        id_index: dict[int, int] = {}
        for bid, _part, _ring, xs, ys in rows:
            if bid not in id_index:
                id_index[bid] = len(ids)
                ids.append(bid)
            ring_bnd.append(id_index[bid])
            xs_all.append(np.asarray(xs, dtype=np.float64))
            ys_all.append(np.asarray(ys, dtype=np.float64))
            ring_start.append(ring_start[-1] + len(xs))
        xs_cat = np.concatenate(xs_all) if xs_all else np.empty(0)
        ys_cat = np.concatenate(ys_all) if ys_all else np.empty(0)
        nb = len(ids)
        bbox = np.empty((nb, 4), dtype=np.float64)
        bbox[:, 0] = bbox[:, 1] = np.inf
        bbox[:, 2] = bbox[:, 3] = -np.inf
        ring_start_a = np.array(ring_start, dtype=np.int64)
        ring_bnd_a = np.array(ring_bnd, dtype=np.int64)
        for r, b in enumerate(ring_bnd_a):
            s, e = ring_start_a[r], ring_start_a[r + 1]
            bbox[b, 0] = min(bbox[b, 0], xs_cat[s:e].min())
            bbox[b, 1] = min(bbox[b, 1], ys_cat[s:e].min())
            bbox[b, 2] = max(bbox[b, 2], xs_cat[s:e].max())
            bbox[b, 3] = max(bbox[b, 3], ys_cat[s:e].max())
        return cls(
            boundary_id=np.array(ids, dtype=np.int64),
            bbox=bbox,
            ring_start=ring_start_a,
            ring_boundary=ring_bnd_a,
            xs=xs_cat,
            ys=ys_cat,
        )

    # -- coarse filter ------------------------------------------------------

    def cell_cover(self, res: int) -> tuple[np.ndarray, np.ndarray]:
        """(cell_id, boundary_id) pairs covering each boundary's bbox at
        ``res`` — the broadcast side of the candidate equi-join. A bbox
        cover is a superset of the true polygon cover; the exact
        ray-cast refine removes false candidates, so correctness never
        depends on cover tightness (only candidate count does).

        Fully vectorized over ALL boundaries (no per-boundary Python
        loop): the one-time build stays sub-second at 10^5 boundaries.
        The x-extent is capped at the grid width, which both bounds the
        cover and makes each boundary's wrapped x values distinct — no
        per-boundary dedup needed (matching cover_bbox_np's unique)."""
        from .cells import RES_BITS_SHIFT, _spread_np

        nb = self.n_boundaries
        if nb == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        n = 1 << res
        bx = self.bbox
        x0 = np.floor((bx[:, 0] + 180.0) / 360.0 * n).astype(np.int64)
        x1 = np.floor(
            (np.nextafter(bx[:, 2], -np.inf) + 180.0) / 360.0 * n
        ).astype(np.int64)
        y0 = np.maximum(
            np.floor((bx[:, 1] + 90.0) / 180.0 * n).astype(np.int64), 0
        )
        y1 = np.minimum(
            np.floor(
                (np.nextafter(bx[:, 3], -np.inf) + 90.0) / 180.0 * n
            ).astype(np.int64),
            n - 1,
        )
        # Clamp extents at zero: a bbox lying entirely outside the
        # [-90, 90] latitude band yields y1 < y0 after the min/max
        # clamps above (and a degenerate x-extent can do the same),
        # which must contribute an EMPTY cover — not negative counts
        # that make np.repeat raise (ADVICE r2).
        nx = np.maximum(np.minimum(x1 - x0 + 1, n), 0)
        ny = np.maximum(y1 - y0 + 1, 0)
        counts = nx * ny
        total = int(counts.sum())
        if total == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        b_rep = np.repeat(np.arange(nb), counts)
        starts = np.r_[0, np.cumsum(counts)[:-1]]
        within = np.arange(total) - np.repeat(starts, counts)
        xi = (x0[b_rep] + within // ny[b_rep]) % n
        yi = y0[b_rep] + within % ny[b_rep]
        morton = _spread_np(xi) | (_spread_np(yi) << np.uint64(1))
        cells = (np.uint64(res) << np.uint64(RES_BITS_SHIFT) | morton).astype(
            np.int64
        )
        return cells, self.boundary_id[b_rep]

    # -- per-worker refine index -------------------------------------------

    def _ensure_index(self) -> None:
        """Lazily build (once per worker, vectorized) the structures
        that make the refine O(candidate rings) instead of
        O(all boundaries × all rings):

        * ``_rings_by_b`` + ``_ring_off``: CSR-style boundary→rings
          lookup, replacing the ``ring_boundary == b`` full scan that
          made each batch linear in the TOTAL ring count;
        * ``_ring_bbox``: per-ring bboxes (``np.minimum.reduceat``
          over the packed coordinate arrays — no Python loop), the
          bbox-grid prefilter that skips rings which cannot contribute
          a crossing for any point in the batch.
        """
        if getattr(self, "_rings_by_b", None) is not None:
            return
        self._id_order = np.argsort(self.boundary_id, kind="stable")
        self._ids_sorted = self.boundary_id[self._id_order]
        order = np.argsort(self.ring_boundary, kind="stable")
        counts = np.bincount(self.ring_boundary, minlength=self.n_boundaries)
        self._ring_off = np.r_[0, np.cumsum(counts)]
        self._rings_by_b = order
        if len(self.xs):
            seg = self.ring_start[:-1]
            self._ring_bbox = np.column_stack(
                [
                    np.minimum.reduceat(self.xs, seg),
                    np.minimum.reduceat(self.ys, seg),
                    np.maximum.reduceat(self.xs, seg),
                    np.maximum.reduceat(self.ys, seg),
                ]
            )
        else:
            self._ring_bbox = np.empty((0, 4), dtype=np.float64)

    # -- exact refine -------------------------------------------------------

    def contains(self, bidx: np.ndarray, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Vectorized even-odd test for (boundary-index, point) pairs.

        Groups pairs by boundary so each boundary's segments are tested
        against all its candidate points in one (npts × nsegs) numpy
        broadcast — no Python-per-row anywhere (BASELINE.json:15).
        """
        self._ensure_index()
        bidx = np.asarray(bidx, dtype=np.int64)
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        out = np.zeros(len(bidx), dtype=bool)
        if len(bidx) == 0:
            return out
        order = np.argsort(bidx, kind="stable")
        sorted_b = bidx[order]
        starts = np.flatnonzero(np.r_[True, sorted_b[1:] != sorted_b[:-1]])
        ends = np.r_[starts[1:], len(sorted_b)]
        for s, e in zip(starts, ends):
            b = sorted_b[s]
            sel = order[s:e]
            out[sel] = self._contains_one(int(b), px[sel], py[sel])
        return out

    def _contains_one(self, b: int, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        # unwrapped-frame handling: test the point and its +360 image
        inside = self._raycast(b, px, py)
        if self.bbox[b, 2] > 180.0:  # boundary stored unwrapped
            inside |= self._raycast(b, px + 360.0, py)
        return inside

    def _raycast(self, b: int, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        crossings = np.zeros(len(px), dtype=np.int64)
        rings = self._rings_by_b[self._ring_off[b] : self._ring_off[b + 1]]
        for r in rings:
            # ring-bbox prefilter: a ring can only contribute a
            # crossing when the point's py is inside the ring's
            # y-range and px is left of its xmax — outside either,
            # `cond` / `px < xint` below are identically false, so
            # skipping is exact (not an approximation)
            rymin, rymax = self._ring_bbox[r, 1], self._ring_bbox[r, 3]
            rxmax = self._ring_bbox[r, 2]
            m = (py >= rymin) & (py <= rymax) & (px < rxmax)
            if not m.any():
                continue
            mpx, mpy = px[m], py[m]
            s, e = self.ring_start[r], self.ring_start[r + 1]
            x1, y1 = self.xs[s : e - 1], self.ys[s : e - 1]
            x2, y2 = self.xs[s + 1 : e], self.ys[s + 1 : e]
            # (npts, nsegs) broadcast; half-open vertical rule
            cond = (y1[None, :] > mpy[:, None]) != (y2[None, :] > mpy[:, None])
            with np.errstate(divide="ignore", invalid="ignore"):
                t = (mpy[:, None] - y1[None, :]) / (y2[None, :] - y1[None, :])
                xint = x1[None, :] + t * (x2[None, :] - x1[None, :])
            hit = cond & (mpx[:, None] < xint)
            crossings[m] += hit.sum(axis=1)
        return (crossings & 1).astype(bool)
