"""A literal-defined polygon set for the exact-PIP driver oracle.

The main boundary fixture (sources/boundaries.py) uses seeded-numpy
jitter, which SQL cannot reproduce — so the ray-cast kernel itself was
only pytest-gated. This module defines a second polygon set whose
vertices come from INTEGER/DYADIC arithmetic only (rectangles,
diamonds, concave L-shapes, one ring-hole; five anchored on the
mega-cell hot spots). The same Python floats feed both sides:

- Spark: PackedPolygons.from_rows → the standard pip_join path
  (broadcast cell-cover join + numpy ray-cast refine);
- DuckDB: the segments inlined as a VALUES literal + the identical
  half-open crossing rule in SQL.

Both engines evaluate the same IEEE expressions on the same literals,
so the (url, warc_ts, boundary_id) assignment set value-hashes equal —
a full driver gate on the ray-cast join itself.
"""

from __future__ import annotations

# integer-rounded anchors of the five mega place tokens (pages.py)
_MEGA_ANCHORS = ((-90, 30), (0, 0), (90, -30), (-135, 60), (140, -60))


def polygon_rings() -> list[tuple[int, list[tuple[float, float]]]]:
    """(bid, closed ring) list; bid 5 gets a second (hole) ring."""
    out: list[tuple[int, list[tuple[float, float]]]] = []
    for b in range(16):
        cx = float(-160 + (b * 37) % 320)
        cy = float(-60 + (b * 23) % 120)
        w = 2.0 + (b % 5)
        h = 1.5 + (b % 3)
        shape = b % 3
        if shape == 0:  # rectangle
            ring = [
                (cx - w, cy - h), (cx + w, cy - h), (cx + w, cy + h),
                (cx - w, cy + h), (cx - w, cy - h),
            ]
        elif shape == 1:  # diamond
            ring = [
                (cx - w, cy), (cx, cy - h), (cx + w, cy), (cx, cy + h),
                (cx - w, cy),
            ]
        else:  # concave L
            ring = [
                (cx - w, cy - h), (cx + w, cy - h), (cx + w, cy), (cx, cy),
                (cx, cy + h), (cx - w, cy + h), (cx - w, cy - h),
            ]
        out.append((b, ring))
        if b == 5:  # square hole inside
            hw, hh = w / 2, h / 2
            out.append(
                (
                    b,
                    [
                        (cx - hw, cy - hh), (cx + hw, cy - hh),
                        (cx + hw, cy + hh), (cx - hw, cy + hh),
                        (cx - hw, cy - hh),
                    ],
                )
            )
    for k, (ax, ay) in enumerate(_MEGA_ANCHORS):  # guarantee hot-spot hits
        b = 16 + k
        w, h = 3.0, 2.5
        out.append(
            (
                b,
                [
                    (ax - w, ay - h), (ax + w, ay - h), (ax + w, ay + h),
                    (ax - w, ay + h), (ax - w, ay - h),
                ],
            )
        )
    # bid 21: anti-meridian polygon stored UNWRAPPED (lon 175→185), so
    # the ±360-image path (geo/pip.py::_contains_one) gets a hard
    # driver grade, not only tests/test_pip.py (round-2 VERDICT #3).
    # Tall (lat ±75) so the pseudo-uniform tail population yields hits
    # on both sides of the date line at driver scale.
    out.append(
        (
            21,
            [
                (175.0, -75.0), (185.0, -75.0), (185.0, 75.0),
                (175.0, 75.0), (175.0, -75.0),
            ],
        )
    )
    return out


def boundary_rows() -> list[tuple]:
    """(bid, part, ring, xs, ys) rows for PackedPolygons.from_rows."""
    rows = []
    ring_idx: dict[int, int] = {}
    for bid, ring in polygon_rings():
        r = ring_idx.get(bid, 0)
        ring_idx[bid] = r + 1
        rows.append((bid, 0, r, [p[0] for p in ring], [p[1] for p in ring]))
    return rows


def segments_values_sql() -> str:
    """VALUES literal of every ring segment: (bid, x1, y1, x2, y2)."""
    vals = []
    for bid, ring in polygon_rings():
        for (x1, y1), (x2, y2) in zip(ring[:-1], ring[1:]):
            vals.append(f"({bid}, {x1!r}, {y1!r}, {x2!r}, {y2!r})")
    return ",\n               ".join(vals)


def pip_exact_sql(pages_sql: str) -> str:
    """The full oracle query: pages (re-synthesized) × literal segments,
    half-open crossing rule identical to geo/pip.py::_raycast."""
    return f"""
    WITH {pages_sql},
    segs(bid, x1, y1, x2, y2) AS (
        VALUES {segments_values_sql()}
    ),
    bbox AS (
        SELECT bid,
               min(least(x1, x2)) AS xmin, min(least(y1, y2)) AS ymin,
               max(greatest(x1, x2)) AS xmax, max(greatest(y1, y2)) AS ymax
        FROM segs GROUP BY bid
    ),
    shifts(dx) AS (VALUES (0.0), (360.0)),
    cand AS (
        -- a boundary stored UNWRAPPED (xmax > 180) must also test each
        -- point's +360 image — the exact mirror of the Spark refine's
        -- image rule (geo/pip.py::_contains_one). Images outside the
        -- bbox have even parity by construction, so filtering them
        -- here is exact, not an approximation.
        SELECT p.url, p.warc_ts, p.lon + sh.dx AS lon, p.lat, b.bid
        FROM pages p CROSS JOIN shifts sh
        JOIN bbox b
          ON (sh.dx = 0 OR b.xmax > 180)
         AND p.lon + sh.dx >= b.xmin AND p.lon + sh.dx <= b.xmax
         AND p.lat >= b.ymin AND p.lat <= b.ymax
    ),
    crossings AS (
        SELECT c.url, c.warc_ts, c.bid, c.lon,
               sum(CASE WHEN (s.y1 > c.lat) <> (s.y2 > c.lat)
                         AND c.lon < s.x1 + (c.lat - s.y1) * (s.x2 - s.x1)
                                             / (s.y2 - s.y1)
                        THEN 1 ELSE 0 END) AS n
        FROM cand c JOIN segs s ON s.bid = c.bid
        GROUP BY c.url, c.warc_ts, c.bid, c.lon
    )
    SELECT DISTINCT url, warc_ts, bid AS boundary_id
    FROM crossings WHERE n % 2 = 1
    """


def ring_vertices_values_sql() -> str:
    """VALUES literal of every ring vertex: (bid, rseq, i, x, y) —
    feeds the shoelace-area oracle (operators/geo_queries.py)."""
    vals: list[str] = []
    ring_idx: dict[int, int] = {}
    for bid, ring in polygon_rings():
        r = ring_idx.get(bid, 0)
        ring_idx[bid] = r + 1
        for i, (x, y) in enumerate(ring):
            vals.append(f"({bid}, {r}, {i}, {x!r}, {y!r})")
    return ",\n               ".join(vals)
