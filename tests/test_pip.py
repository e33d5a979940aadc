"""L1 kernel tests for ray-cast PIP vs brute-force / known geometry."""

import numpy as np

from osm_data_classification_spark.geo.pip import PackedPolygons


def square(bid, x0, y0, x1, y1, reverse=False):
    xs = [x0, x1, x1, x0, x0]
    ys = [y0, y0, y1, y1, y0]
    if reverse:
        xs, ys = xs[::-1], ys[::-1]
    return (bid, 0, 0, xs, ys)


def test_simple_square():
    p = PackedPolygons.from_rows([square(1, 0, 0, 10, 10)])
    px = np.array([5.0, -1.0, 10.5, 0.5, 9.99])
    py = np.array([5.0, 5.0, 5.0, 0.5, 9.99])
    got = p.contains(np.zeros(5, dtype=np.int64), px, py)
    assert got.tolist() == [True, False, False, True, True]


def test_orientation_irrelevant():
    cw = PackedPolygons.from_rows([square(1, 0, 0, 10, 10)])
    ccw = PackedPolygons.from_rows([square(1, 0, 0, 10, 10, reverse=True)])
    px = np.random.default_rng(42).uniform(-2, 12, 200)
    py = np.random.default_rng(43).uniform(-2, 12, 200)
    b = np.zeros(200, dtype=np.int64)
    assert np.array_equal(cw.contains(b, px, py), ccw.contains(b, px, py))


def test_hole_flips_parity():
    outer = square(1, 0, 0, 10, 10)
    hole = (1, 0, 1, [4, 6, 6, 4, 4], [4, 4, 6, 6, 4])
    p = PackedPolygons.from_rows([outer, hole])
    b = np.zeros(3, dtype=np.int64)
    got = p.contains(b, np.array([5.0, 3.0, 6.5]), np.array([5.0, 3.0, 6.5]))
    assert got.tolist() == [False, True, True]  # in hole / in solid / in solid


def test_multipart():
    p = PackedPolygons.from_rows(
        [square(1, 0, 0, 2, 2), (1, 1, 0, [10, 12, 12, 10, 10], [0, 0, 2, 2, 0])]
    )
    b = np.zeros(3, dtype=np.int64)
    got = p.contains(b, np.array([1.0, 11.0, 5.0]), np.array([1.0, 1.0, 1.0]))
    assert got.tolist() == [True, True, False]


def test_concave():
    # L-shape: big square minus top-right quadrant (as concave outline)
    xs = [0, 10, 10, 5, 5, 0, 0]
    ys = [0, 0, 5, 5, 10, 10, 0]
    p = PackedPolygons.from_rows([(1, 0, 0, xs, ys)])
    b = np.zeros(4, dtype=np.int64)
    got = p.contains(
        b, np.array([2.0, 7.0, 7.0, 2.0]), np.array([2.0, 2.0, 7.0, 7.0])
    )
    assert got.tolist() == [True, True, False, True]


def test_antimeridian_unwrapped():
    # ring spanning 179..181 (unwrapped); a point at lon=-179.5 is inside
    p = PackedPolygons.from_rows(
        [(1, 0, 0, [179, 181, 181, 179, 179], [0, 0, 2, 2, 0])]
    )
    b = np.zeros(3, dtype=np.int64)
    got = p.contains(
        b, np.array([-179.5, 179.5, 178.0]), np.array([1.0, 1.0, 1.0])
    )
    assert got.tolist() == [True, True, False]


def test_jitter_stability_property():
    """Property: verdict is stable under 1e-12 jitter away from edges
    (SURVEY.md §5.2 property tests)."""
    rng = np.random.default_rng(7)
    n = 12
    ang = np.linspace(0, 2 * np.pi, n + 1)
    xs = (5 + 3 * np.cos(ang)).tolist()
    ys = (5 + 3 * np.sin(ang)).tolist()
    p = PackedPolygons.from_rows([(1, 0, 0, xs, ys)])
    px = rng.uniform(0, 10, 500)
    py = rng.uniform(0, 10, 500)
    b = np.zeros(500, dtype=np.int64)
    base = p.contains(b, px, py)
    jit = p.contains(b, px + 1e-12, py + 1e-12)
    assert (base == jit).mean() > 0.999


def test_cell_cover_contains_inside_points():
    from osm_data_classification_spark.geo.cells import encode_np

    p = PackedPolygons.from_rows([square(7, 10, 40, 12, 42)])
    cover_cells, cover_bids = p.cell_cover(8)
    assert set(cover_bids) == {7}
    pts_lon = np.linspace(10.01, 11.99, 30)
    pts_lat = np.linspace(40.01, 41.99, 30)
    enc = encode_np(pts_lon, pts_lat, 8)
    assert np.all(np.isin(enc, cover_cells))


def test_cell_cover_vectorized_matches_per_bbox_oracle():
    """The batched cell_cover must equal the per-boundary
    cover_bbox_np loop exactly — pairs, no duplicates — including the
    antimeridian (unwrapped-lon) boundary."""
    from osm_data_classification_spark.geo.cells import cover_bbox_np
    from osm_data_classification_spark.sources.boundaries import packed_boundaries

    pk = packed_boundaries(200)
    for res in (5, 8):
        cells, bids = pk.cell_cover(res)
        exp = set()
        for b in range(pk.n_boundaries):
            for c in cover_bbox_np(*pk.bbox[b], res):
                exp.add((int(c), int(pk.boundary_id[b])))
        got = set(zip(cells.tolist(), bids.tolist()))
        assert got == exp
        assert len(cells) == len(got)  # no duplicate pairs emitted

def test_cell_cover_out_of_range_latitude_is_empty_not_crash():
    """A boundary lying entirely outside the [-90, 90] latitude band
    must contribute an EMPTY cover (the per-bbox oracle's behavior),
    not negative repeat counts that crash the vectorized build
    (round-2 ADVICE, low). Mixed with an in-range boundary, only the
    in-range one survives."""
    bad_hi = square(1, 10, 95, 12, 99)    # entirely above 90
    bad_lo = square(2, 10, -99, 12, -95)  # entirely below -90
    good = square(3, 10, 40, 12, 42)
    for rows in ([bad_hi], [bad_lo], [bad_hi, good, bad_lo]):
        p = PackedPolygons.from_rows(rows)
        cells, bids = p.cell_cover(8)
        assert set(bids.tolist()) <= {3}
        assert (len(cells) > 0) == any(r[0] == 3 for r in rows)


def test_index_of_after_ensure_index_hoist():
    """index_of must keep mapping external ids to row indexes with the
    sort hoisted into _ensure_index (VERDICT r2 nit 1)."""
    p = PackedPolygons.from_rows(
        [square(30, 0, 0, 1, 1), square(10, 2, 2, 3, 3), square(20, 4, 4, 5, 5)]
    )
    got = p.index_of(np.array([10, 20, 30, 20], dtype=np.int64))
    assert [int(p.boundary_id[i]) for i in got] == [10, 20, 30, 20]


def test_polygon_area_matches_python_shoelace(spark):
    """geo_polygon_area vs an independent pure-Python shoelace over
    the same literal rings; every outer ring must be CCW (positive)
    and bid 5's hole ring must be present as ring_seq 1."""
    from osm_data_classification_spark.geo.pip_sql import polygon_rings
    from osm_data_classification_spark.operators.geo_queries import (
        geo_polygon_area,
    )

    got = {
        (r["boundary_id"], r["ring_seq"]): (
            r["n_vertices"], r["area2_x16"], r["ccw"]
        )
        for r in geo_polygon_area(spark, "unused").collect()
    }
    ring_idx: dict[int, int] = {}
    seen = set()
    for bid, ring in polygon_rings():
        rseq = ring_idx.get(bid, 0)
        ring_idx[bid] = rseq + 1
        seen.add((bid, rseq))
        s = sum(
            x1 * y2 - x2 * y1
            for (x1, y1), (x2, y2) in zip(ring[:-1], ring[1:])
        )
        want = (len(ring), round(s * 16), s > 0)
        assert got[(bid, rseq)] == want, (bid, rseq)
    assert set(got) == seen
    assert (5, 1) in got  # the hole ring
    assert all(v[2] for k, v in got.items() if k[1] == 0)  # outers CCW
