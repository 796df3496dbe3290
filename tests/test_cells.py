"""Cell-index unit + property tests (model: ids.rs unit tests + strings.rs
proptest of the reference, re-aimed at our index layer)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from osmflat_rs_spark.functions import cells
from osmflat_rs_spark.functions.geo import COORD_SCALE
from osmflat_rs_spark.functions.pip import points_in_polygon, convex_contains


LAT = st.integers(min_value=-90 * COORD_SCALE, max_value=90 * COORD_SCALE - 1)
LON = st.integers(min_value=-180 * COORD_SCALE, max_value=180 * COORD_SCALE - 1)


@given(LAT, LON, st.integers(min_value=0, max_value=30))
@settings(max_examples=200, deadline=None)
def test_cell_roundtrip_np(lat, lon, res):
    c = cells.cell_id_np(np.array([lat]), np.array([lon]), res)
    assert cells.cell_res(int(c[0])) == res
    ix, iy = cells.cell_to_grid_np(c, res)
    ex, ey = cells.grid_coords_np(np.array([lat]), np.array([lon]), res)
    assert int(ix[0]) == int(ex[0]) and int(iy[0]) == int(ey[0])


@given(LAT, LON, st.integers(min_value=1, max_value=30))
@settings(max_examples=200, deadline=None)
def test_parent_is_prefix(lat, lon, res):
    c = int(cells.cell_id_np(np.array([lat]), np.array([lon]), res)[0])
    p = int(cells.cell_id_np(np.array([lat]), np.array([lon]), res - 1)[0])
    assert c >> 2 == p  # parent = shift — the hierarchical invariant


def test_cell_expr_matches_np(spark):
    rng = np.random.RandomState(7)
    lats = rng.randint(-90 * COORD_SCALE, 90 * COORD_SCALE, size=500).astype(np.int64)
    lons = rng.randint(-180 * COORD_SCALE, 180 * COORD_SCALE, size=500).astype(np.int64)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(lats, lons)], schema="lat long, lon long"
    )
    for res in (0, 5, 14, 30):
        from pyspark.sql import functions as F

        got = np.array(
            [r[0] for r in df.select(cells.cell_id_expr(F.col("lat"), F.col("lon"), res)).collect()]
        )
        want = cells.cell_id_np(lats, lons, res)
        assert (got == want).all(), f"res={res}"


@given(st.lists(st.tuples(LON, LAT), min_size=3, max_size=8), LAT, LON)
@settings(max_examples=100, deadline=None)
def test_cover_no_false_negatives(ring, plat, plon):
    """Any point inside the polygon must fall in a covered cell — the
    correctness guarantee of the two-phase join's coarse phase."""
    xs = np.array([v[0] // 1000 for v in ring], dtype=np.int64)  # keep polys small-ish
    ys = np.array([v[1] // 1000 for v in ring], dtype=np.int64)
    px = np.array([plon // 1000], dtype=np.int64)
    py = np.array([plat // 1000], dtype=np.int64)
    if not points_in_polygon(px, py, xs, ys)[0]:
        return
    res = 12
    cover = set(int(c) for c in cells.polygon_cover(xs, ys, res))
    pc = int(cells.cell_id_np(py, px, res)[0])
    assert pc in cover


def test_pip_square():
    xs = np.array([0, 10, 10, 0], dtype=np.int64)
    ys = np.array([0, 0, 10, 10], dtype=np.int64)
    px = np.array([5, 0, 10, 11, -1, 5], dtype=np.int64)
    py = np.array([5, 0, 10, 5, 5, 10], dtype=np.int64)
    got = points_in_polygon(px, py, xs, ys)
    assert got.tolist() == [True, True, True, False, False, True]
    assert convex_contains(px, py, xs, ys).tolist() == got.tolist()


@given(st.lists(st.tuples(LON, LAT), min_size=3, max_size=7), st.lists(st.tuples(LON, LAT), min_size=1, max_size=20))
@settings(max_examples=100, deadline=None)
def test_pip_matches_scalar_oracle(ring, pts):
    from osmflat_rs_spark.oracle import pip_scalar

    xs = np.array([v[0] // 1000 for v in ring], dtype=np.int64)
    ys = np.array([v[1] // 1000 for v in ring], dtype=np.int64)
    px = np.array([p[0] // 1000 for p in pts], dtype=np.int64)
    py = np.array([p[1] // 1000 for p in pts], dtype=np.int64)
    got = points_in_polygon(px, py, xs, ys)
    want = [pip_scalar(int(a), int(b), list(zip(xs.tolist(), ys.tolist()))) for a, b in zip(px, py)]
    assert got.tolist() == want
