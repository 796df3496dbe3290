"""Tiling golden tests: Bresenham-family raster assignment and z14
web-mercator tile assignment vs the model oracle."""

from osmflat_rs_spark import oracle
from osmflat_rs_spark import queries as q
from osmflat_rs_spark.operators.tiling import raster_assign, tile_assign
from tests.util import assert_frames_equal


def test_dda_line_spec():
    # endpoints exact, 8-connected, symmetric
    assert oracle.dda_line(0, 0, 0, 0) == [(0, 0)]
    assert oracle.dda_line(0, 0, 3, 0) == [(0, 0), (1, 0), (2, 0), (3, 0)]
    pts = oracle.dda_line(0, 0, 5, 2)
    assert pts[0] == (0, 0) and pts[-1] == (5, 2) and len(pts) == 6


def test_raster_assign(tables, model):
    bb = q.bbox(tables).collect()[0]
    coords = q.road_coords(tables)
    got = raster_assign(coords, (bb["min_lat"], bb["max_lat"], bb["min_lon"], bb["max_lon"]))
    want = oracle.q_raster_assign(model)
    assert len(want) > 0
    assert_frames_equal(got, want, ["way_idx", "x", "y"])


def test_tile_assign(tables, model):
    got = tile_assign(q.road_coords(tables))
    want = oracle.q_tile_assign(model)
    assert len(want) > 0
    assert_frames_equal(got, want, ["way_idx", "zoom", "tile_x", "tile_y"])


def test_tile_assign_segments_equals_window_form(tables):
    """The in-row segments path (ways_geo zip — zero shuffle before the
    distinct) must produce exactly the window-form tile set."""
    from osmflat_rs_spark import queries as q
    from osmflat_rs_spark.operators.tiling import tile_assign, tile_assign_segments

    cols = ["way_idx", "zoom", "tile_x", "tile_y"]
    old = tile_assign(q.road_coords({"nodes": tables["nodes"], "ways": tables["ways"]}), jvm_tiles=True)
    new = tile_assign_segments(q.road_segments(tables), jvm_tiles=True)
    from tests.util import normalize

    assert normalize(new, cols) == normalize(old, cols)
    # and the vectorized-UDF tile encoder agrees on the fixture window
    new_udf = tile_assign_segments(q.road_segments(tables), jvm_tiles=False)
    assert normalize(new_udf, cols) == normalize(old, cols)


def test_road_coords_inrow_equals_join_form(tables):
    from osmflat_rs_spark import queries as q
    from tests.util import normalize

    cols = ["way_idx", "pos", "lat", "lon"]
    fast = q.road_coords(tables)  # ways_geo in-row path
    slow = q.road_coords({"nodes": tables["nodes"], "ways": tables["ways"]})
    assert normalize(fast, cols) == normalize(slow, cols)


def test_tile_segments_plan_has_no_window_one_shuffle(spark, tables):
    """Scale assertion for the tile OPERATOR (segments → tiles): no
    Window anywhere, and the only Exchange is the distinct agg — one
    codegen stage feeds one shuffle. (Upstream ways resolution is its own
    ingest stage; here the input stands materialized.)"""
    from osmflat_rs_spark.operators.tiling import tile_assign_segments

    segs = spark.createDataFrame(
        [(1, 525000000, 133000000, 525100000, 133400000)],
        schema="way_idx long, lat long, lon long, lat2 long, lon2 long",
    )
    plan = (
        tile_assign_segments(segs, jvm_tiles=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan, plan[:3000]
    n_exchange = plan.count("Exchange")
    assert n_exchange <= 1, f"expected 1 Exchange (distinct agg), got {n_exchange}:\n{plan[:3000]}"
    # and road_segments itself is pure in-row: no Window, no join beyond
    # the ingest-owned resolution chain
    from osmflat_rs_spark import queries as q

    seg_plan = q.road_segments(tables)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in seg_plan
