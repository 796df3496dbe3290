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
