"""Polygon interior fill (cell rasterization) vs the brute-force model.

The model enumerates every bbox cell, computes the exact integer center
with plain Python ints, and asks ``points_in_rings`` directly — no
shared candidate-generation or join code with the operator under test.
"""

import numpy as np
import pytest

from osmflat_rs_spark.functions.pip import points_in_rings
from osmflat_rs_spark.operators.fill import polygon_fill_cells

LON_SPAN, LAT_SPAN = 3_600_000_000, 1_800_000_000

HEX = [
    (135_600_000, 525_000_000),
    (134_800_000, 525_692_800),
    (133_200_000, 525_692_800),
    (132_400_000, 525_000_000),
    (133_200_000, 524_307_200),
    (134_800_000, 524_307_200),
]
HOLE = [
    (134_400_000, 525_000_000),
    (134_000_000, 525_400_000),
    (133_600_000, 525_000_000),
    (134_000_000, 524_600_000),
]


def _quant(v, off, span, res):
    return max(0, min((1 << res) - 1, (v + off) * (1 << res) // span))


def _model_fill(rings_lonlat, res):
    """rings_lonlat: list of rings, each [(lon, lat), ...]."""
    lons = [lo for ring in rings_lonlat for lo, _ in ring]
    lats = [la for ring in rings_lonlat for _, la in ring]
    ix0, ix1 = _quant(min(lons), LON_SPAN // 2, LON_SPAN, res), _quant(max(lons), LON_SPAN // 2, LON_SPAN, res)
    iy0, iy1 = _quant(min(lats), LAT_SPAN // 2, LAT_SPAN, res), _quant(max(lats), LAT_SPAN // 2, LAT_SPAN, res)
    cells = []
    for ix in range(ix0, ix1 + 1):
        for iy in range(iy0, iy1 + 1):
            clon = (2 * ix + 1) * LON_SPAN // (1 << (res + 1)) - LON_SPAN // 2
            clat = (2 * iy + 1) * LAT_SPAN // (1 << (res + 1)) - LAT_SPAN // 2
            cells.append((ix, iy, clon, clat))
    if not cells:
        return set()
    arr = np.array(cells, dtype=np.int64)
    nr = [
        (np.array([lo for lo, _ in ring], dtype=np.int64), np.array([la for _, la in ring], dtype=np.int64))
        for ring in rings_lonlat
    ]
    mask = points_in_rings(arr[:, 2], arr[:, 3], nr)
    return {(int(a), int(b)) for a, b, _, _ in arr[mask]}


def test_fill_hexhole_matches_model_and_skips_hole(spark):
    rings = [[(la, lo) for lo, la in HEX], [(la, lo) for lo, la in HOLE]]
    polys = spark.createDataFrame(
        [("hexhole", rings)],
        schema="polygon_id string, rings array<array<struct<lat:long,lon:long>>>",
    )
    got = {(r["ix"], r["iy"]) for r in polygon_fill_cells(polys, res=16).collect()}
    want = _model_fill([HEX, HOLE], 16)
    assert got == want and len(got) > 1500
    # the hole actually removes cells vs the outer ring alone
    outer_only = _model_fill([HEX], 16)
    assert len(got) < len(outer_only)
    # and the removed ones are exactly the hole's interior fill
    assert outer_only - got == _model_fill([HOLE], 16) - _boundary_cells(16)


def _boundary_cells(res):
    """Cells whose center lies ON a hole edge — boundary-inclusive
    even-odd keeps them inside the polygon (on any ring = inside)."""
    hole = _model_fill([HOLE], res)
    out = set()
    for ix, iy in hole:
        clon = (2 * ix + 1) * LON_SPAN // (1 << (res + 1)) - LON_SPAN // 2
        clat = (2 * iy + 1) * LAT_SPAN // (1 << (res + 1)) - LAT_SPAN // 2
        nr = [(np.array([lo for lo, _ in HOLE], dtype=np.int64), np.array([la for _, la in HOLE], dtype=np.int64))]
        from osmflat_rs_spark.functions.pip import _ring_tests

        b, _p, _w = _ring_tests(
            np.array([clon], dtype=np.int64), np.array([clat], dtype=np.int64), nr[0][0], nr[0][1]
        )
        if b[0]:
            out.add((ix, iy))
    return out


def test_fill_fixture_polygons_match_model(spark, poly_df, poly_pdf):
    """Every generated fixture polygon (arbitrary, non-convex) fills
    exactly its model cell set; overlapping polygons each get their own
    pairs (the shared distinct doesn't leak or drop)."""
    res = 15
    got = {}
    for r in polygon_fill_cells(poly_df, res=res).collect():
        got.setdefault(r["polygon_id"], set()).add((r["ix"], r["iy"]))
    checked = 0
    for row in poly_pdf.itertuples():
        ring = [(int(v["lon"]), int(v["lat"])) for v in row.ring]
        want = _model_fill([ring], res)
        assert got.get(row.polygon_id, set()) == want, row.polygon_id
        checked += 1 if want else 0
    assert checked >= 5, "fixture polygons too small to exercise fill"


def test_fill_single_ring_schema(spark):
    polys = spark.createDataFrame(
        [("hex", [(la, lo) for lo, la in HEX], "district")],
        schema="polygon_id string, ring array<struct<lat:long,lon:long>>, kind string",
    )
    got = {(r["ix"], r["iy"]) for r in polygon_fill_cells(polys, res=16).collect()}
    assert got == _model_fill([HEX], 16)


def test_fill_tiny_polygon_no_crash(spark):
    """Polygon smaller than one cell: bbox is 1 cell; filled iff that
    cell's center lands inside — either way, no crash, ≤1 row."""
    tiny = [(134_000_000, 525_000_000), (134_000_050, 525_000_000), (134_000_025, 525_000_040)]
    polys = spark.createDataFrame(
        [("tiny", [(la, lo) for lo, la in tiny], "dot")],
        schema="polygon_id string, ring array<struct<lat:long,lon:long>>, kind string",
    )
    rows = polygon_fill_cells(polys, res=16).collect()
    assert len(rows) == len(_model_fill([tiny], 16))


def test_fill_plan_no_crossjoin_one_distinct(spark):
    polys = spark.createDataFrame(
        [("hex", [(la, lo) for lo, la in HEX], "district")],
        schema="polygon_id string, ring array<struct<lat:long,lon:long>>, kind string",
    )
    plan = (
        polygon_fill_cells(polys, res=14)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "BroadcastHashJoin" in plan  # candidates ⋈ broadcast cover


def test_morph_binary_matches_scipy_free_model(spark):
    """morph_binary vs a dense NumPy model of square-window morphology
    on a speckled blob: dilate superset, erode subset, open removes the
    isolated speckle, close fills the pinhole; open/close idempotence
    (applying twice changes nothing)."""
    import numpy as np

    from osmflat_rs_spark.operators.fill import morph_binary

    H = W = 16
    img = np.zeros((H, W), dtype=bool)
    img[4:10, 4:10] = True
    img[6, 6] = False          # pinhole -> close fills it
    img[13, 13] = True         # speckle -> open removes it
    cells = [(int(x), int(y)) for y in range(H) for x in range(W) if img[y, x]]
    df = spark.createDataFrame(cells, "ix long, iy long").repartition(4)

    def got_set(op, d):
        return {(r["ix"], r["iy"]) for r in morph_binary(d, 1, op).collect()}

    def dense_pad(opseq):
        """Apply ops on a padded frame; return the cell set in original coords."""
        r, m = 1, 3
        pad = np.zeros((H + 2 * m, W + 2 * m), dtype=bool)
        pad[m:H + m, m:W + m] = img
        for op in opseq:
            out = np.zeros_like(pad)
            for y in range(r, pad.shape[0] - r):
                for x in range(r, pad.shape[1] - r):
                    win = pad[y - r:y + r + 1, x - r:x + r + 1]
                    out[y, x] = win.any() if op == "dilate" else win.all()
            pad = out
        return {(int(x) - m, int(y) - m) for y, x in zip(*np.nonzero(pad))}

    assert got_set("dilate", df) == dense_pad(["dilate"])
    assert got_set("erode", df) == dense_pad(["erode"])
    opened = got_set("open", df)
    closed = got_set("close", df)
    assert opened == dense_pad(["erode", "dilate"])
    assert closed == dense_pad(["dilate", "erode"])
    assert (13, 13) not in opened          # speckle gone
    assert (6, 6) in closed                # pinhole filled
    # idempotence: open(open(X)) == open(X), close(close(X)) == close(X)
    odf = spark.createDataFrame(sorted(opened), "ix long, iy long")
    cdf = spark.createDataFrame(sorted(closed), "ix long, iy long")
    assert got_set("open", odf) == opened
    assert got_set("close", cdf) == closed


def test_morph_binary_validation(spark):
    import pytest as _pytest

    from osmflat_rs_spark.operators.fill import morph_binary

    df = spark.createDataFrame([(0, 0)], "ix long, iy long")
    with _pytest.raises(ValueError):
        morph_binary(df, 0, "close")
    with _pytest.raises(ValueError):
        morph_binary(df, 1, "sharpen")
