"""Marching-squares contour extraction vs an independent Python model.

The model below re-implements the module's documented conventions
(missing=0, strictly-greater inside test, linear edge interpolation,
center-average saddle rule) with plain dicts and floats — no Spark, no
shared code — so a convention drift in either side breaks the multiset
comparison.
"""

import numpy as np
import pandas as pd
import pytest

from osmflat_rs_spark.operators.contour import contour_segments

# mirror of contour._CASE_SEGS, written independently from the classic
# marching-squares case table (corner bit i = dx + 2*dy, S/E/N/W edges)
_MODEL_SEGS = {
    0: [],
    1: [("W", "S")],
    2: [("S", "E")],
    3: [("W", "E")],
    4: [("E", "N")],
    6: [("S", "N")],
    7: [("W", "N")],
    8: [("N", "W")],
    9: [("S", "N")],
    11: [("E", "N")],
    12: [("W", "E")],
    13: [("S", "E")],
    14: [("W", "S")],
    15: [],
}


def _model(cells: dict, level: float) -> list:
    """All contour segments of the sparse surface, global coords."""

    def val(x, y):
        return float(cells.get((x, y), 0.0))

    def edge_pt(e, v00, v10, v01, v11):
        if e == "S":
            return ((level - v00) / (v10 - v00), 0.0)
        if e == "E":
            return (1.0, (level - v10) / (v11 - v10))
        if e == "N":
            return ((level - v01) / (v11 - v01), 1.0)
        return (0.0, (level - v00) / (v01 - v00))

    blocks = set()
    for (ix, iy) in cells:
        for dx in (0, 1):
            for dy in (0, 1):
                blocks.add((ix - dx, iy - dy))
    out = []
    for (bx, by) in sorted(blocks):
        v00, v10 = val(bx, by), val(bx + 1, by)
        v01, v11 = val(bx, by + 1), val(bx + 1, by + 1)
        case = (
            int(v00 > level) + 2 * int(v10 > level) + 4 * int(v11 > level) + 8 * int(v01 > level)
        )
        if case == 5:
            high = (v00 + v10 + v01 + v11) / 4.0 > level
            segs = [("S", "E"), ("W", "N")] if high else [("W", "S"), ("E", "N")]
        elif case == 10:
            high = (v00 + v10 + v01 + v11) / 4.0 > level
            segs = [("W", "S"), ("E", "N")] if high else [("S", "E"), ("W", "N")]
        else:
            segs = _MODEL_SEGS[case]
        for a, b in segs:
            (x0, y0) = edge_pt(a, v00, v10, v01, v11)
            (x1, y1) = edge_pt(b, v00, v10, v01, v11)
            out.append((bx, by, bx + x0, by + y0, bx + x1, by + y1))
    return out


def _collect(df):
    return [
        (r["bx"], r["by"], r["x0"], r["y0"], r["x1"], r["y1"])
        for r in df.collect()
    ]


def _as_multiset(rows, nd=9):
    return sorted(tuple(round(float(v), nd) for v in r) for r in rows)


def test_contour_single_cell_diamond(spark):
    """One occupied cell, count 5, level 2.5 → a 4-segment diamond whose
    crossing points sit exactly halfway along each edge (t = 0.5)."""
    df = spark.createDataFrame([(7, 3, 5)], "ix long, iy long, v long")
    got = _as_multiset(_collect(contour_segments(df, "v", 2.5)))
    want = _as_multiset(_model({(7, 3): 5.0}, 2.5))
    assert got == want
    assert len(got) == 4
    # every endpoint at half-integer offset from the cell corner
    pts = sorted({(r[2], r[3]) for r in got} | {(r[4], r[5]) for r in got})
    assert pts == [(6.5, 3.0), (7.0, 2.5), (7.0, 3.5), (7.5, 3.0)]


def test_contour_matches_model_random_sparse(spark):
    """Random sparse integer count surface (clustered, holes, plateaus —
    saddles guaranteed by the checkerboard patch) vs the model, bit-level
    multiset equality at half-integer levels 0.5 / 2.5 / 6.5."""
    rng = np.random.RandomState(23)
    cells = {}
    # clustered blobs
    for _ in range(40):
        cx, cy = rng.randint(0, 40), rng.randint(0, 40)
        for _ in range(rng.randint(2, 12)):
            k = (cx + rng.randint(-2, 3), cy + rng.randint(-2, 3))
            cells[k] = cells.get(k, 0) + rng.randint(1, 6)
    # explicit checkerboard patch → saddle cases 5/10
    for i in range(6):
        for j in range(6):
            if (i + j) % 2 == 0:
                cells[(60 + i, 60 + j)] = 9
    pdf = pd.DataFrame(
        [(ix, iy, v) for (ix, iy), v in cells.items()], columns=["ix", "iy", "v"]
    )
    df = spark.createDataFrame(pdf).repartition(7)
    for level in (0.5, 2.5, 6.5):
        got = _as_multiset(_collect(contour_segments(df, "v", level)))
        want = _as_multiset(_model({k: float(v) for k, v in cells.items()}, level))
        assert got == want, f"level={level}: {len(got)} vs {len(want)} segments"
        assert len(got) > 20, f"level={level} produced a trivial surface"


def test_contour_closed_loops_even_degree(spark):
    """On an integer surface with a half-integer level every contour is a
    closed loop: each crossing point must appear an EVEN number of times
    as a segment endpoint (interior edges shared by 2 blocks pair up)."""
    rng = np.random.RandomState(5)
    cells = {}
    for _ in range(200):
        k = (rng.randint(0, 15), rng.randint(0, 15))
        cells[k] = cells.get(k, 0) + 1
    pdf = pd.DataFrame([(a, b, v) for (a, b), v in cells.items()], columns=["ix", "iy", "v"])
    rows = _collect(contour_segments(spark.createDataFrame(pdf), "v", 1.5))
    deg = {}
    for r in rows:
        for p in ((round(r[2], 9), round(r[3], 9)), (round(r[4], 9), round(r[5], 9))):
            deg[p] = deg.get(p, 0) + 1
    assert rows, "no segments"
    assert all(d % 2 == 0 for d in deg.values()), {
        p: d for p, d in deg.items() if d % 2
    }


def test_contour_plan_one_exchange_no_join(spark):
    """The whole operator is fan-out + one groupBy + a codegen projection:
    the executed plan must contain NO Join and exactly ONE Exchange."""
    pts = spark.range(1000).selectExpr(
        "id % 37 AS ix", "id % 29 AS iy", "CAST(1 + id % 5 AS LONG) AS v"
    )
    grid = pts.groupBy("ix", "iy").agg({"v": "sum"}).withColumnRenamed("sum(v)", "v")
    plan = (
        contour_segments(grid, "v", 2.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    # grid agg is one Exchange, the block-corner pivot the other
    assert plan.count("Exchange") == 2, plan


def test_contour_level_on_empty_side(spark):
    """Level above every value → zero segments (and no crash on the
    all-outside blocks)."""
    df = spark.createDataFrame([(0, 0, 1), (1, 0, 2)], "ix long, iy long, v long")
    assert contour_segments(df, "v", 99.5).count() == 0
