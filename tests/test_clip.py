"""Vector-tile cut (clip_segments_to_grid): model parity against an
independent Cohen–Sutherland-style clipper, pinned edge conventions,
and the map-only plan shape (zero Exchange — the operator's whole
scale story)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osmflat_rs_spark.operators.clip import clip_segments_to_grid

CS = 1 << 16
EXT = 4096


def _model_clip(sid, x0, y0, x1, y1):
    """Independent model: Cohen–Sutherland iterative endpoint push
    (different algorithm family from the engine's Liang–Barsky t-window)
    over the same bbox fan-out; same quantization formula."""
    out = []
    cx_lo, cx_hi = int(np.floor(min(x0, x1) / CS)), int(np.floor(max(x0, x1) / CS))
    cy_lo, cy_hi = int(np.floor(min(y0, y1) / CS)), int(np.floor(max(y0, y1) / CS))
    for cx in range(cx_lo, cx_hi + 1):
        for cy in range(cy_lo, cy_hi + 1):
            xmn, ymn = cx * float(CS), cy * float(CS)
            xmx, ymx = xmn + CS, ymn + CS

            def code(px, py):
                c = 0
                if px < xmn:
                    c |= 1
                elif px > xmx:
                    c |= 2
                if py < ymn:
                    c |= 4
                elif py > ymx:
                    c |= 8
                return c

            ax, ay, bx, by = float(x0), float(y0), float(x1), float(y1)
            ca, cb = code(ax, ay), code(bx, by)
            accept = False
            for _ in range(64):
                if not (ca | cb):
                    accept = True
                    break
                if ca & cb:
                    break
                c = ca or cb
                if c & 1:
                    t = (xmn - ax) / (bx - ax)
                    px, py = xmn, ay + t * (by - ay)
                elif c & 2:
                    t = (xmx - ax) / (bx - ax)
                    px, py = xmx, ay + t * (by - ay)
                elif c & 4:
                    t = (ymn - ay) / (by - ay)
                    px, py = ax + t * (bx - ax), ymn
                else:
                    t = (ymx - ay) / (by - ay)
                    px, py = ax + t * (bx - ax), ymx
                if c == ca:
                    ax, ay, ca = px, py, code(px, py)
                else:
                    bx, by, cb = px, py, code(px, py)
            if not accept:
                continue
            # HALF-UP to match the engine/oracle convention (python's
            # round() is banker's; Spark round and DuckDB round are not)
            q = lambda p, mn: int(np.floor((p - mn) * float(EXT) / CS + 0.5))
            u0, v0, u1, v1 = q(ax, xmn), q(ay, ymn), q(bx, xmx - CS), q(by, ymx - CS)
            if u0 != u1 or v0 != v1:
                out.append((sid, cx, cy, u0, v0, u1, v1))
    return out


def _run(spark, rows):
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["sid", "x1", "y1", "x2", "y2"]),
        schema="sid long, x1 long, y1 long, x2 long, y2 long",
    )
    got = clip_segments_to_grid(df, CS, extent=EXT).collect()
    return sorted((r.sid, r.cell_x, r.cell_y, r.u0, r.v0, r.u1, r.v1) for r in got)


def test_model_parity_random(spark):
    rng = np.random.default_rng(42)
    n = 400
    xs = rng.integers(10 * CS, 40 * CS, n)
    ys = rng.integers(10 * CS, 40 * CS, n)
    # mix of short (intra-cell) and long (multi-cell) segments
    dx = rng.integers(-3 * CS, 3 * CS, n)
    dy = rng.integers(-3 * CS, 3 * CS, n)
    rows = [
        (int(i), int(xs[i]), int(ys[i]), int(xs[i] + dx[i]), int(ys[i] + dy[i]))
        for i in range(n)
    ]
    want = sorted(t for r in rows for t in _model_clip(*r))
    assert _run(spark, rows) == want


def test_edge_conventions(spark):
    # fully inside one cell
    inside = _run(spark, [(1, 2 * CS + 100, 2 * CS + 100, 2 * CS + 200, 2 * CS + 300)])
    assert [(c[1], c[2]) for c in inside] == [(2, 2)]
    # crossing a vertical border: two pieces, local coords meet at the seam
    cross = _run(spark, [(2, 3 * CS - 50, CS + 10, 3 * CS + 50, CS + 10)])
    assert [(c[1], c[2]) for c in cross] == [(2, 1), (3, 1)]
    (a, b) = cross
    assert a[5] == EXT and b[3] == 0  # u1 of left piece = extent, u0 of right = 0
    # collinear along a horizontal border: emitted ONLY in the cell whose
    # low edge it lies on (half-open ownership of the degenerate case)
    border = _run(spark, [(3, 5 * CS + 10, 4 * CS, 5 * CS + 500, 4 * CS)])
    assert [(c[1], c[2]) for c in border] == [(5, 4)]
    assert border[0][4] == 0 and border[0][6] == 0  # v == 0 in that cell
    # zero-length after quantization (a pure corner touch) is dropped
    corner = _run(spark, [(4, 6 * CS - 100, 6 * CS - 100, 6 * CS, 6 * CS)])
    assert all((c[1], c[2]) != (6, 6) for c in corner)


def test_degenerate_and_validation(spark):
    # zero-length input segment: dropped (quantization collapses it)
    assert _run(spark, [(1, CS + 7, CS + 9, CS + 7, CS + 9)]) == []
    with pytest.raises(ValueError, match="power of two"):
        clip_segments_to_grid(
            spark.createDataFrame([(1, 0, 0, 1, 1)], "sid long, x1 long, y1 long, x2 long, y2 long"),
            1000,
        )


def test_plan_is_map_only(spark):
    """The whole point at 10^12 segments: one narrow codegen stage — no
    Exchange, no Python eval anywhere in the plan."""
    df = spark.range(1000).select(
        F.col("id").alias("sid"),
        (F.col("id") * 7919 % 1000000).alias("x1"),
        (F.col("id") * 104729 % 1000000).alias("y1"),
        (F.col("id") * 7919 % 1000000 + 30000).alias("x2"),
        (F.col("id") * 104729 % 1000000 - 20000).alias("y2"),
    )
    plan = clip_segments_to_grid(df, CS)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


# --------------------------------------------------------------- cyrus-beck


def _cb_model(p0, p1, poly):
    """Reference Cyrus-Beck with Python floats (same op order)."""
    dx, dy = p1[0] - p0[0], p1[1] - p0[1]
    t0, t1 = 0.0, 1.0
    m = len(poly)
    for i in range(m):
        ax, ay = poly[i]
        bx, by = poly[(i + 1) % m]
        nx, ny = -(by - ay), (bx - ax)
        s = nx * (p0[0] - ax) + ny * (p0[1] - ay)
        d = nx * dx + ny * dy
        if d == 0:
            if s < 0:
                return None
            continue
        t = -s / d
        if d > 0:
            t0 = max(t0, t)
        else:
            t1 = min(t1, t)
    if t0 > t1:
        return None
    return (t0, t1, p0[0] + t0 * dx, p0[1] + t0 * dy, p0[0] + t1 * dx, p0[1] + t1 * dy)


def test_clip_segments_convex_matches_model(spark):
    import numpy as np
    import pytest as _pytest

    from osmflat_rs_spark.operators.clip import clip_segments_convex

    poly = [(0, 0), (100, 0), (130, 60), (50, 120), (-20, 60)]  # convex CCW
    rng = np.random.default_rng(23)
    segs = [
        (i, int(rng.integers(-80, 200)), int(rng.integers(-80, 200)),
         int(rng.integers(-80, 200)), int(rng.integers(-80, 200)))
        for i in range(400)
    ]
    # hand cases: fully inside, fully outside, crossing, touching edge,
    # zero-length inside and outside
    segs += [
        (1000, 40, 40, 60, 60),
        (1001, -70, -70, -60, -60),
        (1002, -50, 30, 200, 30),
        (1003, 0, 0, 100, 0),      # lies ON the bottom edge
        (1004, 50, 50, 50, 50),    # zero-length inside
        (1005, -50, -50, -50, -50),
    ]
    want = {}
    for sid, a, b, c, d in segs:
        r = _cb_model((a, b), (c, d), poly)
        if r is not None:
            want[sid] = tuple(round(v, 9) for v in r)
    df = spark.createDataFrame(segs, "seg_id long, x0 long, y0 long, x1 long, y1 long")
    rows = clip_segments_convex(df, poly).collect()
    got = {r["seg_id"]: tuple(round(v, 9) for v in
                              (r["t0"], r["t1"], r["cx0"], r["cy0"], r["cx1"], r["cy1"]))
           for r in rows}
    assert got == want
    assert 1000 in got and got[1000][:2] == (0.0, 1.0)
    assert 1001 not in got and 1005 not in got
    assert 1002 in got and 1003 in got and 1004 in got
    with _pytest.raises(ValueError):
        clip_segments_convex(df, [(0, 0), (1, 1)])
