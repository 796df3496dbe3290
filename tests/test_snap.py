"""Nearest-segment join vs a brute-force NumPy clamped-projection
oracle; cover soundness across cell sizes; exact fallback."""

import numpy as np


def _brute(points, segs):
    """point -> (sid, d2) nearest by (d2, sid), doubles."""
    out = {}
    for qid, py, px in points:
        best = None
        for sid, y1, x1, y2, x2 in segs:
            dx, dy = float(x2 - x1), float(y2 - y1)
            len2 = dx * dx + dy * dy
            t = (((px - x1) * dx + (py - y1) * dy) / len2) if len2 > 0 else 0.0
            tc = min(1.0, max(0.0, t))
            ex, ey = px - (x1 + tc * dx), py - (y1 + tc * dy)
            d2 = ex * ex + ey * ey
            if best is None or (d2, sid) < best:
                best = (d2, sid)
        out[qid] = best
    return out


def _mkdata(seed=13, n_pts=150, n_segs=120, span=400_000):
    rng = np.random.default_rng(seed)
    X, Y = 132_000_000, 524_000_000
    points = [
        (f"q{j}", int(Y + rng.integers(0, span)), int(X + rng.integers(0, span)))
        for j in range(n_pts)
    ]
    segs = []
    for s in range(n_segs):
        y1, x1 = int(Y + rng.integers(0, span)), int(X + rng.integers(0, span))
        segs.append(
            (s, y1, x1, y1 + int(rng.integers(-60_000, 60_000)),
             x1 + int(rng.integers(-60_000, 60_000)))
        )
    # degenerate zero-length segment exercises the len2 == 0 branch
    segs.append((n_segs, int(Y + span // 2), int(X + span // 2),
                 int(Y + span // 2), int(X + span // 2)))
    return points, segs


def test_nearest_segment_matches_bruteforce(spark):
    from osmflat_rs_spark.operators.snap import nearest_segment_join

    points, segs = _mkdata()
    want = _brute(points, segs)
    pdf = spark.createDataFrame(points, "query_id string, lat long, lon long")
    sdf = spark.createDataFrame(segs, "sid long, lat1 long, lon1 long, lat2 long, lon2 long")
    radius = 80_000
    for cs in (1 << 15, 1 << 16, 1 << 17):  # cover is a perf knob only
        got = {
            r["query_id"]: (r["d2"], r["sid"])
            for r in nearest_segment_join(pdf, sdf, radius=radius, cell_size=cs).collect()
        }
        in_radius = {q: b for q, b in want.items() if b[0] <= radius ** 2}
        assert set(got) == set(in_radius), cs
        for q in in_radius:
            assert got[q] == in_radius[q], (cs, q)


def test_nearest_segment_exact_fallback_covers_all(spark):
    from osmflat_rs_spark.operators.snap import nearest_segment_join

    points, segs = _mkdata(seed=29, n_pts=40, n_segs=15)
    want = _brute(points, segs)
    pdf = spark.createDataFrame(points, "query_id string, lat long, lon long")
    sdf = spark.createDataFrame(segs, "sid long, lat1 long, lon1 long, lat2 long, lon2 long")
    rows = nearest_segment_join(pdf, sdf, radius=5_000, exact_fallback=True).collect()
    got = {r["query_id"]: (r["d2"], r["sid"]) for r in rows}
    assert set(got) == {q for q, _, _ in points}
    for q in got:
        assert got[q] == want[q]


def test_nearest_segment_snap_point_on_segment(spark):
    """Snapped coordinates: interior projection lands ON the segment
    (t in (0,1)), endpoint clamp returns the endpoint."""
    from osmflat_rs_spark.operators.snap import nearest_segment_join

    X, Y = 132_000_000, 524_000_000
    segs = [(1, Y, X, Y, X + 10_000)]  # horizontal segment
    points = [("mid", Y + 500, X + 4_000), ("past_end", Y + 300, X + 20_000)]
    pdf = spark.createDataFrame(points, "query_id string, lat long, lon long")
    sdf = spark.createDataFrame(segs, "sid long, lat1 long, lon1 long, lat2 long, lon2 long")
    got = {r["query_id"]: r for r in nearest_segment_join(pdf, sdf, radius=30_000).collect()}
    m = got["mid"]
    assert (m["snap_lon"], m["snap_lat"], m["t"], m["d2"]) == (X + 4_000, Y, 0.4, 500.0 ** 2)
    e = got["past_end"]
    assert (e["snap_lon"], e["snap_lat"], e["t"]) == (X + 10_000, Y, 1.0)
    assert e["d2"] == 300.0 ** 2 + 10_000.0 ** 2
