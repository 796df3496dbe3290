"""Exact RDP simplification: hand cases, the DP postcondition, and the
pure-Python kernel's exactness at overflow-scale coordinates."""

import numpy as np
import pandas as pd
import pytest

from osmflat_rs_spark.operators.simplify import _dp_keep, simplify_lines


def _mk(spark, pts, tid=0):
    pdf = pd.DataFrame(
        [(tid, i, la, lo) for i, (lo, la) in enumerate(pts)],
        columns=["tid", "seq", "lat", "lon"],
    )
    return spark.createDataFrame(pdf)


def test_rdp_bump_kept_or_dropped_by_eps(spark):
    # straight horizontal line with one bump of height 1000 at x=2000
    pts = [(0, 0), (1000, 0), (2000, 1000), (3000, 0), (4000, 0)]
    df = _mk(spark, pts)
    keep_small = sorted(r["seq"] for r in simplify_lines(df, "tid", 999, ("seq",)).collect())
    keep_big = sorted(r["seq"] for r in simplify_lines(df, "tid", 1000, ("seq",)).collect())
    assert keep_small == [0, 2, 4]  # bump survives eps<height
    assert keep_big == [0, 4]  # strict >: eps == height drops it


def test_rdp_collinear_only_endpoints(spark):
    pts = [(i * 37, i * 74) for i in range(50)]
    df = _mk(spark, pts)
    assert sorted(r["seq"] for r in simplify_lines(df, "tid", 1, ("seq",)).collect()) == [0, 49]


def test_rdp_closed_ring_degenerate_chord(spark):
    # first == last: the point-distance fallback must keep the far side
    pts = [(0, 0), (5000, 0), (5000, 5000), (0, 5000), (0, 0)]
    keep = sorted(
        r["seq"] for r in simplify_lines(_mk(spark, pts), "tid", 100, ("seq",)).collect()
    )
    assert 0 in keep and 4 in keep and len(keep) >= 4


def test_rdp_postcondition_random(spark):
    """For every consecutive kept pair, every dropped vertex between them
    is within eps of their chord (the recursion's stopping condition) —
    an independent property, not a reimplementation."""
    rng = np.random.RandomState(13)
    rows = []
    for tid in range(8):
        n = rng.randint(3, 60)
        x = np.cumsum(rng.randint(-500, 501, n)).astype("int64") * 100
        y = np.cumsum(rng.randint(-500, 501, n)).astype("int64") * 100
        for i in range(n):
            rows.append((tid, i, int(y[i]), int(x[i])))
    pdf = pd.DataFrame(rows, columns=["tid", "seq", "lat", "lon"])
    eps = 20_000
    out = simplify_lines(spark.createDataFrame(pdf).repartition(4), "tid", eps, ("seq",))
    kept = {}
    for r in out.collect():
        kept.setdefault(r["tid"], []).append(r["seq"])
    for tid, grp in pdf.groupby("tid"):
        g = grp.sort_values("seq").reset_index(drop=True)
        ks = sorted(kept[tid])
        assert ks[0] == 0 and ks[-1] == len(g) - 1
        for a, b in zip(ks, ks[1:]):
            ax, ay = int(g.lon[a]), int(g.lat[a])
            bx, by = int(g.lon[b]), int(g.lat[b])
            dx, dy = bx - ax, by - ay
            for i in range(a + 1, b):
                px, py = int(g.lon[i]) - ax, int(g.lat[i]) - ay
                if dx == 0 and dy == 0:
                    assert px * px + py * py <= eps * eps
                else:
                    c = dx * py - dy * px
                    assert c * c <= eps * eps * (dx * dx + dy * dy)


def test_dp_keep_exact_at_overflow_scale():
    """cross² at WGS84 fixed-point scale exceeds int64 — the kernel must
    stay exact (Python bigints). A bump of 1 unit on a 3.6e9-long chord:
    cross = 3.6e9, cross² = 1.3e19 > 2^63."""
    xs = [0, 1_800_000_000, 3_600_000_000]
    ys = [0, 1, 0]
    # eps = 0: the 1-unit bump must be kept (cross² = (3.6e9)² > 0)
    assert _dp_keep(xs, ys, 0) == [True, True, True]
    # eps = 1: dist = 1·3.6e9/3.6e9 = 1 exactly, strict > drops it
    assert _dp_keep(xs, ys, 1) == [True, False, True]


def test_rdp_single_and_two_vertex_lines(spark):
    pdf = pd.DataFrame(
        [(0, 0, 5, 5), (1, 0, 1, 1), (1, 1, 2, 2)],
        columns=["tid", "seq", "lat", "lon"],
    )
    out = simplify_lines(spark.createDataFrame(pdf), "tid", 1000, ("seq",)).collect()
    assert len(out) == 3  # everything passes through


def test_rdp_requires_order(spark):
    df = _mk(spark, [(0, 0), (1, 1)])
    with pytest.raises(ValueError):
        simplify_lines(df, "tid", 10)


def test_chaikin_matches_reference_impl(spark):
    """Engine vs a plain-Python keep-endpoints Chaikin at 1 and 3
    passes; singleton and two-point lines; order-scramble invariance."""
    import numpy as np
    import pytest as _pytest

    from osmflat_rs_spark.operators.simplify import chaikin_smooth

    def ref(pts, iters):
        cur = [(x * 1, y * 1) for x, y in pts]
        for _ in range(iters):
            if len(cur) < 2:
                cur = [(4 * x, 4 * y) for x, y in cur]
                continue
            nxt = [(4 * cur[0][0], 4 * cur[0][1])]
            for (x0, y0), (x1, y1) in zip(cur, cur[1:]):
                nxt.append((3 * x0 + x1, 3 * y0 + y1))
                nxt.append((x0 + 3 * x1, y0 + 3 * y1))
            nxt.append((4 * cur[-1][0], 4 * cur[-1][1]))
            cur = nxt
        return cur

    rng = np.random.default_rng(31)
    lines = {
        1: [(int(rng.integers(-1000, 1000)), int(rng.integers(-1000, 1000))) for _ in range(12)],
        2: [(7, 9)],
        3: [(0, 0), (100, -40)],
    }
    rows = [(k, o, la, lo) for k, pts in lines.items() for o, (la, lo) in enumerate(pts)]
    rng.shuffle(rows)  # input order must not matter (array_sort contract)
    df = spark.createDataFrame(rows, "k long, o long, lat long, lon long")
    for iters in (1, 3):
        got = {}
        for r in chaikin_smooth(df, "k", ("o",), iters=iters).collect():
            got.setdefault(r["k"], []).append((r["pos"], r["lat_s"], r["lon_s"]))
        for k, pts in lines.items():
            want = [(i, la, lo) for i, (la, lo) in enumerate(ref(pts, iters))]
            assert sorted(got[k]) == want, (k, iters)
    with _pytest.raises(ValueError, match="iters"):
        chaikin_smooth(df, "k", ("o",), iters=0)
    with _pytest.raises(ValueError, match="order_cols"):
        chaikin_smooth(df, "k", ())
