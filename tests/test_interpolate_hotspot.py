"""IDW interpolation and grid hotspot clustering vs independent
pure-Python oracles (brute-force kNN + BFS flood fill)."""

import math

import numpy as np
import pytest


def _idw_oracle(pts, queries, k, power):
    """Brute force: all distances, sort by (d2, id), weight 1/d^power."""
    out = {}
    for qid, qla, qlo in queries:
        d = sorted(
            ((la - qla) ** 2 + (lo - qlo) ** 2, i, v) for i, la, lo, v in pts
        )[:k]
        zeros = [v for d2, _, v in d if d2 == 0]
        if zeros:
            out[qid] = sum(zeros) / len(zeros)
        else:
            num = sum(v / math.sqrt(d2) ** power for d2, _, v in d)
            den = sum(1 / math.sqrt(d2) ** power for d2, _, _ in d)
            out[qid] = num / den
    return out


def test_idw_matches_bruteforce(spark):
    from osmflat_rs_spark.operators.interpolate import idw_interpolate

    rng = np.random.default_rng(5)
    X, Y = 132_000_000, 524_000_000
    pts = [
        (int(i), int(Y + rng.integers(0, 300_000)), int(X + rng.integers(0, 600_000)),
         float(rng.uniform(-50, 150)))
        for i in range(400)
    ]
    queries = [
        (f"q{j}", int(Y + rng.integers(0, 300_000)), int(X + rng.integers(0, 600_000)))
        for j in range(12)
    ]
    pdf = spark.createDataFrame(pts, "event_id long, lat long, lon long, value double")
    qdf = spark.createDataFrame(queries, "query_id string, lat long, lon long")
    for power in (2, 4):
        got = {
            r["query_id"]: (r["idw"], r["n_neighbors"])
            for r in idw_interpolate(
                pdf, qdf, k=5, power=power, metric="sqeuclid",
                res=14, radius_m=400_000, exact_fallback=True,
            ).collect()
        }
        want = _idw_oracle(pts, queries, k=5, power=power)
        assert set(got) == {q for q, _, _ in queries}
        for qid in want:
            assert got[qid][1] == 5
            assert got[qid][0] == pytest.approx(want[qid], rel=1e-9), (power, qid)


def test_idw_zero_distance_takes_exact_mean(spark):
    """Two observations AT the query point (values 10 and 30) -> 20,
    regardless of everything else within k."""
    from osmflat_rs_spark.operators.interpolate import idw_interpolate

    X, Y = 132_000_000, 524_000_000
    pts = [
        (1, Y, X, 10.0), (2, Y, X, 30.0),
        (3, Y + 100, X, 999.0), (4, Y, X + 200, -999.0), (5, Y + 300, X + 300, 5.0),
    ]
    pdf = spark.createDataFrame(pts, "event_id long, lat long, lon long, value double")
    qdf = spark.createDataFrame([("q0", Y, X)], "query_id string, lat long, lon long")
    row = idw_interpolate(
        pdf, qdf, k=5, metric="sqeuclid", res=14, radius_m=400_000
    ).collect()[0]
    assert row["idw"] == pytest.approx(20.0)


def _hotspot_oracle(pts, cs, min_pts):
    """Grid + BFS flood fill over 8-adjacent dense cells."""
    from collections import defaultdict, deque

    P, M = 1 << 30, 1 << 31
    cells = defaultdict(list)
    for i, la, lo in pts:
        cells[(lo // cs, la // cs)].append(i)
    core = {c for c, ids in cells.items() if len(ids) >= min_pts}
    label = {}
    for c in sorted(core, key=lambda c: (c[0] + P) * M + (c[1] + P)):
        if c in label:
            continue
        lbl = (c[0] + P) * M + (c[1] + P)
        dq = deque([c])
        label[c] = lbl
        while dq:
            x, y = dq.popleft()
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    n = (x + dx, y + dy)
                    if n in core and n not in label:
                        label[n] = lbl
                        dq.append(n)
    return {i: label[c] for c, ids in cells.items() if c in core for i in ids}


def test_hotspot_matches_bfs_oracle(spark):
    from osmflat_rs_spark.operators.hotspot import hotspot_clusters

    rng = np.random.default_rng(9)
    # three planted blobs + uniform noise; negative coords exercise floor
    blobs = [(-40_000, -30_000), (110_000, 45_000), (112_000, 47_500)]
    pts = []
    i = 0
    for bx, by in blobs:
        for _ in range(120):
            pts.append((i, int(by + rng.normal(0, 1500)), int(bx + rng.normal(0, 1500))))
            i += 1
    for _ in range(150):
        pts.append((i, int(rng.integers(-60_000, 60_000)), int(rng.integers(-60_000, 120_000))))
        i += 1
    cs, mp = 1000, 4
    want = _hotspot_oracle(pts, cs, mp)
    df = spark.createDataFrame(pts, "event_id long, lat long, lon long")
    got = {
        r["event_id"]: r["cluster"]
        for r in hotspot_clusters(df, cell_size=cs, min_pts=mp).collect()
    }
    assert got == want
    # sanity: the two close blobs may or may not merge, but there are
    # >= 2 clusters and most blob points are clustered
    assert len(set(want.values())) >= 2
    assert sum(1 for i in want if i < 360) > 150


def test_hotspot_isolated_core_cell_is_own_cluster(spark):
    from osmflat_rs_spark.operators.hotspot import hotspot_clusters

    pts = [(i, 500, 500) for i in range(5)] + [(9, 50_000, 50_000)]
    df = spark.createDataFrame(pts, "event_id long, lat long, lon long")
    got = hotspot_clusters(df, cell_size=1000, min_pts=3).collect()
    assert {r["event_id"] for r in got} == {0, 1, 2, 3, 4}
    assert len({r["cluster"] for r in got}) == 1
