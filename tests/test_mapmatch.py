"""HMM map-matching vs an independent brute-force path-enumeration
oracle (all candidate paths, exact same cost model)."""

import datetime
import itertools

import numpy as np
import pytest


def _seg_dist(px, py, x1, y1, x2, y2):
    dx, dy = float(x2 - x1), float(y2 - y1)
    len2 = dx * dx + dy * dy
    t = ((px - x1) * dx + (py - y1) * dy) / len2 if len2 > 0 else 0.0
    tc = max(0.0, min(1.0, t))
    qx, qy = x1 + tc * dx, y1 + tc * dy
    return (px - qx) ** 2 + (py - qy) ** 2, qx, qy


def _oracle(points, segments, radius, k, sigma, beta):
    """points: [(pid, ts, lat, lon)] ONE entity; brute-force Viterbi by
    full path enumeration, min by (cost, path)."""
    cands = []
    for pid, ts, la, lo in sorted(points, key=lambda p: (p[1], p[0])):
        cc = []
        for sid, la1, lo1, la2, lo2 in segments:
            d2, qx, qy = _seg_dist(lo, la, lo1, la1, lo2, la2)
            if d2 <= radius * radius:
                cc.append((d2, sid, qx, qy))
        cc.sort()
        cc = cc[:k]
        if cc:
            cands.append((pid, float(lo), float(la), cc))
    if not cands:
        return []
    best = None
    for path in itertools.product(*(range(len(c[3])) for c in cands)):
        cost = cands[0][3][path[0]][0] / (2 * sigma * sigma)
        for s in range(1, len(cands)):
            d2p, _, qx0, qy0 = cands[s - 1][3][path[s - 1]]
            d2c, _, qx1, qy1 = cands[s][3][path[s]]
            dgps = np.sqrt(
                (cands[s][1] - cands[s - 1][1]) ** 2 + (cands[s][2] - cands[s - 1][2]) ** 2
            )
            droute = np.sqrt((qx1 - qx0) ** 2 + (qy1 - qy0) ** 2)
            cost = (cost + abs(droute - dgps) / beta) + d2c / (2 * sigma * sigma)
        key = (cost, [cands[s][3][path[s]][1] for s in range(len(cands))])
        if best is None or key < best:
            best = key
    sids = best[1]
    return [
        (s + 1, cands[s][0], sids[s]) for s in range(len(cands))
    ]


SEGS = [  # two parallel horizontal roads 30k apart + a connector
    (1, 0, 0, 0, 300_000),
    (2, 30_000, 0, 30_000, 300_000),
    (3, 0, 150_000, 30_000, 150_000),
]


def _spark_df(spark, pts, segs):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (pid, ent, base + datetime.timedelta(seconds=ts), la, lo)
        for ent, plist in pts.items()
        for pid, ts, la, lo in plist
    ]
    pdf = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, lat long, lon long"
    )
    sdf = spark.createDataFrame(segs, "sid long, lat1 long, lon1 long, lat2 long, lon2 long")
    return pdf, sdf


def test_map_match_matches_enumeration_oracle(spark):
    from osmflat_rs_spark.operators.mapmatch import map_match

    rng = np.random.default_rng(11)
    pts = {}
    for ent in range(4):
        road_y = 0 if ent % 2 == 0 else 30_000
        plist = []
        for i in range(6):
            la = road_y + int(rng.integers(-12_000, 12_000))
            lo = 20_000 + i * 45_000 + int(rng.integers(-5_000, 5_000))
            plist.append((ent * 100 + i, i * 30, la, lo))
        pts[ent] = plist
    pdf, sdf = _spark_df(spark, pts, SEGS)
    got = {}
    out = map_match(pdf, sdf, radius=40_000, k=3, sigma=15_000.0, beta=10_000.0)
    for r in out.collect():
        got.setdefault(r["entity"], []).append((r["step"], r["point_id"], r["sid"]))
    for ent, plist in pts.items():
        want = _oracle(plist, SEGS, 40_000, 3, 15_000.0, 10_000.0)
        assert sorted(got[ent]) == want, ent


def test_map_match_smooths_zigzag(spark):
    """Points alternate slightly closer to road 1 / road 2; independent
    per-point snap zig-zags, the HMM sticks to one road."""
    from osmflat_rs_spark.operators.mapmatch import map_match
    from osmflat_rs_spark.operators.snap import nearest_segment_join

    plist = []
    for i in range(8):
        la = 14_000 + (2_000 if i % 2 else -2_000)  # midway, alternating
        plist.append((i, i * 10, la, 30_000 + i * 30_000))
    pdf, sdf = _spark_df(spark, {7: plist}, SEGS[:2])
    snap_ids = {
        r["sid"]
        for r in nearest_segment_join(
            pdf.selectExpr("event_id as query_id", "lat", "lon"), sdf, radius=40_000
        ).collect()
    }
    assert snap_ids == {1, 2}  # the zig-zag
    hmm = [r["sid"] for r in map_match(
        pdf, sdf, radius=40_000, k=2, sigma=20_000.0, beta=1_000.0
    ).collect()]
    assert len(set(hmm)) == 1  # one road, no zig-zag


def test_map_match_gap_skip_and_single_point(spark):
    from osmflat_rs_spark.operators.mapmatch import map_match

    plist = [
        (0, 0, 5_000, 50_000),
        (1, 10, 900_000, 900_000),  # no candidate in radius -> dropped
        (2, 20, 6_000, 120_000),
    ]
    single = [(9, 0, 25_000, 80_000)]
    pdf, sdf = _spark_df(spark, {1: plist, 2: single}, SEGS)
    rows = map_match(pdf, sdf, radius=40_000, k=2, sigma=15_000.0, beta=10_000.0).collect()
    e1 = sorted((r["step"], r["point_id"]) for r in rows if r["entity"] == 1)
    assert e1 == [(1, 0), (2, 2)]  # pid 1 skipped, steps renumbered
    e2 = [(r["step"], r["point_id"], r["sid"]) for r in rows if r["entity"] == 2]
    assert e2 == [(1, 9, 2)]  # nearest road wins on a single point


def test_map_match_validation(spark):
    from osmflat_rs_spark.operators.mapmatch import map_match

    pdf, sdf = _spark_df(spark, {1: [(0, 0, 0, 0)]}, SEGS)
    with pytest.raises(ValueError, match="sigma"):
        map_match(pdf, sdf, radius=10, sigma=0.0)
