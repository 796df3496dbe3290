"""D8 flow direction / accumulation vs an independent pure-Python model."""

import numpy as np
import pytest

from osmflat_rs_spark.operators.flow import N8, flow_accumulation_grid, flow_direction_grid


def _model(points, res=16):
    """Independent model: quantize, count, D8 argmax, DFS accumulation."""
    from collections import Counter

    def q(lat, lon):
        iy = max(0, min((1 << res) - 1, (lat + 900_000_000) * (1 << res) // 1_800_000_000))
        ix = max(0, min((1 << res) - 1, (lon + 1_800_000_000) * (1 << res) // 3_600_000_000))
        return ix, iy

    z = Counter(q(la, lo) for la, lo in points)
    recv = {}
    for (ix, iy), zc in z.items():
        best = None
        for i, (ox, oy) in enumerate(N8):
            nb = (ix + ox, iy + oy)
            if nb in z and z[nb] < zc:
                drop = zc - z[nb]
                m = 2 if ox * oy == 0 else 1
                key = (drop * drop * m, -i)
                if best is None or key > best[0]:
                    best = (key, nb)
        recv[(ix, iy)] = best[1] if best else None
    acc = {c: 0 for c in z}
    for c in z:
        cur = recv[c]
        while cur is not None:
            acc[cur] += 1
            cur = recv[cur]
    return z, recv, acc


@pytest.fixture(scope="module")
def flow_points():
    rng = np.random.default_rng(7)
    # a dense mound: many points near the center so densities form slopes
    n = 6000
    lat = (524_500_000 + rng.normal(0, 250_000, n)).astype(np.int64)
    lon = (133_500_000 + rng.normal(0, 400_000, n)).astype(np.int64)
    return list(zip(lat.tolist(), lon.tolist()))


def test_flow_direction_matches_model(spark, flow_points):
    df = spark.createDataFrame(flow_points, "lat long, lon long")
    got = {
        (r["ix"], r["iy"]): (r["z"], (r["rx"], r["ry"]) if r["rx"] is not None else None)
        for r in flow_direction_grid(df, res=16).collect()
    }
    z, recv, _ = _model(flow_points)
    assert set(got) == set(z)
    for c in z:
        assert got[c] == (z[c], recv[c]), (c, got[c], (z[c], recv[c]))
    # sanity: on a mound some cells must actually flow
    assert sum(1 for _, r in got.values() if r is not None) > len(got) // 4


def test_flow_accumulation_matches_model(spark, flow_points):
    df = spark.createDataFrame(flow_points, "lat long, lon long")
    got = {(r["ix"], r["iy"]): r["acc"] for r in flow_accumulation_grid(df, res=16).collect()}
    _, _, acc = _model(flow_points)
    assert got == acc
    assert max(acc.values()) >= 3  # a real confluence exists in the fixture


def test_flow_accumulation_weighted_z(spark):
    # tiny hand-built chain: z 5 -> 3 -> 1 along one row; orthogonal wins
    pts = []
    # cell A: 5 points, cell B (east): 3 points, cell C (east of B): 1
    # pick coords in distinct res-16 cells along lon
    base_lat, base_lon = 524_500_000, 133_500_000
    cell_w = 3_600_000_000 // (1 << 16) + 1
    for k, n in enumerate((5, 3, 1)):
        pts += [(base_lat, base_lon + k * cell_w)] * n
    df = spark.createDataFrame(pts, "lat long, lon long")
    rows = {(r["ix"], r["iy"]): r for r in flow_accumulation_grid(df, res=16, weight="z").collect()}
    accs = sorted((r["z"], r["acc"]) for r in rows.values())
    # z=5 is a source (acc 0); z=3 receives 5; z=1 receives 5+3
    assert accs == [(1, 8), (3, 5), (5, 0)]
