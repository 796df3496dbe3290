"""connected_components / dedup_cluster_representatives: union-find
model parity, chain topology (pointer-jumping path), self-loop node
registration, partition invariance."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmflat_rs_spark.operators.graph import (
    connected_components,
    dedup_cluster_representatives,
)


def _uf_components(edges):
    nodes = sorted({x for e in edges for x in e})
    p = {n: n for n in nodes}

    def find(x):
        while p[x] != x:
            p[x] = p[p[x]]
            x = p[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            p[max(ru, rv)] = min(ru, rv)
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(ns) for ns in comp.values() for n in ns}


def test_matches_union_find_on_mixed_topology(spark):
    rng = np.random.default_rng(5)
    edges = [(int(rng.integers(0, 400)), int(rng.integers(0, 400))) for _ in range(300)]
    edges += [(1000 + i, 1001 + i) for i in range(200)]  # 201-node chain
    edges += [(2000 + i, 2000 + j) for i in range(8) for j in range(i + 1, 8)]
    edges = [(u, v) for u, v in edges if u != v]
    want = _uf_components(edges)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == want
    # partition layout must not change anything
    got2 = {
        r["node"]: r["component"]
        for r in connected_components(df.repartition(13)).collect()
    }
    assert got2 == want


def test_chain_converges_in_log_rounds(spark):
    # a 140-node chain: plain neighbor-min needs ~140 rounds; pointer
    # jumping must land it within the (tight) max_iter budget below
    edges = [(i, i + 1) for i in range(140)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["component"] for r in connected_components(df, max_iter=12).collect()}
    assert got == {i: 0 for i in range(141)}


def test_self_loops_register_isolated_nodes(spark):
    df = spark.createDataFrame([(1, 2), (7, 7)], "src long, dst long")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == {1: 1, 2: 1, 7: 7}


def test_representatives_flag(spark):
    df = spark.createDataFrame([(3, 5), (5, 9), (20, 21)], "id_a long, id_b long")
    rows = {r["node"]: r for r in dedup_cluster_representatives(df).collect()}
    assert {n: r["component"] for n, r in rows.items()} == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20}
    assert {n for n, r in rows.items() if r["is_representative"]} == {3, 20}


def test_validation_and_guard(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        connected_components(df, max_iter=0)
    # an honest non-convergence guard: 1 round cannot finish a chain
    chain = spark.createDataFrame([(i, i + 1) for i in range(50)], "src long, dst long")
    with pytest.raises(RuntimeError):
        connected_components(chain, max_iter=1)


def _bf_model(edges, sources, max_hops):
    """Plain-Python bounded Bellman-Ford: dist[s][v] = min weight over
    directed paths with <= max_hops edges."""
    out = {}
    for s in sources:
        dist = {s: 0}
        for _ in range(max_hops):
            nxt = dict(dist)
            for (u, v, w) in edges:
                if u in dist and dist[u] + w < nxt.get(v, float("inf")):
                    nxt[v] = dist[u] + w
            dist = nxt
        for v, d in dist.items():
            out[(s, v)] = d
    return out


def test_shortest_paths_matches_model_random(spark):
    import numpy as np

    from osmflat_rs_spark.operators.graph import shortest_paths

    rng = np.random.RandomState(3)
    n = 60
    edges = []
    for u in range(n):
        for _ in range(3):
            v = int(rng.randint(0, n))
            if v != u:
                edges.append((u, v, int(rng.randint(1, 20))))
    df = spark.createDataFrame(edges, "src long, dst long, w long").repartition(6)
    for hops in (0, 1, 3, 8):
        got = {
            (r["source"], r["node"]): r["dist"]
            for r in shortest_paths(df, [0, 17, 42], hops).collect()
        }
        want = _bf_model(edges, [0, 17, 42], hops)
        assert got == want, f"max_hops={hops}"


def test_shortest_paths_hop_bound_is_semantic(spark):
    """A cheap long path vs an expensive short path: the bound decides."""
    from osmflat_rs_spark.operators.graph import shortest_paths

    # 0->1->2->3 costs 3 (3 hops); 0->3 direct costs 10 (1 hop)
    edges = [(0, 1, 1), (1, 2, 1), (2, 3, 1), (0, 3, 10)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    d1 = {r["node"]: r["dist"] for r in shortest_paths(df, [0], 1).collect()}
    d3 = {r["node"]: r["dist"] for r in shortest_paths(df, [0], 3).collect()}
    assert d1[3] == 10 and d3[3] == 3
    assert d1 == {0: 0, 1: 1, 3: 10}


def test_shortest_paths_early_exit_equals_full(spark):
    """Once the frontier drains, more hops change nothing (the early
    exit is an optimization, not a semantics change)."""
    from osmflat_rs_spark.operators.graph import shortest_paths

    edges = [(0, 1, 2), (1, 2, 2), (2, 0, 2)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    a = {(r["source"], r["node"]): r["dist"] for r in shortest_paths(df, [0], 5).collect()}
    b = {(r["source"], r["node"]): r["dist"] for r in shortest_paths(df, [0], 50).collect()}
    assert a == b == {(0, 0): 0, (0, 1): 2, (0, 2): 4}


def test_shortest_paths_rejects_negative_weight(spark):
    import pytest as _pytest

    from osmflat_rs_spark.operators.graph import shortest_paths

    df = spark.createDataFrame([(0, 1, -1)], "src long, dst long, w long")
    with _pytest.raises(ValueError):
        shortest_paths(df, [0], 3)


def _np_pagerank(edges, n, iters, d=0.85):
    import numpy as np

    deg = np.zeros(n)
    for u, _ in edges:
        deg[u] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1 - d) / n)
        for u, v in edges:
            nxt[v] += d * r[u] / deg[u]
        r = nxt
    return r


def test_pagerank_exact_mass_and_float_parity(spark):
    """Σ rank_scaled == n·60^T exactly (integer mass conservation), and
    rank_scaled/denominator matches a dense float power iteration."""
    from osmflat_rs_spark.operators.graph import pagerank_uniform

    n, g, iters = 60, 3, 4
    edges = [(u, (u * 31 + k) % n) for u in range(n) for k in (1, 2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: (r["rank_scaled"], r["rank_ppb"]) for r in
           pagerank_uniform(df, n, g, iters).collect()}
    denom = n * (20 * g) ** iters
    assert sum(v[0] for v in out.values()) == denom
    ref = _np_pagerank(edges, n, iters)
    for v in range(n):
        assert abs(out[v][0] / denom - ref[v]) < 1e-12
        assert out[v][1] == out[v][0] * 10**9 // denom


def test_pagerank_rejects_nonuniform_and_overflow(spark):
    import pytest as _pytest

    from osmflat_rs_spark.operators.graph import pagerank_uniform

    bad = spark.createDataFrame([(0, 1), (1, 0), (1, 2), (2, 0), (2, 1)], "src long, dst long")
    with _pytest.raises(ValueError, match="out-degree"):
        pagerank_uniform(bad, 3, 2, 2)
    ok = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    with _pytest.raises(ValueError, match="overflow"):
        pagerank_uniform(ok, 2, 1, 40)
    # big-graph regime: scaled ranks fit, ppb would not -> NULL ppb
    n = 40
    edges = [(u, (u * 31 + k) % n) for u in range(n) for k in (1, 2, 3)]
    big = spark.createDataFrame(edges, "src long, dst long")
    # force the ppb-unsafe branch by checking the seam directly: T where
    # n*60^T*1e9 >= 2^63 but n*60^T < 2^62  (n=40: T=6)
    out = pagerank_uniform(big, n, 3, 6).collect()
    assert all(r["rank_ppb"] is None for r in out)
    assert sum(r["rank_scaled"] for r in out) == n * 60**6


def test_pagerank_partition_invariance(spark):
    """Same ranks whether the edge table arrives in 1 or 13 partitions —
    the integrality claim is exactly this (no float reassociation)."""
    from osmflat_rs_spark.operators.graph import pagerank_uniform

    n = 40
    edges = [(u, (u * 31 + k) % n) for u in range(n) for k in (1, 2, 3)]
    a = spark.createDataFrame(edges, "src long, dst long").coalesce(1)
    b = spark.createDataFrame(edges, "src long, dst long").repartition(13)
    ra = sorted((r["node"], r["rank_scaled"]) for r in pagerank_uniform(a, n, 3, 4).collect())
    rb = sorted((r["node"], r["rank_scaled"]) for r in pagerank_uniform(b, n, 3, 4).collect())
    assert ra == rb
