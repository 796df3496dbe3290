"""Round-6 machinery: stats-reset checkpoint (the BigInt snowball fix),
disk materialization, partition-spanning-forest reduction, the CC
reduce-then-solve path, and the signed-zero ROUND restoration."""

import math
import random

from pyspark.sql import functions as F

from osmflat_rs_spark.operators.graph import (
    _partition_spanning_forest,
    _solve_components_one_task,
    connected_components,
)
from osmflat_rs_spark.plans.checkpoint import disk_materialize, fresh_local_checkpoint


def _stats_digits(df):
    return len(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))


def test_fresh_local_checkpoint_resets_stats_and_keeps_rows(spark):
    a = spark.range(200).select(F.col("id").alias("u"), (F.col("id") % 7).alias("c"))
    d = fresh_local_checkpoint(a)
    rows0 = sorted(r["u"] for r in d.collect())
    assert rows0 == list(range(200))
    base_digits = _stats_digits(d)
    # three rounds of self-joins through the checkpoint: with plain
    # localCheckpoint the sizeInBytes digit count MULTIPLIES per round
    # (the r6 Boruvka planning stall); the fresh form must stay flat
    for _ in range(3):
        j = (
            d.join(d.select(F.col("u").alias("v"), F.col("c").alias("c2")), d["c"] == F.col("c2"))
            .select("u", "c")
            .dropDuplicates(["u"])
        )
        d = fresh_local_checkpoint(j)
        assert _stats_digits(d) <= base_digits + 2
    assert sorted(r["u"] for r in d.collect()) == rows0


def test_disk_materialize_values_unchanged(spark):
    a = spark.range(1000).select("id", (F.col("id") * 3 % 11).alias("k"))
    d = disk_materialize(a)
    assert sorted((r["id"], r["k"]) for r in d.collect()) == sorted(
        (i, i * 3 % 11) for i in range(1000)
    )


def _model_components(edges):
    p = {}

    def find(x):
        p.setdefault(x, x)
        while p[x] != x:
            p[x] = p[p[x]]
            x = p[x]
        return x

    for u, v in edges:
        p.setdefault(u, u), p.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            p[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in p}


def test_spanning_forest_preserves_components_with_duplicates(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(500), rng.randrange(500)) for _ in range(3000)]
    edges = [(min(u, v), max(u, v)) for u, v in edges if u != v]
    edges += edges[:200]  # duplicates are part of the contract
    df = spark.createDataFrame(edges, "u long, v long").repartition(8)
    red = _partition_spanning_forest(df, target_edges_per_task=300)
    kept = [(r["u"], r["v"]) for r in red.collect()]
    # bound is Σ_p (nodes_p − 1), not the unique-edge count: a duplicate
    # split across partitions may be kept twice (harmless — union-find
    # consumers skip it); the contract is exact component preservation
    assert len(kept) <= len(edges)
    assert _model_components(kept) == _model_components(edges)
    solved = {r["node"]: r["component"] for r in _solve_components_one_task(red).collect()}
    model = _model_components(edges)
    # min-id labels: model roots ARE min ids by construction of find()
    assert solved == model


def test_connected_components_pre_reduce_matches_default(spark):
    rng = random.Random(11)
    edges = [(rng.randrange(300), rng.randrange(300)) for _ in range(1500)]
    edges += [(n, n) for n in (777, 888)]  # isolated self-loop nodes
    df = spark.createDataFrame(edges, "src long, dst long")
    base = {r["node"]: r["component"] for r in connected_components(df).collect()}
    fast = {
        r["node"]: r["component"]
        for r in connected_components(df, pre_reduce=True).collect()
    }
    assert base == fast
    assert fast[777] == 777 and fast[888] == 888


def test_xtrack_round_restores_duckdb_signed_zero(spark, tmp_path):
    # the engine's rounded zeros must carry the raw sign (DuckDB ROUND
    # semantics): negative raw -> -0.0, positive raw -> +0.0
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    rows = entry.queries()["xtrack_events"](spark, sf).collect()
    negz = [
        r["event_id"]
        for r in rows
        if (r["xtrack_m"] == 0.0 and math.copysign(1.0, r["xtrack_m"]) < 0)
        or (r["atrack_m"] == 0.0 and math.copysign(1.0, r["atrack_m"]) < 0)
    ]
    # the sf0.001 fixture has exactly one on-boundary event (r6 bitwise
    # audit); if the fixture ever changes this pins the MECHANISM, so
    # assert on sign consistency rather than the count alone
    assert len(negz) >= 1
    import duckdb

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")
    odf = con.sql(entry.oracle_sql()["xtrack_events"]).fetchall()
    onegz = [
        r[0]
        for r in odf
        if (r[1] == 0.0 and math.copysign(1.0, r[1]) < 0)
        or (r[2] == 0.0 and math.copysign(1.0, r[2]) < 0)
    ]
    assert sorted(negz) == sorted(onegz)
