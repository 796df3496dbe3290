"""Structured Streaming surface (SURVEY §2.9): exactly-once file-source
cell assignment, watermarked windowed aggregation, and STATEFUL streaming
dedup (applyInPandasWithState) with cross-restart state via checkpoint."""

import os

import pytest
from pyspark.sql import functions as F

from osmflat_rs_spark.fixtures import docs_to_spark, generate_docs
from osmflat_rs_spark.streaming.incremental import (
    stream_cell_assign,
    stream_dedup_first_seen,
    stream_windowed_event_counts,
)

DOCS_SCHEMA = "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"


def test_stream_cell_assign_matches_batch(spark, tmp_path):
    pdf, _ = generate_docs(n_nodes=300, n_ways=40, n_rels=10)
    docs_dir, out_dir, ckpt = str(tmp_path / "docs"), str(tmp_path / "out"), str(tmp_path / "ck")
    half = len(pdf) // 2
    docs_to_spark(spark, pdf.iloc[:half]).write.mode("append").parquet(docs_dir)
    docs_to_spark(spark, pdf.iloc[half:]).write.mode("append").parquet(docs_dir)

    q = stream_cell_assign(spark, docs_dir, DOCS_SCHEMA, out_dir, ckpt, res=14)
    q.awaitTermination(120)

    got = {
        (r["osm_id"], r["cell"]) for r in spark.read.parquet(out_dir).collect()
    }
    from osmflat_rs_spark.functions.cells import cell_id_expr
    from osmflat_rs_spark.ingest import _keyed

    keyed = _keyed(spark.read.parquet(docs_dir))
    coord = F.get(F.filter("spans", lambda s: s["kind"] == "coord"), 0)["text"]
    want = {
        (r["osm_id"], r["cell"])
        for r in keyed.filter(F.col("entity_type") == "node")
        .select(
            "osm_id",
            cell_id_expr(
                F.split(coord, ",").getItem(0).cast("long"),
                F.split(coord, ",").getItem(1).cast("long"),
                14,
            ).alias("cell"),
        )
        .collect()
    }
    assert got == want and len(got) == 300


def test_stream_windowed_event_counts(spark, tmp_path):
    import shutil

    events_dir = str(tmp_path / "events")
    os.makedirs(events_dir)
    shutil.copy("/root/testdata/sf0.001/events.parquet", events_dir + "/events.parquet")
    schema = spark.read.parquet(events_dir).schema

    q, table = stream_windowed_event_counts(
        spark, events_dir, schema, str(tmp_path / "ck"), window="1 hour", watermark="2 hours"
    )
    q.awaitTermination(120)
    got = {(r["w_start"], r["event_type"]): r["n"] for r in spark.sql(f"SELECT * FROM {table}").collect()}

    ev = spark.read.parquet(events_dir)
    want_all = {
        (r["w_start"], r["event_type"]): r["n"]
        for r in ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n")
        .collect()
    }
    # append mode emits only windows sealed by the final watermark — the
    # emitted subset must agree exactly with the batch aggregation
    assert len(got) > 0
    for k, n in got.items():
        assert want_all[k] == n


def test_stream_dedup_state_survives_restart(spark, tmp_path):
    docs_dir, ckpt, out_dir = str(tmp_path / "docs"), str(tmp_path / "ck"), str(tmp_path / "dedup_out")
    b1 = spark.createDataFrame(
        [("d1", "alpha beta"), ("d2", "gamma delta")], schema="doc_id string, text string"
    )
    b1.write.mode("append").parquet(docs_dir)
    schema = "doc_id string, text string"

    q = stream_dedup_first_seen(spark, docs_dir, schema, ckpt, out_dir)
    q.awaitTermination(120)
    got1 = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert got1 == {"d1", "d2"}

    # batch 2: d3 duplicates d1's text — the restarted query must REMEMBER
    # the digest via checkpointed state and emit only the new d4
    b2 = spark.createDataFrame(
        [("d3", "alpha beta"), ("d4", "epsilon zeta")], schema="doc_id string, text string"
    )
    b2.write.mode("append").parquet(docs_dir)
    q2 = stream_dedup_first_seen(spark, docs_dir, schema, ckpt, out_dir)
    q2.awaitTermination(120)
    got2 = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert got2 == {"d1", "d2", "d4"}  # d3 suppressed by checkpointed state


def test_stream_neardup_matches_batch_and_survives_restart(spark, tmp_path):
    """The streaming MinHash-LSH candidate surfacer must (a) emit exactly
    the batch pipeline's band-sharing pairs that clear the signature-
    estimate threshold, and (b) catch pairs SPLIT ACROSS batches/restarts
    via checkpointed bucket state."""
    from osmflat_rs_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures
    from osmflat_rs_spark.streaming.incremental import stream_neardup_candidates

    base = [
        ("a1", "the quick brown fox jumps over the lazy dog tonight"),
        ("a2", "the quick brown fox jumps over the lazy dog today"),  # near-dup of a1
        ("b1", "pack my box with five dozen liquor jugs right now"),
        ("c1", "completely unrelated text about spark physical plans"),
        # near-dup pair split across the two batches:
        ("x1", "sphinx of black quartz judge my vow said the scribe"),
    ]
    later = [
        ("x2", "sphinx of black quartz judge my vow said the scribe twice"),
        ("b2", "pack my box with five dozen liquor jugs right here"),  # near-dup of b1
        ("c2", "another unrelated blob on catalyst optimizer rules"),
    ]
    docs_dir, ckpt, out_dir = str(tmp_path / "docs"), str(tmp_path / "ck"), str(tmp_path / "out")
    schema = "doc_id string, text string"
    spark.createDataFrame(base, schema=schema).write.mode("append").parquet(docs_dir)
    q = stream_neardup_candidates(spark, docs_dir, schema, ckpt, out_dir, threshold=0.5)
    q.awaitTermination(120)
    got1 = {(r["id_a"], r["id_b"]) for r in spark.read.parquet(out_dir).collect()}
    assert ("a1", "a2") in got1

    spark.createDataFrame(later, schema=schema).write.mode("append").parquet(docs_dir)
    q2 = stream_neardup_candidates(spark, docs_dir, schema, ckpt, out_dir, threshold=0.5)
    q2.awaitTermination(120)
    got = {
        (r["id_a"], r["id_b"], round(r["est_jaccard"], 9))
        for r in spark.read.parquet(out_dir).collect()
    }

    # batch expectation: band-sharing pairs whose signature-estimated
    # jaccard (matching-component fraction) clears the threshold
    all_docs = spark.createDataFrame(base + later, schema=schema)
    sigs = {
        r["_id"]: [r[f"sig_{i}"] for i in range(8)]
        for r in minhash_signatures(all_docs, "doc_id", "text").collect()
    }
    cand = lsh_candidate_pairs(minhash_signatures(all_docs, "doc_id", "text")).collect()
    want = set()
    for r in cand:
        a, b = r["id_a"], r["id_b"]
        est = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y) / 8.0
        if est >= 0.5:
            want.add((a, b, round(est, 9)))
    assert {(a, b, e) for a, b, e in got} == want
    # the cross-batch pair was caught by checkpointed state
    assert any(p[:2] == ("x1", "x2") for p in got)
    assert any(p[:2] == ("b1", "b2") for p in got)


def test_stream_neardup_capped_state_subset_semantics(spark, tmp_path):
    """VERDICT r03 #6: under ``max_state_per_bucket`` a bucket stops
    GROWING at the cap; overflow docs are still compared against the
    stored set, but never against each other — so the capped run emits a
    deterministic SUBSET of the uncapped output: pairs (stored, x) for
    every later x, and no (overflow, overflow) pairs. The semantics are
    PER BUCKET: identical texts make all three docs share every band
    bucket, so with cap=1 the first-seen doc is the only stored one
    anywhere and the overflow pair can appear in no bucket at all."""
    from osmflat_rs_spark.streaming.incremental import stream_neardup_candidates

    text = "the quick brown fox jumps over the lazy dog tonight"
    batch1 = [("d1", text)]
    batch2 = [("d2", text), ("d3", text)]
    schema = "doc_id string, text string"

    def run(cap, sub):
        docs_dir = str(tmp_path / sub / "docs")
        ckpt = str(tmp_path / sub / "ck")
        out = str(tmp_path / sub / "out")
        spark.createDataFrame(batch1, schema=schema).write.mode("append").parquet(docs_dir)
        q = stream_neardup_candidates(
            spark, docs_dir, schema, ckpt, out, threshold=0.5, max_state_per_bucket=cap
        )
        q.awaitTermination(120)
        spark.createDataFrame(batch2, schema=schema).write.mode("append").parquet(docs_dir)
        q2 = stream_neardup_candidates(
            spark, docs_dir, schema, ckpt, out, threshold=0.5, max_state_per_bucket=cap
        )
        q2.awaitTermination(120)
        return {(r["id_a"], r["id_b"]) for r in spark.read.parquet(out).collect()}

    uncapped = run(None, "uncapped")
    capped = run(1, "capped")
    assert {("d1", "d2"), ("d1", "d3"), ("d2", "d3")} <= uncapped
    # stored d1 still pairs with every later arrival …
    assert ("d1", "d2") in capped and ("d1", "d3") in capped
    # … but two overflow docs are never compared with each other
    assert ("d2", "d3") not in capped
    assert capped < uncapped  # strict, deterministic subset


def test_stream_neardup_capped_overflow_always_links(spark, tmp_path):
    """VERDICT r04 #7 — the LINKAGE guarantee under the cap, asserted
    explicitly: with ``max_state_per_bucket >= 1``, a bucket that is
    already full still compares every overflow arrival against its
    stored representatives, so EVERY overflow near-dup surfaces in ≥1
    pair (it is deduplicable via its stored rep; what's lost is only
    overflow↔overflow linkage). Six identical docs, cap=2: d3..d6 are
    all overflow, and each must appear in some emitted pair."""
    from osmflat_rs_spark.streaming.incremental import stream_neardup_candidates

    text = "the quick brown fox jumps over the lazy dog tonight"
    docs_dir = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    schema = "doc_id string, text string"
    all_ids = [f"d{i}" for i in range(1, 7)]
    spark.createDataFrame([(d, text) for d in all_ids], schema=schema).write.mode(
        "append"
    ).parquet(docs_dir)
    q = stream_neardup_candidates(
        spark, docs_dir, schema, ckpt, out, threshold=0.5, max_state_per_bucket=2
    )
    q.awaitTermination(120)
    pairs = {(r["id_a"], r["id_b"]) for r in spark.read.parquet(out).collect()}
    linked = {d for p in pairs for d in p}
    # every doc beyond the first (stored or overflow) links to some rep
    missing = set(all_ids[1:]) - linked
    assert not missing, f"overflow docs with no surfaced pair: {missing} (pairs={pairs})"


def test_stream_pip_assign_docs_matches_batch_and_is_exactly_once(spark, tmp_path):
    """Stream-static PIP join: interleaved docs arriving as files are
    parsed in-row and assigned to polygons via the batch pip_join kernel
    composed onto the stream. Result set must equal the batch pip_join
    over the same docs; a restart with a drained source appends nothing
    (exactly-once per input file)."""
    from osmflat_rs_spark.fixtures import generate_polygons, polygons_to_spark
    from osmflat_rs_spark.ingest import _keyed
    from osmflat_rs_spark.operators.spatial_join import pip_join
    from osmflat_rs_spark.streaming.incremental import stream_pip_assign

    pdf, _ = generate_docs(n_nodes=400, n_ways=40, n_rels=10)
    polys = polygons_to_spark(spark, generate_polygons(n_poly=6))
    docs_dir, out_dir, ckpt = str(tmp_path / "docs"), str(tmp_path / "out"), str(tmp_path / "ck")
    half = len(pdf) // 2
    docs_to_spark(spark, pdf.iloc[:half]).write.mode("append").parquet(docs_dir)
    docs_to_spark(spark, pdf.iloc[half:]).write.mode("append").parquet(docs_dir)

    q = stream_pip_assign(
        spark, docs_dir, DOCS_SCHEMA, polys, out_dir, ckpt, parse_docs=True
    )
    q.awaitTermination(180)
    out_rows = spark.read.parquet(out_dir).collect()
    got = {(r["polygon_id"], r["osm_id"]) for r in out_rows}
    assert len(out_rows) == len(got)  # no duplicate assignments

    keyed = _keyed(spark.read.parquet(docs_dir))
    coord = F.get(F.filter("spans", lambda s: s["kind"] == "coord"), 0)["text"]
    nodes = keyed.filter(F.col("entity_type") == "node").select(
        "osm_id",
        F.split(coord, ",").getItem(0).cast("long").alias("lat"),
        F.split(coord, ",").getItem(1).cast("long").alias("lon"),
    )
    want = {
        (r["polygon_id"], r["osm_id"])
        for r in pip_join(nodes, polys, point_id="osm_id").collect()
    }
    assert got == want and len(got) > 0

    # restart on the drained source: checkpoint says all files consumed
    q2 = stream_pip_assign(
        spark, docs_dir, DOCS_SCHEMA, polys, out_dir, ckpt, parse_docs=True
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == len(out_rows)


def test_stream_hist_partials_matches_batch_across_restart(spark, tmp_path):
    """The streaming histogram (partial-sketch append + merge-on-read)
    must equal the batch `hist_build` over all data after a chunked
    arrival WITH a restart between chunks, and the replayed batch must
    not double-count (exactly-once by per-batch-dir idempotence)."""
    from osmflat_rs_spark.operators.sketch import hist_build, hist_quantiles
    from osmflat_rs_spark.streaming.incremental import (
        hist_from_partials,
        stream_hist_partials,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    schema = events.schema
    lo, hi, bins = 0.0, 1000.0, 64

    events_dir = str(tmp_path / "events")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "hist")
    os.makedirs(events_dir)

    a, b = events.randomSplit([0.5, 0.5], seed=7)
    a.write.mode("append").parquet(events_dir)
    q = stream_hist_partials(spark, events_dir, schema, ck, out, "value", lo, hi, bins)
    q.awaitTermination(120)

    # second chunk arrives; restart from the SAME checkpoint
    b.write.mode("append").parquet(events_dir)
    q = stream_hist_partials(spark, events_dir, schema, ck, out, "value", lo, hi, bins)
    q.awaitTermination(120)

    got = {r["bin"]: r["cnt"] for r in hist_from_partials(spark, out).collect()}
    want = {
        r["bin"]: r["cnt"]
        for r in hist_build(events, "value", lo, hi, bins).collect()
    }
    assert got == want and sum(got.values()) > 0

    # a replayed/no-new-data restart must not double-count
    q = stream_hist_partials(spark, events_dir, schema, ck, out, "value", lo, hi, bins)
    q.awaitTermination(120)
    again = {r["bin"]: r["cnt"] for r in hist_from_partials(spark, out).collect()}
    assert again == want

    # quantiles off the merged sketch equal quantiles off the batch sketch
    m = hist_from_partials(spark, out)
    bt = hist_build(events, "value", lo, hi, bins)
    gq = {r["q"]: r["est"] for r in hist_quantiles(m, [0.5, 0.9], lo, hi, bins).collect()}
    wq = {r["q"]: r["est"] for r in hist_quantiles(bt, [0.5, 0.9], lo, hi, bins).collect()}
    assert gq == wq


def test_stream_cms_partials_heavy_hitters_match_batch(spark, tmp_path):
    """Streaming CM via partial append: after chunked arrival with a
    restart, the merged sketch equals the batch sketch COUNTER-WISE,
    and heavy-hitter estimates off it match the batch path."""
    from osmflat_rs_spark.operators.sketch import cms_build, cms_estimate
    from osmflat_rs_spark.streaming.incremental import (
        cms_from_partials,
        stream_cms_partials,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    schema = events.schema
    src = str(tmp_path / "ev")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "cms")
    os.makedirs(src)

    a, b = events.randomSplit([0.5, 0.5], seed=3)
    a.write.mode("append").parquet(src)
    stream_cms_partials(spark, src, schema, ck, out, "user_id").awaitTermination(120)
    b.write.mode("append").parquet(src)
    stream_cms_partials(spark, src, schema, ck, out, "user_id").awaitTermination(120)

    merged = cms_from_partials(spark, out)
    batch = cms_build(events, "user_id")
    got = {(r["r"], r["c"]): r["cnt"] for r in merged.collect()}
    want = {(r["r"], r["c"]): r["cnt"] for r in batch.collect()}
    assert got == want and len(got) > 0

    keys = events.select("user_id").distinct().limit(20)
    est_s = {r["user_id"]: r["est"] for r in cms_estimate(merged, keys, "user_id").collect()}
    est_b = {r["user_id"]: r["est"] for r in cms_estimate(batch, keys, "user_id").collect()}
    assert est_s == est_b


def test_stream_cell_count_partials_hotspots_match_batch(spark, tmp_path):
    """Streaming hotspot-map maintenance: after chunked arrival with a
    restart, hotspot_from_cell_counts over the merged (cx, cy, n)
    partials must equal the batch hotspot_clusters cell labels on the
    same points — and min_pts stays a read-time knob (two different cuts
    of the SAME maintained partials both match batch)."""
    from pyspark.sql import functions as F

    from osmflat_rs_spark.operators.hotspot import (
        cell_counts,
        hotspot_clusters,
        hotspot_from_cell_counts,
    )
    from osmflat_rs_spark.streaming.incremental import stream_cell_count_partials

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id",
        (F.lit(524_000_000) + (F.col("event_id") * 48271) % 100_000).cast("long").alias("lat"),
        (F.lit(132_000_000) + (F.col("event_id") * 16807) % 200_000).cast("long").alias("lon"),
    )
    schema = events.schema
    cs = 10_000

    events_dir = str(tmp_path / "events")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "cells")
    os.makedirs(events_dir)

    a, b = events.randomSplit([0.5, 0.5], seed=11)
    a.write.mode("append").parquet(events_dir)
    q = stream_cell_count_partials(spark, events_dir, schema, ck, out, cs)
    q.awaitTermination(120)
    b.write.mode("append").parquet(events_dir)
    q = stream_cell_count_partials(spark, events_dir, schema, ck, out, cs)
    q.awaitTermination(120)

    merged = spark.read.parquet(out)
    # counts partial-merge equals batch counts
    got_counts = {(r["cx"], r["cy"]): r["n"] for r in
                  merged.groupBy("cx", "cy").agg(F.sum("n").alias("n")).collect()}
    want_counts = {(r["cx"], r["cy"]): r["n"] for r in cell_counts(events, cs).collect()}
    assert got_counts == want_counts and len(got_counts) > 50

    for min_pts in (4, 6):  # read-time density knob (cell counts span 3..7)
        got = {(r["cx"], r["cy"]): r["cluster"]
               for r in hotspot_from_cell_counts(merged, min_pts).collect()}
        want = {(r["cx"], r["cy"]): r["cluster"]
                for r in hotspot_clusters(events, cs, min_pts).select(
                    "cx", "cy", "cluster").distinct().collect()}
        assert got == want, min_pts
        assert len(got) > 0


def test_stream_zonal_partials_matches_batch(spark, tmp_path):
    """Streaming zonal statistics: after chunked arrival with a restart,
    zonal_from_partials over the appended per-batch partials must equal
    batch zonal_stats on the same points — counts/min/max exactly, the
    float sums to IEEE-reassociation tolerance (different grouping of
    the same addends)."""
    import os as _os

    from pyspark.sql import functions as F

    from osmflat_rs_spark.fixtures import generate_polygons, polygons_to_spark
    from osmflat_rs_spark.operators.spatial_join import zonal_from_partials, zonal_stats
    from osmflat_rs_spark.streaming.incremental import stream_zonal_partials

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id",
        (F.lit(524_000_000) + (F.col("event_id") * 48271) % 2_000_000).cast("long").alias("lat"),
        (F.lit(132_000_000) + (F.col("event_id") * 16807) % 4_000_000).cast("long").alias("lon"),
        F.col("value"),
    )
    polys = polygons_to_spark(spark, generate_polygons(n_poly=6))
    schema = events.schema

    events_dir = str(tmp_path / "events")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "zonal")
    _os.makedirs(events_dir)

    a, b = events.randomSplit([0.5, 0.5], seed=7)
    a.write.mode("append").parquet(events_dir)
    q = stream_zonal_partials(spark, events_dir, schema, ck, out, polys, "value")
    q.awaitTermination(120)
    b.write.mode("append").parquet(events_dir)
    q = stream_zonal_partials(spark, events_dir, schema, ck, out, polys, "value")
    q.awaitTermination(120)

    got = {r["polygon_id"]: r for r in
           zonal_from_partials(spark.read.parquet(out)).collect()}
    want = {r["polygon_id"]: r for r in
            zonal_stats(events, polys, "value", point_id="event_id").collect()}
    assert set(got) == set(want) and len(want) >= 2
    for pid, w in want.items():
        g = got[pid]
        assert g["n_pts"] == w["n_pts"]
        assert g["min_val"] == w["min_val"] and g["max_val"] == w["max_val"]
        assert abs(g["sum_val"] - w["sum_val"]) < 1e-6 * max(1.0, abs(w["sum_val"]))
        assert abs(g["avg_val"] - w["avg_val"]) < 1e-9 * max(1.0, abs(w["avg_val"]))


def test_stream_movement_profile_stitch_and_late_drop(spark, tmp_path):
    """Two availableNow runs: the batch-boundary pair is emitted exactly
    once (state stitch), and a fix older than the state's last fix is
    dropped by the documented contract."""
    from datetime import datetime

    from osmflat_rs_spark.streaming.incremental import stream_movement_profile

    pts_dir, ckpt, out = str(tmp_path / "pts"), str(tmp_path / "ck"), str(tmp_path / "out")
    schema = "user_id long, ts timestamp, event_id long, lat long, lon long"

    def ts(s):
        return datetime(2024, 1, 1, 0, 0, s)

    b1 = [(1, ts(0), 1, 0, 0), (1, ts(1), 2, 0, 10)]
    spark.createDataFrame(b1, schema).write.mode("append").parquet(pts_dir)
    q = stream_movement_profile(spark, pts_dir, schema, ckpt, out, 5)
    assert q.awaitTermination(120)
    # batch 2: one in-order fix (stitches with ts(1)) and one LATE fix
    late = datetime(2024, 1, 1, 0, 0, 0, 500_000)  # OLDER than state's ts(1)
    b2 = [(1, ts(3), 3, 0, 30), (1, late, 9, 99, 99)]
    spark.createDataFrame(b2, schema).write.mode("append").parquet(pts_dir)
    q = stream_movement_profile(spark, pts_dir, schema, ckpt, out, 5)
    assert q.awaitTermination(120)
    rows = sorted(
        ((r["t0_us"], r["dt_us"], r["d2"], r["sector"], r["speeding"])
         for r in spark.read.parquet(out).collect())
    )
    # pairs: (t0)->(t1) d2=100 E speeding; (t1)->(t3) d2=400, dt=2s,
    # 400 > 25*4 -> speeding. The late 0.5s fix appears NOWHERE.
    base = 1_704_067_200_000_000  # 2024-01-01 epoch us
    assert rows == [
        (base, 1_000_000, 100, "E", True),
        (base + 1_000_000, 2_000_000, 400, "E", True),
    ]


def test_stream_adaptive_partials_matches_batch(spark, tmp_path):
    """Streaming adaptive quadtree: after chunked arrival with a
    restart, adaptive_from_partials over the appended finest-cell
    partials must equal batch adaptive_grid EXACTLY (counts are
    integers — re-summing partials is the batch aggregate), and cap
    stays a read-time knob (two caps cut from the same partials)."""
    import os as _os

    from pyspark.sql import functions as F

    from osmflat_rs_spark.operators.tiling import adaptive_grid
    from osmflat_rs_spark.streaming.incremental import (
        adaptive_from_partials,
        stream_adaptive_partials,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id",
        (F.lit(524_000_000) + (F.col("event_id") * 48271) % 2_000_000).cast("long").alias("lat"),
        (F.lit(132_000_000) + (F.col("event_id") * 16807) % 4_000_000).cast("long").alias("lon"),
    )
    schema = events.schema
    events_dir = str(tmp_path / "events")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "adaptive")
    _os.makedirs(events_dir)

    max_level = 18
    a, b = events.randomSplit([0.5, 0.5], seed=11)
    a.write.mode("append").parquet(events_dir)
    q = stream_adaptive_partials(spark, events_dir, schema, ck, out, max_level)
    q.awaitTermination(120)
    b.write.mode("append").parquet(events_dir)
    q = stream_adaptive_partials(spark, events_dir, schema, ck, out, max_level)
    q.awaitTermination(120)

    partials = spark.read.parquet(out)
    for cap in (5, 40):
        got = {(r["level"], r["ix"], r["iy"]): r["n"]
               for r in adaptive_from_partials(partials, max_level, cap).collect()}
        want = {(r["level"], r["ix"], r["iy"]): r["n"]
                for r in adaptive_grid(events, max_level=max_level, cap=cap).collect()}
        assert got == want and len(want) > 1
        assert sum(got.values()) == events.count()


def test_stream_funnel_matches_batch(spark, tmp_path):
    """Two availableNow runs split IN TIME against one checkpoint: the
    unioned step-completion appends must pivot to exactly the batch
    funnel (cross-batch state stitch: a funnel that starts in run 1 and
    completes in run 2 emits each step exactly once)."""
    import os as _os

    from pyspark.sql import functions as F

    from osmflat_rs_spark.operators.sessions import funnel_steps
    from osmflat_rs_spark.streaming.incremental import stream_funnel_steps

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "ts", "user_id", "event_type"
    )
    steps = ["view", "click", "purchase"]
    schema = events.schema
    src = str(tmp_path / "events")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "funnel")
    _os.makedirs(src)

    # split BY TIME so the per-user non-decreasing-event-time contract
    # holds across the two runs by construction, and funnels genuinely
    # straddle the batch boundary
    tmu = F.unix_micros(F.col("ts").cast("timestamp"))
    mid = events.select(tmu.alias("t")).approxQuantile("t", [0.5], 0.0)[0]
    a = events.filter(tmu <= mid)
    b = events.filter(tmu > mid)
    assert a.count() > 0 and b.count() > 0

    a.write.mode("append").parquet(src)
    q = stream_funnel_steps(spark, src, schema, ck, out, steps)
    q.awaitTermination(120)
    b.write.mode("append").parquet(src)
    q = stream_funnel_steps(spark, src, schema, ck, out, steps)
    q.awaitTermination(120)

    got_rows = spark.read.parquet(out).collect()
    got = {}
    for r in got_rows:
        got.setdefault(int(r["user"]), {})[r["step"]] = r["ts_us"]
    want = {}
    for r in funnel_steps(events, steps).collect():
        w = {}
        for i in (1, 2, 3):
            v = r[f"ts_step{i}"]
            if v is not None:
                w[i] = int(v.timestamp() * 1_000_000)
        want[r["user_id"]] = w
    assert got == want
    # each completion emitted exactly once
    assert len(got_rows) == sum(len(w) for w in want.values())


def test_stream_merge_intervals_matches_batch_minus_open_runs(spark, tmp_path):
    """Time-split two-run replay against one checkpoint: the union of
    streamed appends equals batch merge_intervals minus each entity's
    LAST (still-open) run; a batch-straddling run is emitted exactly
    once; a late start is dropped by the documented contract."""
    from osmflat_rs_spark.operators.intervals import merge_intervals
    from osmflat_rs_spark.streaming.incremental import stream_merge_intervals

    src, ckpt, out = str(tmp_path / "iv"), str(tmp_path / "ck"), str(tmp_path / "out")
    schema = "user_id long, s long, e long"
    # u1: [0,10],[5,20] | split | [30,35],[50,51] -> runs (0,20,2),(30,35,1) closed, (50,51,1) open
    # u2: [0,3] | split | [2,9] straddles the batch boundary (2 <= 3 -> same run, stays open)
    # u3: [10,12] | split | [0,1] LATE (start < last_s) -> dropped
    b1 = [(1, 0, 10), (1, 5, 20), (2, 0, 3), (3, 10, 12)]
    b2 = [(1, 30, 35), (1, 50, 51), (2, 2, 9), (3, 0, 1)]
    spark.createDataFrame(b1, schema).write.mode("append").parquet(src)
    q = stream_merge_intervals(spark, src, schema, ckpt, out)
    assert q.awaitTermination(120)
    spark.createDataFrame(b2, schema).write.mode("append").parquet(src)
    q = stream_merge_intervals(spark, src, schema, ckpt, out)
    assert q.awaitTermination(120)
    got = sorted(
        (int(r["entity"]), r["m_start"], r["m_end"], r["n_source"])
        for r in spark.read.parquet(out).collect()
    )
    assert got == [(1, 0, 20, 2), (1, 30, 35, 1)]
    # batch parity: appends == batch output minus each entity's last run
    # (computed over the NON-LATE rows, per the stated ordering contract)
    batch_in = spark.createDataFrame(
        [r for r in b1 + b2 if r != (3, 0, 1)], schema
    )
    batch = {
        (r["user_id"], r["m_start"], r["m_end"], r["n_source"])
        for r in merge_intervals(batch_in, "user_id", "s", "e").collect()
    }
    open_runs = {(1, 50, 51, 1), (2, 0, 9, 2), (3, 10, 12, 1)}
    assert set(got) == batch - open_runs


def test_stream_cusum_matches_batch_scan(spark, tmp_path):
    """Replaying the corpus in two availableNow micro-batch runs against
    one checkpoint appends EXACTLY the batch cusum_scan rows
    (bit-identical ints — the shared-kernel parity contract), and a late
    row (o <= state's last o) is dropped by contract."""
    from osmflat_rs_spark.operators.trend import cusum_scan
    from osmflat_rs_spark.streaming.incremental import stream_cusum

    ev_dir, ckpt, out = str(tmp_path / "ev"), str(tmp_path / "ck"), str(tmp_path / "out")
    schema = "event_type string, event_id long, value double"
    import numpy as np

    rng = np.random.default_rng(131)
    rows = []
    for o in range(200):
        for k in ("a", "b"):
            v = float(rng.uniform(0, 100)) + (60.0 if (k == "a" and o > 120) else 0.0)
            rows.append((k, o * 2 + (0 if k == "a" else 1), v))
    half = len(rows) // 2
    rows.sort(key=lambda r: r[1])
    spark.createDataFrame(rows[:half], schema).write.mode("append").parquet(ev_dir)
    q = stream_cusum(spark, ev_dir, schema, ckpt, out, mu=5000, slack=1000, h=20000)
    assert q.awaitTermination(120)
    # second batch: the rest, plus one LATE row (o=0 again) that must drop
    late = [("a", 0, 999.0)]
    spark.createDataFrame(rows[half:] + late, schema).write.mode("append").parquet(ev_dir)
    q = stream_cusum(spark, ev_dir, schema, ckpt, out, mu=5000, slack=1000, h=20000)
    assert q.awaitTermination(120)
    got = sorted(
        (r["key"], r["o"], r["v"], r["s_hi"], r["s_lo"], r["alarm"])
        for r in spark.read.parquet(out).collect()
    )
    bdf = spark.createDataFrame(rows, schema).select(
        "event_type", "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("v"),
    )
    want = sorted(
        (r["key"], r["o"], r["v"], r["s_hi"], r["s_lo"], r["alarm"])
        for r in cusum_scan(bdf, "event_type", "event_id", "v",
                            mu=5000, slack=1000, h=20000).collect()
    )
    assert got == want
    # drift was planted in key 'a' after o>240: alarms fire there only
    assert any(a for k, o, v, sh, sl, a in got if k == "a")


def test_stream_trending_partials_equal_batch(spark):
    """Decayed-count partials streamed through stream_sketch_partials
    and merged on read reproduce the batch trending_topk output
    exactly — rank, count and score bit-for-bit."""
    import shutil
    import tempfile

    import numpy as np

    from osmflat_rs_spark.operators.sketch import (
        decayed_count_partial,
        trending_topk,
        trending_topk_from_partials,
    )
    from osmflat_rs_spark.streaming.incremental import stream_sketch_partials

    rng = np.random.default_rng(347)
    rows = [
        ("g%d" % (i % 3), "it%02d" % int(rng.integers(0, 20)), int(rng.integers(0, 5000)))
        for i in range(3000)
    ]
    sdf = spark.createDataFrame(rows, "g string, item string, age long")
    tmp = tempfile.mkdtemp(prefix="stream_trend_")
    src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ck"
    try:
        # three separate appends -> three micro-batch files
        for lo, hi in ((0, 1000), (1000, 2000), (2000, 3000)):
            spark.createDataFrame(rows[lo:hi], "g string, item string, age long").write.mode(
                "append"
            ).parquet(src)
        q = stream_sketch_partials(
            spark, src, "g string, item string, age long", ckpt, out,
            lambda b: decayed_count_partial(b, "g", "item", "age", half_life=800),
        )
        assert q.awaitTermination(300)
        merged = trending_topk_from_partials(
            spark.read.parquet(out), "g", "item", n=5, fp=10**12
        )
        got = sorted(tuple(r) for r in merged.collect())
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    want = sorted(
        tuple(r)
        for r in trending_topk(sdf, "g", "item", "age", n=5, half_life=800).collect()
    )
    assert got == want and len(got) == 15


def test_stream_trending_partials_fail_loudly_on_negative_age(spark):
    """A partial whose (group, item) mixes a negative age with valid
    rows must be rejected at read time, not silently undercounted."""
    import pytest as _pytest

    from osmflat_rs_spark.operators.sketch import (
        decayed_count_partial,
        trending_topk_from_partials,
    )

    df = spark.createDataFrame(
        [("g", "i", 5), ("g", "i", -1), ("g", "j", 3)], "g string, item string, age long"
    )
    part = decayed_count_partial(df, "g", "item", "age", half_life=100)
    rows = {(r["g"], r["item"]): r.asDict() for r in part.collect()}
    assert rows[("g", "i")]["n_invalid"] == 1 and rows[("g", "j")]["n_invalid"] == 0
    with _pytest.raises(ValueError, match="n_invalid"):
        trending_topk_from_partials(part, "g", "item", n=5)
