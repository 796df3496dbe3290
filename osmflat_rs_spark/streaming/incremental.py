"""Incremental (resumable) ingest on top of the snapshot catalog.

The reference is batch-only; its replication metadata
(flatdata/osm.flatdata:35-51) records an upstream diff cursor. Our
restatement: docs arrive as appends to the ``docs`` table; the ingest job
consumes only snapshots after its saved cursor, appends the derived
entity tables, and commits the new cursor — crash anywhere before the
cursor commit and the rerun reprocesses the same increment (idempotent:
appends are keyed by snapshot in lineage; consumers read snapshot-
consistent views).

A Structured-Streaming variant (``stream_docs_counts``) demonstrates the
same pipeline as a file-source stream with ``foreachBatch`` — for engines
fed by a live queue rather than table appends.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from osmflat_rs_spark.ingest import ingest, parse_spans
from osmflat_rs_spark.sources.catalog import SnapshotCatalog

JOB = "incremental_ingest"

DERIVED = ["nodes", "ways", "relations"]


def ingest_increment(cat: SnapshotCatalog, docs_table: str = "docs") -> dict | None:
    """Advance the compile to the docs HEAD: if the cursor is behind,
    recompile the archive from the full (snapshot-consistent) docs table
    and write each derived table as a full-rewrite snapshot, then commit
    the cursor. Returns a summary or None if already up to date.

    Semantics follow the reference compiler: the replication cursor marks
    progress through the INPUT stream (flatdata/osm.flatdata:35-51), and
    each compile yields a complete, internally-consistent archive —
    global dense indices stay valid because derived tables are rewritten
    atomically (full_rewrite snapshots), never mixed across compiles.
    Crash before the cursor commit → rerun reproduces the same state
    (idempotent)."""
    cursors = cat.load_cursor(JOB)
    inc, head = cat.read_incremental(docs_table, cursors.get(docs_table))
    if inc is None or head == cursors.get(docs_table):
        return None

    full = cat.read(docs_table)
    t_full = ingest(full, compute_metrics=False)
    summary = {}
    for name in DERIVED:
        snap = cat.append(
            name, t_full[name], job=JOB, inputs={docs_table: head}, full_rewrite=True
        )
        summary[name] = snap
    cursors[docs_table] = head
    cat.save_cursor(JOB, cursors)
    summary["cursor"] = head
    return summary


def stream_docs_counts(spark, docs_dir: str, schema, checkpoint_dir: str) -> "tuple":
    """Structured Streaming smoke pipeline: watch a directory of docs
    parquet, parse spans, maintain running span-kind counts in the
    ``memory`` sink. Returns (query, result_table_name)."""
    stream = spark.readStream.schema(schema).parquet(docs_dir)
    spans = parse_spans(stream)
    agg = spans.groupBy("kind").count()
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("span_kind_counts")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    return q, "span_kind_counts"


def stream_cell_assign(spark, docs_dir: str, schema, out_dir: str, checkpoint_dir: str, res: int = 14):
    """Streaming spatial assignment: watch a docs directory, parse node
    headers/coords IN-ROW (same expressions as batch ingest), encode the
    Morton cell, append to parquet. File source + append sink +
    checkpoint = exactly-once per input file; restarts resume from the
    checkpoint (the streaming analog of the snapshot cursor).

    Returns the StreamingQuery (caller awaits/stops)."""
    from pyspark.sql import functions as F

    from osmflat_rs_spark.functions.cells import cell_id_expr
    from osmflat_rs_spark.ingest import _keyed

    stream = spark.readStream.schema(schema).parquet(docs_dir)
    keyed = _keyed(stream)
    coord = F.get(F.filter("spans", lambda s: s["kind"] == "coord"), 0)["text"]
    nodes = keyed.filter(F.col("entity_type") == "node").select(
        "doc_id",
        "osm_id",
        F.split(coord, ",").getItem(0).cast("long").alias("lat"),
        F.split(coord, ",").getItem(1).cast("long").alias("lon"),
    )
    out = nodes.withColumn("cell", cell_id_expr(F.col("lat"), F.col("lon"), res))
    return (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_windowed_event_counts(spark, events_dir: str, schema, checkpoint_dir: str,
                                 window: str = "1 hour", watermark: str = "2 hours"):
    """Watermarked sliding-free tumbling-window aggregation over an event
    stream (the late-data pattern of SURVEY §2.9): counts per
    (event_type, window), watermark bounds state. Memory sink for tests;
    swap for a real sink in production. Returns (query, table_name)."""
    from pyspark.sql import functions as F

    stream = spark.readStream.schema(schema).parquet(events_dir)
    # event-time watermarks require TIMESTAMP (with zone); NTZ sources
    # (plain parquet timestamps) are cast — session TZ is pinned to UTC
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("windowed_event_counts")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return q, "windowed_event_counts"


def stream_dedup_first_seen(spark, docs_dir: str, schema, checkpoint_dir: str, out_dir: str):
    """STATEFUL streaming exact-dedup (applyInPandasWithState): keyed by
    content digest, only the FIRST document with a given digest is
    emitted; per-key state (first doc_id) persists across micro-batches
    AND restarts via the checkpointed state store. This is the streaming
    form of ``dedup.exact_dedup`` for continuous training-data intake.

    Parquet append sink (the memory sink cannot recover from a
    checkpoint, so it would forfeit exactly the restart semantics this
    operator exists to provide). Returns the StreamingQuery."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        StringType,
        StructField,
        StructType,
    )

    stream = spark.readStream.schema(schema).parquet(docs_dir)
    digested = stream.select(
        F.md5(F.col("text")).alias("digest"), F.col("doc_id"), F.col("text")
    )

    out_schema = StructType(
        [
            StructField("digest", StringType()),
            StructField("doc_id", StringType()),
            StructField("text", StringType()),
        ]
    )
    state_schema = StructType([StructField("first_doc_id", StringType())])

    def dedup_fn(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            # digest already emitted in an earlier batch — drain and drop
            for _ in pdfs:
                pass
            yield pd.DataFrame({"digest": [], "doc_id": [], "text": []})
            return
        # Track the min-doc_id row across ALL Arrow chunks of the group:
        # a group spanning multiple chunks must not let chunk order pick
        # the survivor (ADVICE r02 — taking only the first non-empty
        # chunk's min made large groups nondeterministic).
        first = None
        for pdf in pdfs:
            if len(pdf):
                cand = pdf.sort_values("doc_id", kind="mergesort").iloc[0]
                if first is None or str(cand["doc_id"]) < str(first["doc_id"]):
                    first = cand
        if first is not None:
            state.update((str(first["doc_id"]),))
            yield pd.DataFrame(
                {"digest": [key[0]], "doc_id": [first["doc_id"]], "text": [first["text"]]}
            )

    deduped = digested.groupBy("digest").applyInPandasWithState(
        dedup_fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
