"""Deterministic dense index assignment without a global single-partition sort.

The reference assigns every entity a consecutive positional index in input
order and asserts it (osmflatc/src/main.rs:192-193, ids.rs:115-128). In
Spark a naive ``row_number() OVER (ORDER BY key)`` collapses to ONE
partition — a non-starter at 10^12 rows. This module implements the
classic scalable two-pass scheme:

1. range-partition by the sort key and sort within partitions (a single
   shuffle, each partition holds a contiguous key range);
2. count rows per partition (cheap agg), prefix-sum the counts on the
   driver (#partitions values, not rows);
3. final index = partition offset + intra-partition row_number.

The partition→offset map is tiny and broadcast via the join of a literal
DataFrame. The ``persist`` between pass 1 and 2 pins partition identity so
both passes see the same layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def assign_dense_index(
    df: DataFrame,
    sort_cols: list[str],
    out_col: str = "idx",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = 0-based dense rank of the row in ``sort_cols``
    order (keys must be distinct rows-wise for full determinism).

    Scales: one range shuffle + one tiny collect; no global sort into a
    single partition. The returned DataFrame is persisted MEMORY_AND_DISK
    (callers ingest-side materialize it anyway); unpersist when done.
    """
    spark = df.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    cols = [F.col(c) for c in sort_cols]
    part = (
        df.repartitionByRange(n_part, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = {r["_pid"]: r["cnt"] for r in part.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], schema="_pid int, _offset long"
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    out = (
        part.join(F.broadcast(off_df), "_pid")
        .withColumn(out_col, (F.row_number().over(w) - 1 + F.col("_offset")).cast("long"))
        .drop("_pid", "_offset")
    )
    return out
