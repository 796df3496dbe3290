"""Bucketed table layout: shuffle-free co-located joins.

The reference's id-dictionary join (osmflatc/src/ids.rs:96-158) avoids
data movement by construction — ids are blocked by ``id >> 24`` and each
block is locally sorted. The Spark analog at 10^12 rows is **bucketing**:
write both join sides bucketed by the join key into the session catalog,
and Catalyst plans the equi-join with NO Exchange on either side (each
bucket pair joins locally). This module wraps that pattern for the
engine's hot keys (``node_idx`` for the way→nodes FK join, ``cell`` for
spatial co-location).

Bucketing requires a table in the catalog (``saveAsTable``) — plain
parquet paths don't carry bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` bucketed (and sorted) by ``key`` into the session
    catalog (optionally as an external table at ``path``). Joins between
    tables bucketed the same way on ``key`` are planned without a shuffle
    on either side (disable auto-broadcast to see the sort-merge form)."""
    w = df.write.mode(mode).bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
