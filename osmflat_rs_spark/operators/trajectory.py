"""Trajectory stay-point (dwell) detection — collapse each entity's
time-ordered point stream into maximal runs of consecutive points inside
the same grid cell, and keep runs that last long enough / have enough
points. This is the standard first operator of trajectory mining (Zheng
et al.'s GeoLife stay-point detection, grid-quantized form): dwells feed
OD matrices, visit counts, and home/work inference. The reference's
span-sequence invariant (ways resolve ordered node runs) is the same
gaps-and-islands shape applied to a static sequence; here the sequence
is the time axis per moving entity.

Grid quantization (vs the sequential anchor-radius original) is what
makes it one declarative plan: the anchor algorithm is an inherently
sequential per-point loop, while cell runs are a lag-diff + running sum
— W3 (consecutive-pair zip) feeding W1 (running sum), the same two
window primitives sessionization uses, fully Catalyst-planned.

Scale shape: ONE shuffle total. The window partitions by the entity
key; the per-run stats groupBy keys are (key, run_idx) — a superset of
the window's partition key, so HashPartitioning(key) already satisfies
it and Catalyst plans NO second exchange (same contract as
`sessions.session_stats`, plan-asserted in tests)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stay_points(
    events: DataFrame,
    key: str | list[str],
    cell_size: int,
    min_pts: int = 1,
    min_dwell_s: float = 0.0,
    ts_col: str = "ts",
    lat: str = "lat",
    lon: str = "lon",
    order_cols: tuple = (),
) -> DataFrame:
    """→ one row per dwell: key cols + ``cx``/``cy`` (the dwell cell),
    ``start_us``/``end_us`` (epoch µs, integer-exact cross-engine),
    ``n_pts``, ``dwell_s``.

    A dwell is a maximal run of consecutive points (ordered by
    ``ts_col`` then ``order_cols`` — pass a unique id to pin ties) whose
    floor-division grid cell is identical, with ``n_pts`` points and a
    span of at least ``min_dwell_s`` seconds. ``cell_size`` is in the
    fixed-point units of ``lat``/``lon``."""
    if cell_size < 1:
        raise ValueError(f"cell_size must be >= 1, got {cell_size}")
    keys = [key] if isinstance(key, str) else list(key)
    cs = F.lit(int(cell_size)).cast("double")
    w = Window.partitionBy(*keys).orderBy(ts_col, *order_cols)
    pts = events.select(
        *keys,
        F.col(ts_col),
        *[F.col(c) for c in order_cols],
        F.floor(F.col(lon).cast("double") / cs).cast("long").alias("cx"),
        F.floor(F.col(lat).cast("double") / cs).cast("long").alias("cy"),
    )
    # lag-diff break flag: a run breaks at the first row of each key
    # (lag is NULL -> break) and whenever the cell changes; NULL-safe
    # equality keeps semantics total even if a coordinate was NULL
    brk = F.when(
        F.col("cx").eqNullSafe(F.lag("cx").over(w))
        & F.col("cy").eqNullSafe(F.lag("cy").over(w)),
        F.lit(0),
    ).otherwise(F.lit(1))
    runs = pts.withColumn("_brk", brk).withColumn(
        "_run", F.sum("_brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    # NTZ-tolerant epoch µs (sessions._us contract: session pinned UTC,
    # so the NTZ->TZ cast is exact)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    out = (
        runs.groupBy(*keys, "_run")
        .agg(
            F.first("cx").alias("cx"),
            F.first("cy").alias("cy"),
            F.min(us).alias("start_us"),
            F.max(us).alias("end_us"),
            F.count(F.lit(1)).alias("n_pts"),
        )
        .withColumn("dwell_s", (F.col("end_us") - F.col("start_us")) / F.lit(1000000.0))
        .filter((F.col("n_pts") >= min_pts) & (F.col("dwell_s") >= float(min_dwell_s)))
        .drop("_run")
    )
    return out


def od_flows(
    dwells: DataFrame,
    key: str | list[str],
    order_col: str = "start_us",
) -> DataFrame:
    """Origin-destination flow matrix from a dwell table — the canonical
    consumer of :func:`stay_points`: each entity's dwells in time order
    yield one trip per CONSECUTIVE pair, aggregated to (from-cell,
    to-cell) flow counts with mean transit seconds. Self-flows
    (consecutive dwells in the same cell — possible when a run was
    broken by an excursion that itself produced no dwell) count like
    any other transition.

    Scale shape: one window shuffle keyed by the entity (dwell rows,
    already ≪ point rows) + one map-side-combinable groupBy on the cell
    pair. Transit time = next dwell's start − this dwell's end.

    → (from_cx, from_cy, to_cx, to_cy, n_trips, avg_transit_s)."""
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(order_col)
    trips = (
        dwells.select(
            F.col("cx").alias("from_cx"),
            F.col("cy").alias("from_cy"),
            F.lead("cx").over(w).alias("to_cx"),
            F.lead("cy").over(w).alias("to_cy"),
            (F.lead("start_us").over(w) - F.col("end_us")).alias("_transit_us"),
        )
        .filter(F.col("to_cx").isNotNull())
    )
    return trips.groupBy("from_cx", "from_cy", "to_cx", "to_cy").agg(
        F.count(F.lit(1)).alias("n_trips"),
        (F.avg("_transit_us") / F.lit(1_000_000.0)).alias("avg_transit_s"),
    )
