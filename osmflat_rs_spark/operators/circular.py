"""Circular (directional) statistics over movement traces — mean
bearing, resultant length, circular variance per group (Mardia & Jupp,
Directional Statistics, 2000, ch. 2).

Headings are angles on the circle: the arithmetic mean of 359 deg and
1 deg is 180 deg, which is wrong — the correct estimator embeds angles
on the unit circle and averages the VECTORS. Everything here is pure
column arithmetic (trig + one map-side-combined groupBy): at 100 TB the
per-segment bearing is a codegen projection and the stats are one
shuffle keyed by the group, with partial aggregation upstream — the
same scale shape as any SUM.

Reference anchor: the reference computes per-way geometry folds
(osmflat/examples/road-length.rs:44-89); bearings are the directional
twin of its segment-length fold over the same consecutive-pair zip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osmflat_rs_spark.functions.geo import to_degrees


def bearing_rad(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Initial great-circle bearing (forward azimuth) in radians,
    (-pi, pi], from fixed-point integer coordinates: atan2(sin dlon *
    cos lat2, cos lat1 * sin lat2 - sin lat1 * cos lat2 * cos dlon).
    0 = north, pi/2 = east (the navigation convention)."""
    p1 = F.radians(to_degrees(lat1))
    p2 = F.radians(to_degrees(lat2))
    dl = F.radians(to_degrees(lon2)) - F.radians(to_degrees(lon1))
    return F.atan2(
        F.sin(dl) * F.cos(p2),
        F.cos(p1) * F.sin(p2) - F.sin(p1) * F.cos(p2) * F.cos(dl),
    )


def circular_stats(
    df: DataFrame,
    group_cols: list[str],
    angle_col: str = "theta",
) -> DataFrame:
    """Per-group first-order circular statistics over an angle column
    (radians) → (*group_cols, n, mean_dir, resultant, circ_var):

    - ``mean_dir`` = atan2(sum sin, sum cos), the circular mean
      direction in (-pi, pi] (0/0 -> 0.0, the fully-cancelled case —
      both engines define atan2(0, 0) = 0);
    - ``resultant`` = |mean resultant vector| in [0, 1] — 1 means all
      headings identical, 0 means fully dispersed/cancelled;
    - ``circ_var`` = 1 - resultant, the circular variance (Mardia 2.3.3).

    NULL angles are dropped (groups with none vanish). One
    map-side-combined groupBy; no window, no UDF."""
    a = F.col(angle_col)
    g = df.filter(a.isNotNull()).groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.sin(a)).alias("_s"),
        F.sum(F.cos(a)).alias("_c"),
    )
    r = F.sqrt(F.col("_s") * F.col("_s") + F.col("_c") * F.col("_c")) / F.col("n")
    return g.select(
        *group_cols,
        "n",
        F.atan2(F.col("_s"), F.col("_c")).alias("mean_dir"),
        r.alias("resultant"),
        (F.lit(1.0) - r).alias("circ_var"),
    )
