"""Per-group convex hull (strict corners) — the classic geometry reduce
over point groups (per-region footprints, per-trajectory extents).
Reference analog: the bbox fold of osmflat's examples is the axis-
aligned special case; the hull is its exact generalization.

Semantics: hull VERTICES are the strict corners of the convex hull of
the group's DISTINCT points — collinear boundary points are excluded
(Andrew's monotone chain with strict turns, the standard published
construction). Degenerate groups: all-collinear → the two endpoints;
a single distinct point → itself.

Scale shape: one shuffle on the group key (`applyInPandas`), state and
work bounded by the largest single group — the same contract as the
in-row ring operators (shoelace, simplify_radial); nothing is
corpus-global. Turn tests use the segments module's exact orientation
(`_orient_signs`: float64 forward-error filter + arbitrary-precision
fallback), so the hull is exact at planet-scale fixed-point coordinates
where int64 cross products overflow.

The driver gate's oracle is an INDEPENDENT formulation (Carathéodory in
2-D): p is a non-vertex iff some triangle of three OTHER distinct
points contains it inside-or-on — evaluated in exact HUGEINT SQL with a
bbox guard so degenerate (collinear) triangles only capture points
within their span. Two different constructions, one semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .segments import _orient_signs


def _turn(a, b, c) -> int:
    """Exact sign of the turn a→b→c (scalar wrapper of _orient_signs)."""
    return int(
        _orient_signs(
            np.array([a[0]]), np.array([a[1]]),
            np.array([b[0]]), np.array([b[1]]),
            np.array([c[0]]), np.array([c[1]]),
        )[0]
    )


def _hull_of(points: np.ndarray) -> np.ndarray:
    """Monotone chain, strict turns → hull corners, CCW from min point."""
    pts = np.unique(points, axis=0)  # dedup + lexicographic sort
    if len(pts) <= 2:
        return pts
    def half(seq):
        h = []
        for p in seq:
            while len(h) >= 2 and _turn(h[-2], h[-1], p) <= 0:
                h.pop()
            h.append(tuple(p))
        return h
    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1], dtype=np.int64)


def convex_hull(
    df: DataFrame,
    group_col: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """(group, lat, lon) rows — one per hull corner of the group.
    Integer (castable-to-long) group keys and fixed-point coords."""
    slim = df.select(
        F.col(group_col).cast("long").alias("g"),
        F.col(lat_col).cast("long").alias("lat"),
        F.col(lon_col).cast("long").alias("lon"),
    )

    def _per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pts = pdf[["lat", "lon"]].to_numpy(np.int64)
        hull = _hull_of(pts)
        return pd.DataFrame(
            {"g": pdf["g"].iloc[0], "lat": hull[:, 0], "lon": hull[:, 1]}
        )

    out = slim.groupBy("g").applyInPandas(_per_group, schema="g long, lat long, lon long")
    return out.select(F.col("g").alias(group_col), "lat", "lon")
