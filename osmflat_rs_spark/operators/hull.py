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


def point_set_diameter(
    df: DataFrame,
    group_col: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Per-group farthest pair → (group, diam2, lat_a, lon_a, lat_b,
    lon_b): squared point-set diameter with the realizing pair, exact
    int64 (the "how spread out is this user's footprint" reduction).

    The classic reduction makes it scale: the farthest pair of a set
    is realized by CONVEX HULL CORNERS (squared distance along any
    segment is strictly convex, so an interior or mid-edge point can
    never even TIE a corner pair — the tie-break below therefore sees
    every candidate), so the kernel runs monotone-chain O(n log n) and
    an all-pairs scan over h corners only — O(h²) with h typically
    ≪ n. One groupBy-applyInPandas exchange, same shape as
    ``convex_hull``.

    Determinism contract: among pairs achieving the maximum d², the
    endpoints are ordered (lat, lon) ≤ (lat, lon) within the pair and
    the lexicographically smallest (lat_a, lon_a, lat_b, lon_b) wins.
    Single-point groups emit the degenerate (p, p) pair with diam2 0
    (as do all-identical groups — coordinates, not ids, are the
    output, so duplicates are indistinguishable and deterministic)."""
    slim = df.select(
        F.col(group_col).cast("long").alias("g"),
        F.col(lat_col).cast("long").alias("lat"),
        F.col(lon_col).cast("long").alias("lon"),
    )

    def _per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pts = pdf[["lat", "lon"]].to_numpy(np.int64)
        hull = _hull_of(pts)
        if len(hull) == 1:
            la, lo = int(hull[0, 0]), int(hull[0, 1])
            best = (0, la, lo, la, lo)
        else:
            diff = hull[:, None, :] - hull[None, :, :]
            span = int(np.abs(diff).max())
            if span > 2_100_000_000:
                # dx²+dy² would overflow int64 (world-span fixed-point
                # coords reach ±3.6e9): exact Python ints over the h
                # hull corners — h is small, the quadratic is cheap
                pys = [(int(a), int(b)) for a, b in hull.tolist()]
                d2m = {}
                for i, (ax, ay) in enumerate(pys):
                    for j, (bx, by) in enumerate(pys):
                        d2m[(i, j)] = (ax - bx) ** 2 + (ay - by) ** 2
                m = max(d2m.values())
                if m >= 1 << 63:
                    raise ValueError(
                        f"point_set_diameter: diam² {m} exceeds int64 for group "
                        f"{int(pdf['g'].iloc[0])} — translate coordinates to a "
                        "local origin first (the output column is BIGINT)"
                    )
                ii_jj = [k for k, v in d2m.items() if v == m]
                ii = np.array([k[0] for k in ii_jj])
                jj = np.array([k[1] for k in ii_jj])
            else:
                d2 = (diff[..., 0] ** 2 + diff[..., 1] ** 2)
                m = int(d2.max())
                ii, jj = np.nonzero(d2 == m)
            cands = []
            for i, j in zip(ii.tolist(), jj.tolist()):
                a = (int(hull[i, 0]), int(hull[i, 1]))
                b = (int(hull[j, 0]), int(hull[j, 1]))
                lo_p, hi_p = (a, b) if a <= b else (b, a)
                cands.append((m, lo_p[0], lo_p[1], hi_p[0], hi_p[1]))
            best = min(cands, key=lambda t: t[1:])
        return pd.DataFrame(
            [{
                "g": pdf["g"].iloc[0], "diam2": best[0],
                "lat_a": best[1], "lon_a": best[2],
                "lat_b": best[3], "lon_b": best[4],
            }]
        )

    out = slim.groupBy("g").applyInPandas(
        _per_group,
        schema="g long, diam2 long, lat_a long, lon_a long, lat_b long, lon_b long",
    )
    return out.select(F.col("g").alias(group_col), "diam2", "lat_a", "lon_a", "lat_b", "lon_b")
