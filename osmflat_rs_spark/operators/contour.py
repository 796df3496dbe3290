"""Marching-squares iso-contour extraction over a sparse grid surface.

Turns a cell-value table — the output shape of ``tiling.focal_grid_agg``
/ ``tiling.kde_grid`` / a plain per-cell count — into contour LINE
SEGMENTS at a given level: the vectorization step that makes a density
surface renderable by the engine's SVG/JSON sinks (reference anchor:
the reference renders its per-pixel accumulation raster directly,
render-roads.rs; a contour is that raster's level-set re-expressed as
vectors, the standard heatmap→isoline step).

Semantics — classic marching squares on the 2×2 blocks of the grid:

- The field is the cell table with MISSING CELLS = 0 (sparse surfaces:
  contours close cleanly around occupied regions without the caller
  materializing the empty universe).
- A corner is "inside" iff value > level, strictly. Callers contouring
  integer count surfaces should pick a half-integer level (the gate
  uses 2.5): no corner can then sit exactly ON the contour, which is
  the degenerate case where marching squares conventions diverge.
- Crossing points are linear interpolation along block edges:
  t = (level − v_a)/(v_b − v_a) — referenced only when the edge
  strictly straddles the level, so the division is never 0/0.
- Saddles (cases 5/10) are disambiguated by the block-center average
  (> level connects the high diagonal) — deterministic, and mirrored
  literally by the SQL oracle.
- Output: (bx, by, x0, y0, x1, y1) per segment, coordinates in GLOBAL
  grid units (block origin + local crossing offset, doubles); blocks
  emit 0, 1, or 2 segments.

Scale shape: fan each occupied cell to the ≤4 blocks it corners (an
in-row ``explode(sequence)`` pair — ×4 on the REDUCED cell table, never
on raw points), one groupBy(block) with conditional-max corner pivot —
the operator's single shuffle — then the case table and interpolation
as one codegen projection. Same aggregate-first discipline as
``focal_grid_agg``: at 100 TB the cell table is the small thing, and
everything after the first count shuffle is grid-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: case → segment list; each segment a pair of edge names. Edges: S
#: between corners (0,0)-(1,0), E (1,0)-(1,1), N (0,1)-(1,1), W
#: (0,0)-(0,1). Case bit i set iff corner v_i > level, corners indexed
#: dx + 2·dy. Saddles 5/10 handled separately (center rule).
_CASE_SEGS = {
    1: [("W", "S")],
    2: [("S", "E")],
    3: [("W", "E")],
    4: [("E", "N")],
    6: [("S", "N")],
    7: [("W", "N")],
    8: [("N", "W")],
    9: [("S", "N")],
    11: [("E", "N")],
    12: [("W", "E")],
    13: [("S", "E")],
    14: [("W", "S")],
}


def contour_segments(
    grid: DataFrame,
    value_col: str,
    level: float,
    ix_col: str = "ix",
    iy_col: str = "iy",
) -> DataFrame:
    """→ DataFrame(bx, by, x0, y0, x1, y1) — marching-squares contour
    segments of the sparse (ix, iy, value) surface at ``level`` (missing
    cells read as 0; coordinates in grid units; see module docstring for
    the exact conventions the SQL oracle mirrors)."""
    L = F.lit(float(level))
    g = grid.select(
        F.col(ix_col).cast("long").alias("_ix"),
        F.col(iy_col).cast("long").alias("_iy"),
        F.col(value_col).cast("double").alias("_v"),
    )
    # each cell corners the 4 blocks (ix-1..ix) x (iy-1..iy); corner
    # index within a block = dx + 2*dy
    fan = (
        g.withColumn("bx", F.explode(F.sequence(F.col("_ix") - 1, F.col("_ix"))))
        .withColumn("by", F.explode(F.sequence(F.col("_iy") - 1, F.col("_iy"))))
        .select(
            "bx",
            "by",
            ((F.col("_ix") - F.col("bx")) + (F.col("_iy") - F.col("by")) * 2).alias("_c"),
            "_v",
        )
    )
    blk = fan.groupBy("bx", "by").agg(
        *[
            F.coalesce(F.max(F.when(F.col("_c") == i, F.col("_v"))), F.lit(0.0)).alias(f"v{i}")
            for i in range(4)
        ]
    )
    v00, v10, v01, v11 = F.col("v0"), F.col("v1"), F.col("v2"), F.col("v3")
    case = (
        (v00 > L).cast("int")
        + (v10 > L).cast("int") * 2
        + (v11 > L).cast("int") * 4
        + (v01 > L).cast("int") * 8
    )

    def interp(va: Column, vb: Column) -> Column:
        d = vb - va
        return F.when(d != F.lit(0.0), (L - va) / d)

    pts = {
        "S": (interp(v00, v10), F.lit(0.0)),
        "E": (F.lit(1.0), interp(v10, v11)),
        "N": (interp(v01, v11), F.lit(1.0)),
        "W": (F.lit(0.0), interp(v00, v01)),
    }

    def seg(a: str, b: str) -> Column:
        (ax, ay), (bx_, by_) = pts[a], pts[b]
        return F.struct(ax.alias("x0"), ay.alias("y0"), bx_.alias("x1"), by_.alias("y1"))

    center = (v00 + v10 + v01 + v11) / F.lit(4.0)
    expr = None
    for c, pairs in _CASE_SEGS.items():
        arr = F.array(*[seg(a, b) for a, b in pairs])
        expr = F.when(case == c, arr) if expr is None else expr.when(case == c, arr)
    # saddles: center > level connects the high diagonal
    expr = (
        expr.when((case == 5) & (center > L), F.array(seg("S", "E"), seg("W", "N")))
        .when(case == 5, F.array(seg("W", "S"), seg("E", "N")))
        .when((case == 10) & (center > L), F.array(seg("W", "S"), seg("E", "N")))
        .when(case == 10, F.array(seg("S", "E"), seg("W", "N")))
        .otherwise(F.array().cast("array<struct<x0:double,y0:double,x1:double,y1:double>>"))
    )
    return blk.select("bx", "by", F.explode(expr).alias("_s")).select(
        "bx",
        "by",
        (F.col("bx").cast("double") + F.col("_s.x0")).alias("x0"),
        (F.col("by").cast("double") + F.col("_s.y0")).alias("y0"),
        (F.col("bx").cast("double") + F.col("_s.x1")).alias("x1"),
        (F.col("by").cast("double") + F.col("_s.y1")).alias("y1"),
    )
