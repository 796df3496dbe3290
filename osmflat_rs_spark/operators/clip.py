"""Vector-tile cut: exact Liang–Barsky segment clipping to a regular
grid, as pure Catalyst column expressions.

``tile_assign_segments`` (tiling.py) answers WHICH tiles a way touches
— the assignment half of the north rule's "raster-tile↔vector
assignments". This operator produces the other half a tile server
actually stores: per-tile CLIPPED geometry, each output row one segment
piece cut to its tile's bounds and quantized to tile-local integer
coordinates (the Mapbox-vector-tile layout: an ``extent``×``extent``
local grid per tile). The reference's render path does the same cut
implicitly when it rasterizes into a bounded image after the affine
transform (osmflat/examples/render-roads.rs:71-81 — coordinates outside
the raster are clamped/dropped); here the cut is explicit, exact, and
keeps vector form.

Scale shape — this is the best plan in the repo, not by accident:

- **Map-only.** bbox cell fan-out is an ``explode(sequence(..))`` pair
  and the clip itself is arithmetic + comparisons — one narrow
  whole-stage-codegen stage, ZERO shuffle, zero Python. At 10^12
  segments the job is embarrassingly parallel and scales with input
  splits alone (no key skew to break: no keys).
- The fan-out factor is the segment's bbox area in cells. For the
  GPS-trace/way regime (consecutive vertices, segment length ≲ cell
  size) that is 1-4 rows; a segment spanning many tiles fans out to
  bbox cells rather than the DDA-walk cells (superset for diagonal
  runs) — the accept test then discards untouched cells EXACTLY, so
  semantics never depend on the fan-out shape, only bytes do. Feed
  long ways through a vertex-densify pass first if bbox area explodes.

Exactness / oracle contract: inputs are fixed-point int64; every
float step (the 2 divisions per axis, the t·d products, the extent
quantization) is written in ONE fixed operation order mirrored
literally by the SQL oracle, and ``cell_size`` a power of two keeps
the cell-index floor division exact in doubles — so the driver's
hash-compare is bit-for-bit, not tolerance-based.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _axis_window(p0: Column, d: Column, lo: Column, hi: Column) -> tuple[Column, Column]:
    """Per-axis parametric window [t_lo, t_hi] of the segment against
    slab [lo, hi] (Liang–Barsky). ``d == 0`` degenerates to the full
    line: window is (0,1)-neutral when inside the slab, empty when
    outside (encoded as an inverted (2,-1) window so the final
    t0<=t1 accept test rejects)."""
    a = (lo - p0) / d
    b = (hi - p0) / d
    inside = (p0 >= lo) & (p0 <= hi)
    t_lo = F.when(d != 0.0, F.least(a, b)).otherwise(F.when(inside, F.lit(0.0)).otherwise(F.lit(2.0)))
    t_hi = F.when(d != 0.0, F.greatest(a, b)).otherwise(
        F.when(inside, F.lit(1.0)).otherwise(F.lit(-1.0))
    )
    return t_lo, t_hi


def clip_segments_to_grid(
    segments: DataFrame,
    cell_size: int,
    extent: int = 4096,
    id_col: str = "sid",
    x0: str = "x1",
    y0: str = "y1",
    x1: str = "x2",
    y1: str = "y2",
) -> DataFrame:
    """→ DataFrame(<id_col>, cell_x, cell_y, u0, v0, u1, v1) — every
    (segment, grid cell) intersection, endpoints clipped to the cell and
    quantized to the cell-local ``extent`` grid (ints in [0, extent]).

    The clip rect per cell is the CLOSED square [cx·cs, (cx+1)·cs] ×
    [cy·cs, (cy+1)·cs]; local coordinate extent endpoints are therefore
    reachable on both sides (0 and ``extent``). Ownership of degenerate
    border cases is half-open at the fan-out: a segment lying exactly
    ALONG a cell border is emitted in the cell whose LOW edge it sits
    on (the one its floor-divided coordinates name), not duplicated
    into the neighbor — deterministic, and what an MVT encoder with
    buffer 0 produces. Zero-length clips (corner touches, or pieces
    that quantization collapses) are dropped, as an encoder would.

    ``cell_size`` must be a power of two: the cell-index floor division
    is then exact in doubles (the same 2^k convention as the segment
    join's cover, segments.py), which is what makes the SQL oracle
    hash-exact rather than tolerance-based.
    """
    if cell_size <= 0 or (cell_size & (cell_size - 1)) != 0:
        raise ValueError(f"cell_size must be a positive power of two, got {cell_size}")
    cs = float(cell_size)

    seg = segments.select(
        F.col(id_col),
        F.col(x0).cast("double").alias("_x0"),
        F.col(y0).cast("double").alias("_y0"),
        (F.col(x1).cast("double") - F.col(x0).cast("double")).alias("_dx"),
        (F.col(y1).cast("double") - F.col(y0).cast("double")).alias("_dy"),
        F.floor(F.least(F.col(x0), F.col(x1)).cast("double") / F.lit(cs)).cast("long").alias("_cx_lo"),
        F.floor(F.greatest(F.col(x0), F.col(x1)).cast("double") / F.lit(cs)).cast("long").alias("_cx_hi"),
        F.floor(F.least(F.col(y0), F.col(y1)).cast("double") / F.lit(cs)).cast("long").alias("_cy_lo"),
        F.floor(F.greatest(F.col(y0), F.col(y1)).cast("double") / F.lit(cs)).cast("long").alias("_cy_hi"),
    )
    fan = seg.select(
        F.col(id_col),
        "_x0", "_y0", "_dx", "_dy",
        F.explode(F.sequence(F.col("_cx_lo"), F.col("_cx_hi"))).alias("cell_x"),
        "_cy_lo", "_cy_hi",
    ).select(
        F.col(id_col),
        "_x0", "_y0", "_dx", "_dy", "cell_x",
        F.explode(F.sequence(F.col("_cy_lo"), F.col("_cy_hi"))).alias("cell_y"),
    )

    xmin = F.col("cell_x").cast("double") * F.lit(cs)
    ymin = F.col("cell_y").cast("double") * F.lit(cs)
    tx_lo, tx_hi = _axis_window(F.col("_x0"), F.col("_dx"), xmin, xmin + F.lit(cs))
    ty_lo, ty_hi = _axis_window(F.col("_y0"), F.col("_dy"), ymin, ymin + F.lit(cs))
    t0 = F.greatest(F.lit(0.0), tx_lo, ty_lo)
    t1 = F.least(F.lit(1.0), tx_hi, ty_hi)

    def local(p0: Column, d: Column, t: Column, mn: Column) -> Column:
        # ONE operation order, mirrored by the oracle: ((p0 + t*d) - mn)
        # * extent / cs, round-half-up, int
        return F.round(((p0 + t * d) - mn) * F.lit(float(extent)) / F.lit(cs), 0).cast("int")

    clipped = (
        fan.withColumn("_t0", t0)
        .withColumn("_t1", t1)
        .filter(F.col("_t0") <= F.col("_t1"))
        .select(
            F.col(id_col),
            "cell_x",
            "cell_y",
            local(F.col("_x0"), F.col("_dx"), F.col("_t0"), xmin).alias("u0"),
            local(F.col("_y0"), F.col("_dy"), F.col("_t0"), ymin).alias("v0"),
            local(F.col("_x0"), F.col("_dx"), F.col("_t1"), xmin).alias("u1"),
            local(F.col("_y0"), F.col("_dy"), F.col("_t1"), ymin).alias("v1"),
        )
    )
    return clipped.filter((F.col("u0") != F.col("u1")) | (F.col("v0") != F.col("v1")))


def clip_segments_convex(
    segments: DataFrame,
    polygon: list,
    id_col: str = "seg_id",
    x0: str = "x0",
    y0: str = "y0",
    x1: str = "x1",
    y1: str = "y1",
) -> DataFrame:
    """Cyrus–Beck segment clipping to ONE convex polygon (the
    area-of-interest cut — "give me the road network inside this
    viewport/boundary", the convex-AOI counterpart of the grid cut
    above): each input segment → at most one clipped piece, with the
    parametric window [t0, t1] and the clipped endpoints.

    ``polygon`` is a driver-side list of (x, y) int vertices in CCW
    order (an AOI is one small literal by definition — the same
    broadcast-by-literal contract as the k-means centroids); the m
    half-plane tests unroll to m codegen'd integer dot products —
    map-only, ZERO shuffle, zero Python, the grid cut's scale shape.

    Exactness: S = n·(p0 − a) and D = n·d are exact int64 (inward
    normals of CCW edges are (−ey, ex), products bounded by coordinate
    spans²); the only floats are the −S/D divisions (exact int64
    operands < 2^53) folded through one fixed max/min order and the
    final p + t·d projection — the module's oracle contract, so the
    gate hash-compares bit-for-bit after round-6. Parallel edges
    (D = 0) reject the whole segment iff it lies outside that
    half-plane (S < 0). Degenerate touches (t0 = t1) are kept;
    zero-length segments clip to themselves iff inside.
    """
    if len(polygon) < 3:
        raise ValueError(f"polygon needs >= 3 vertices, got {len(polygon)}")
    px0, py0 = F.col(x0).cast("long"), F.col(y0).cast("long")
    dx = F.col(x1).cast("long") - px0
    dy = F.col(y1).cast("long") - py0

    # linear-size fold: per-edge candidates with NEUTRAL elements (0/1)
    # inside one greatest/least — a chained-when running max duplicates
    # the accumulated tree per edge (~2^m nodes, the kmeans lesson)
    lo_cands, hi_cands = [F.lit(0.0)], [F.lit(1.0)]
    ok = F.lit(True)
    m = len(polygon)
    for i in range(m):
        ax, ay = int(polygon[i][0]), int(polygon[i][1])
        bx, by = int(polygon[(i + 1) % m][0]), int(polygon[(i + 1) % m][1])
        ex, ey = bx - ax, by - ay
        nx, ny = -ey, ex  # inward (left) normal of a CCW edge
        s = F.lit(nx) * (px0 - F.lit(ax)) + F.lit(ny) * (py0 - F.lit(ay))
        d = F.lit(nx) * dx + F.lit(ny) * dy
        t = -s.cast("double") / d.cast("double")
        ok = ok & ((d != 0) | (s >= 0))
        lo_cands.append(F.when(d > 0, t).otherwise(F.lit(0.0)))
        hi_cands.append(F.when(d < 0, t).otherwise(F.lit(1.0)))
    t_lo = F.greatest(*lo_cands)
    t_hi = F.least(*hi_cands)

    out = segments.select(
        F.col(id_col),
        t_lo.alias("t0"),
        t_hi.alias("t1"),
        (px0.cast("double") + t_lo * dx.cast("double")).alias("cx0"),
        (py0.cast("double") + t_lo * dy.cast("double")).alias("cy0"),
        (px0.cast("double") + t_hi * dx.cast("double")).alias("cx1"),
        (py0.cast("double") + t_hi * dy.cast("double")).alias("cy1"),
        ok.alias("_ok"),
    )
    return out.filter(F.col("_ok") & (F.col("t0") <= F.col("t1"))).drop("_ok")
