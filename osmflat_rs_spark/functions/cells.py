"""Hierarchical spatial cell index (quadtree Morton cells).

This is the engine's H3/S2 analog, built from scratch (no native geo libs
in the image): a level-``res`` cell is a square of the 2^res × 2^res grid
over (lon ∈ [-180,180], lat ∈ [-90,90]) in fixed-point integer space, and
its cell ID is

    cell_id = (1 << (2*res)) | morton(ix_lon, iy_lat)

The leading 1-bit makes IDs self-delimiting across resolutions (like S2):
``parent(cell) = cell >> 2``, children = ``[cell<<2, cell<<2 + 4)``, and a
cell's ID is a strict binary prefix of all its descendants — so sorting by
cell ID gives the space-filling-curve clustering the north rule's
"per-partition sorted cell-ID arrays" needs, and range predicates
``[cell << 2k, (cell+1) << 2k)`` prune descendants.

Two implementations, same math:
- ``cell_id_expr``: pure Catalyst column expressions (shift/mask Morton
  spread — ~12 JVM ops, whole-stage-codegen'd; zero Python in the hot path);
- NumPy mirrors used driver-side for polygon covers / kNN rings and inside
  vectorized pandas UDFs.

Everything is exact int64 arithmetic; no floats touch the index.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from osmflat_rs_spark.functions.geo import COORD_SCALE

#: max resolution such that 2*res+1 <= 61 bits (signed int64 safe)
MAX_RES = 30

_LON_SPAN = 360 * COORD_SCALE
_LAT_SPAN = 180 * COORD_SCALE
_LON_OFF = 180 * COORD_SCALE
_LAT_OFF = 90 * COORD_SCALE

# ---------------------------------------------------------------------------
# Spark column-expression implementation (JVM-side)
# ---------------------------------------------------------------------------


def _spread_byte(b: int) -> int:
    """Morton-spread one byte (reference for the lookup table)."""
    out = 0
    for i in range(8):
        out |= ((b >> i) & 1) << (2 * i)
    return out


#: byte → spread-byte lookup table (literal array; folds to a constant)
_SPREAD_TAB = [_spread_byte(b) for b in range(256)]

_SPREAD_TAB_COL: Column | None = None


def _spread_tab_col() -> Column:
    """The lookup table as ONE cached Column: ``F.lit(list)`` expands to
    256 per-element py4j calls (~250 ms of plan-CONSTRUCTION time per
    cell_id_expr — bench times construction), so the literal is parsed
    once per process from a single SQL string and reused (Columns are
    immutable expression templates; reuse across plans is safe)."""
    global _SPREAD_TAB_COL
    if _SPREAD_TAB_COL is None:
        _SPREAD_TAB_COL = F.expr(
            "array(" + ",".join(f"{v}L" for v in _SPREAD_TAB) + ")"
        )
    return _SPREAD_TAB_COL


def _spread_bits_expr(x: Column, nbits: int = 31) -> Column:
    """Interleave-spread an ``nbits``-bit int into even bit positions.

    r6: byte-table lookups against a 256-entry LITERAL array instead of
    the 5-step shift/mask cascade. The cascade references its input
    twice per step, so as a Catalyst TREE it duplicates the (quantize +
    clamp) subtree 2^5 = 32 times per axis; whole-stage codegen's CSE
    would deduplicate it, but the generated method blows past HotSpot's
    8000-bytecode JIT ceiling and the whole projection runs interpreted
    — measured 27 µs/row on the PIP cell encode (~64 evaluated copies of
    the quantize tree). The table form references the input ceil(nbits/8)
    times, the method stays small and JITs, and the VALUES are
    bit-identical (pinned against the NumPy mirror in tests).
    """
    # element_at (1-based), NOT F.get: the index is provably in [1, 256]
    # so ANSI never throws, and element_at over a non-null literal array
    # is NON-NULLABLE — F.get is null-producing (OOB → null), which
    # blocked the optimizer from folding the join-key isnotnull(cell)
    # filter and re-evaluated the whole cell expression a second time on
    # every probe row (measured: knn gate 1.7 s → 2.3 s on F.get).
    tab = _spread_tab_col()
    x = x.bitwiseAND(F.lit((1 << min(nbits, 31)) - 1))
    parts = F.element_at(tab, (x.bitwiseAND(F.lit(0xFF))).cast("int") + F.lit(1))
    for k in range(1, (min(nbits, 31) + 7) // 8):
        byte = F.shiftright(x, 8 * k).bitwiseAND(F.lit(0xFF)).cast("int") + F.lit(1)
        parts = parts.bitwiseOR(F.shiftleft(F.element_at(tab, byte), 16 * k))
    return parts


def _quantize_expr(fixed: Column, offset: int, span: int, res: int) -> Column:
    # NB: least/greatest SKIP nulls, so this clamp alone maps a null
    # coordinate to the max-corner cell — callers apply the null guard
    # ONCE on the raw inputs (see cell_id_expr); guarding per-axis with
    # when(q.isNull(), ...) re-evaluates the quantize expression and
    # defeated codegen CSE (measured 4x on the PIP/kNN cell joins)
    q = F.floor(((fixed.cast("long") + F.lit(offset)) * F.lit(1 << res)) / F.lit(span)).cast("long")
    return F.greatest(F.lit(0).cast("long"), F.least(F.lit((1 << res) - 1).cast("long"), q))


def _null_if_coords_null(cell: Column, lat_fixed: Column, lon_fixed: Column) -> Column:
    """NULL must propagate: a missing/unparseable coordinate used to
    clamp to the max-corner cell — phantom points accumulating in one NE
    cell that every spatial join silently included. One cheap isNull
    check on the RAW inputs; the cell expression itself evaluates only
    in the non-null branch."""
    return F.when(lat_fixed.isNull() | lon_fixed.isNull(), F.lit(None).cast("long")).otherwise(cell)


_CELL_EXPR_CACHE: dict[tuple[str, str, int], Column] = {}


def cell_id_expr(lat_fixed: Column | str, lon_fixed: Column | str, res: int) -> Column:
    """Cell ID column for fixed-point integer lat/lon at resolution ``res``.

    Pure JVM expression — shows up inside WholeStageCodegen; this is the
    hot-path encoder used by ingest and the spatial joins.

    Pass COLUMN NAMES (strings) to hit the per-process template cache:
    the ~400 py4j expression-builder round-trips (~80 ms, r6 measurement
    — the bench times plan construction) are then paid once per
    (lat, lon, res) key; Columns are immutable unresolved templates, so
    reuse across plans is safe (same property _spread_tab_col relies on).
    """
    assert 0 <= res <= MAX_RES
    key = None
    if isinstance(lat_fixed, str) and isinstance(lon_fixed, str):
        key = (lat_fixed, lon_fixed, res)
        cached = _CELL_EXPR_CACHE.get(key)
        if cached is not None:
            return cached
        lat_fixed, lon_fixed = F.col(lat_fixed), F.col(lon_fixed)
    ix = _quantize_expr(lon_fixed, _LON_OFF, _LON_SPAN, res)
    iy = _quantize_expr(lat_fixed, _LAT_OFF, _LAT_SPAN, res)
    z = _spread_bits_expr(ix, res).bitwiseOR(F.shiftleft(_spread_bits_expr(iy, res), 1))
    cell = F.shiftleft(F.lit(1).cast("long"), 2 * res).bitwiseOR(z)
    out = _null_if_coords_null(cell, lat_fixed, lon_fixed)
    if key is not None:
        _CELL_EXPR_CACHE[key] = out
    return out


def cell_from_grid_expr(ix: Column, iy: Column, res: int) -> Column:
    """Cell ID from (ix, iy) grid coordinates at ``res`` — the Catalyst
    twin of ``cell_from_grid_np`` (same table-lookup Morton spread as
    ``cell_id_expr``). Callers guarantee 0 <= ix, iy < 2^res."""
    assert 0 <= res <= MAX_RES
    z = _spread_bits_expr(ix, res).bitwiseOR(F.shiftleft(_spread_bits_expr(iy, res), 1))
    return F.shiftleft(F.lit(1).cast("long"), 2 * res).bitwiseOR(z)


def quantize_expr(fixed: Column, axis: str, res: int) -> Column:
    """Public quantize for one axis ('lat' | 'lon') — the exact
    expression behind ``cell_id_expr``'s grid coordinates, for callers
    that build cell RANGES (bbox covers) in pure Catalyst."""
    off, span = (_LAT_OFF, _LAT_SPAN) if axis == "lat" else (_LON_OFF, _LON_SPAN)
    return _quantize_expr(fixed, off, span, res)


def parent_expr(cell: Column, steps: int = 1) -> Column:
    """Coarser ancestor cell (``steps`` levels up)."""
    return F.shiftright(cell, 2 * steps)


def grid_exprs(lat_fixed: Column, lon_fixed: Column, res: int) -> tuple[Column, Column]:
    """(ix, iy) grid coordinates at resolution ``res`` — the two axes
    behind ``cell_id_expr``, un-interleaved, for operators that need
    grid ADJACENCY (focal/neighborhood aggregation) rather than a
    1-D locality key. Same quantize + clamp; pure JVM expressions.
    NULL coordinates clamp — callers drop or guard nulls first."""
    assert 0 <= res <= MAX_RES
    return (
        _quantize_expr(lon_fixed, _LON_OFF, _LON_SPAN, res),
        _quantize_expr(lat_fixed, _LAT_OFF, _LAT_SPAN, res),
    )


def cluster_by_cell(
    df,
    lat: str = "lat",
    lon: str = "lon",
    res: int = 14,
    num_partitions: int | None = None,
    backend=None,
):
    """North-rule core layout: per-partition sorted cell-ID arrays.

    Adds the ``cell`` column (Morton by default; any
    ``functions.cell_backend.CellBackend`` via ``backend=`` — r5, the
    seam now reaches the storage layout), range-partitions on it and
    sorts within partitions — the Spark analog of the reference's
    sorted-insert id table (osmflatc/src/ids.rs:116-119) and the layout
    an Iceberg ``WRITE ORDERED BY cell`` would produce. Spatial scans
    then prune by cell ranges (``backend.cell_range`` — for Morton,
    descendants of cell c = [c<<2k, (c+1)<<2k)), and candidate joins
    co-locate spatially-near rows. Pair with
    ``SnapshotCatalog.append(..., order_by=["cell"])`` for clustered
    committed writes in ANY backend's cell scheme."""
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    cell = (
        backend.cell_expr(lat, lon, res)
        if backend is not None
        else cell_id_expr(lat, lon, res)
    )
    out = df.withColumn("cell", cell)
    return out.repartitionByRange(n, F.col("cell")).sortWithinPartitions("cell")


# ---------------------------------------------------------------------------
# NumPy mirror (identical math; used driver-side and inside pandas UDFs)
# ---------------------------------------------------------------------------


def _spread_bits_np(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64) & np.uint64(0x7FFFFFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def _compact_bits_np(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64) & np.uint64(0x5555555555555555)
    x = (x | (x >> np.uint64(1))) & np.uint64(0x3333333333333333)
    x = (x | (x >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return x


def quantize_np(fixed: np.ndarray, offset: int, span: int, res: int) -> np.ndarray:
    q = ((fixed.astype(np.int64) + np.int64(offset)) * np.int64(1 << res)) // np.int64(span)
    return np.clip(q, 0, (1 << res) - 1)


def grid_coords_np(lat_fixed: np.ndarray, lon_fixed: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    ix = quantize_np(np.asarray(lon_fixed), _LON_OFF, _LON_SPAN, res)
    iy = quantize_np(np.asarray(lat_fixed), _LAT_OFF, _LAT_SPAN, res)
    return ix, iy


def cell_id_np(lat_fixed: np.ndarray, lon_fixed: np.ndarray, res: int) -> np.ndarray:
    ix, iy = grid_coords_np(lat_fixed, lon_fixed, res)
    return cell_from_grid_np(ix, iy, res)


def cell_from_grid_np(ix: np.ndarray, iy: np.ndarray, res: int) -> np.ndarray:
    z = _spread_bits_np(np.asarray(ix)) | (_spread_bits_np(np.asarray(iy)) << np.uint64(1))
    return ((np.uint64(1) << np.uint64(2 * res)) | z).astype(np.int64)


def cell_to_grid_np(cell: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    z = np.asarray(cell).astype(np.uint64) & ((np.uint64(1) << np.uint64(2 * res)) - np.uint64(1))
    ix = _compact_bits_np(z).astype(np.int64)
    iy = _compact_bits_np(z >> np.uint64(1)).astype(np.int64)
    return ix, iy


def cell_res(cell: int) -> int:
    return (int(cell).bit_length() - 1) // 2


def cell_bounds_fixed(cell: int, res: int) -> tuple[int, int, int, int]:
    """(lat_min, lat_max, lon_min, lon_max) of the cell in fixed-point ints
    (half-open on the max side, matching the floor quantization)."""
    ix, iy = cell_to_grid_np(np.array([cell]), res)
    ix, iy = int(ix[0]), int(iy[0])
    lon_min = -(_LON_OFF) + _ceil_div(ix * _LON_SPAN, 1 << res)
    lon_max = -(_LON_OFF) + _ceil_div((ix + 1) * _LON_SPAN, 1 << res) - 1
    lat_min = -(_LAT_OFF) + _ceil_div(iy * _LAT_SPAN, 1 << res)
    lat_max = -(_LAT_OFF) + _ceil_div((iy + 1) * _LAT_SPAN, 1 << res) - 1
    return lat_min, lat_max, lon_min, lon_max


def _ceil_div(a: int, b: int) -> int:
    return -((-a) // b)


# ---------------------------------------------------------------------------
# Covers (driver-side, for the broadcast polygon / query-point side)
# ---------------------------------------------------------------------------


def bbox_cover(
    lat_min: int, lat_max: int, lon_min: int, lon_max: int, res: int
) -> np.ndarray:
    """All cells at ``res`` intersecting the fixed-point bbox (superset
    cover — the coarse phase of the two-phase spatial join)."""
    ix0, iy0 = grid_coords_np(np.array([lat_min]), np.array([lon_min]), res)
    ix1, iy1 = grid_coords_np(np.array([lat_max]), np.array([lon_max]), res)
    ixs = np.arange(int(ix0[0]), int(ix1[0]) + 1, dtype=np.int64)
    iys = np.arange(int(iy0[0]), int(iy1[0]) + 1, dtype=np.int64)
    gx, gy = np.meshgrid(ixs, iys)
    return cell_from_grid_np(gx.ravel(), gy.ravel(), res)


def bbox_cover_batch(
    lat_lo: np.ndarray, lat_hi: np.ndarray, lon_lo: np.ndarray, lon_hi: np.ndarray, res: int
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized ``bbox_cover`` over N bboxes at once (r5, VERDICT r4
    #4): returns ``(cells, owner)`` — flattened cover cells and the index
    of the bbox each cell belongs to. Pure NumPy: the bulk-kNN cover
    stage runs ZERO per-query Python (the prior form looped
    ``bbox_cover`` + per-cell appends per query — ~1M Python iterations
    per million queries)."""
    ix0, iy0 = grid_coords_np(np.asarray(lat_lo), np.asarray(lon_lo), res)
    ix1, iy1 = grid_coords_np(np.asarray(lat_hi), np.asarray(lon_hi), res)
    nx = ix1 - ix0 + 1
    ny = iy1 - iy0 + 1
    counts = nx * ny
    total = int(counts.sum())
    owner = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    rank = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    nx_r = np.repeat(nx, counts)
    ix = np.repeat(ix0, counts) + rank % nx_r
    iy = np.repeat(iy0, counts) + rank // nx_r
    return cell_from_grid_np(ix, iy, res), owner


def disk_bbox_fixed_batch(
    lat_fixed: np.ndarray, lon_fixed: np.ndarray, radius_m: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized ``disk_bbox_fixed`` for the COMMON case (no pole reach,
    no antimeridian wrap): returns ``(lat_lo, lat_hi, lon_lo, lon_hi,
    simple)``. Rows with ``simple=False`` (pole/wrap — rare for real
    query workloads) must go through the scalar form, which handles the
    two-interval split exactly. Same sphere, same ceil-plus-slack
    construction, so the bbox is the same conservative superset."""
    import math

    from osmflat_rs_spark.functions.geo import EARTH_RADIUS_M

    lat = np.asarray(lat_fixed, dtype=np.int64)
    lon = np.asarray(lon_fixed, dtype=np.int64)
    c = radius_m / EARTH_RADIUS_M
    dlat = int(math.ceil(math.degrees(c) * COORD_SCALE)) + 1
    lat_rad = np.radians(lat / COORD_SCALE)
    pole = (np.abs(lat_rad) + c >= math.pi / 2 - 1e-12) | (c >= math.pi / 2)
    # off-branch rows still evaluate: clamp the asin argument to avoid
    # NaN warnings; those rows are routed to the scalar form anyway
    ratio = np.clip(np.sin(c) / np.cos(np.where(pole, 0.0, lat_rad)), -1.0, 1.0)
    dlon = np.ceil(np.degrees(np.arcsin(ratio)) * COORD_SCALE).astype(np.int64) + 1
    lat_lo = np.maximum(-_LAT_OFF, lat - dlat)
    lat_hi = np.minimum(_LAT_OFF - 1, lat + dlat)
    lon_lo = lon - dlon
    lon_hi = lon + dlon
    wrap = (lon_lo < -_LON_OFF) | (lon_hi >= _LON_OFF) | (lon_hi - lon_lo >= 2 * _LON_OFF - 1)
    return lat_lo, lat_hi, lon_lo, lon_hi, ~(pole | wrap)


def polygon_cover(xs: np.ndarray, ys: np.ndarray, res: int) -> np.ndarray:
    """Cells at ``res`` that intersect the polygon (superset cover)."""
    cells_arr, _interior = polygon_cover_classified(xs, ys, res)
    return cells_arr


def polygon_cover_classified(xs: np.ndarray, ys: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Cover cells + full-containment classification.

    Exact cover = (cells crossed by any boundary edge: grid supercover)
    ∪ (cells whose center is inside: a cell intersecting the polygon but
    not crossed by the boundary lies entirely inside it). No false
    negatives — the guarantee the two-phase join's correctness rests on.

    Returns (cells, interior) where interior[i] means the cell is NOT
    touched by the (conservative) boundary supercover and its center is
    inside ⇒ the cell lies entirely inside the polygon ⇒ every point in
    it is contained — the exact-refinement phase can skip those points
    wholesale (the full-containment short-circuit).
    """
    from osmflat_rs_spark.functions.pip import points_in_polygon

    xs = np.asarray(xs, dtype=np.int64)
    ys = np.asarray(ys, dtype=np.int64)
    candidates = bbox_cover(int(ys.min()), int(ys.max()), int(xs.min()), int(xs.max()), res)
    cix, ciy = cell_to_grid_np(candidates, res)

    # boundary supercover: walk each edge on the grid (conservative —
    # extra boundary cells only shrink the short-circuit, never break it)
    boundary: set[tuple[int, int]] = set()
    ixv, iyv = grid_coords_np(ys, xs, res)
    m = len(xs)
    for e in range(m):
        x0, y0 = int(ixv[e]), int(iyv[e])
        x1, y1 = int(ixv[(e + 1) % m]), int(iyv[(e + 1) % m])
        boundary.update(_grid_supercover(xs[e], ys[e], xs[(e + 1) % m], ys[(e + 1) % m], res))
        boundary.add((x0, y0))
        boundary.add((x1, y1))

    clat = np.array([(_cell_center(iy, _LAT_OFF, _LAT_SPAN, res)) for iy in ciy], dtype=np.int64)
    clon = np.array([(_cell_center(ix, _LON_OFF, _LON_SPAN, res)) for ix in cix], dtype=np.int64)
    inside = points_in_polygon(clon, clat, xs, ys)
    on_boundary = np.array([(int(a), int(b)) in boundary for a, b in zip(cix, ciy)])

    keep = inside | on_boundary
    interior = (inside & ~on_boundary)[keep]
    return candidates[keep], interior


def _cell_center(i: int, off: int, span: int, res: int) -> int:
    """An integer point GUARANTEED to lie in cell ``i``: the cell's exact
    lower integer corner ``ceil(i*span/2^res) - off``. Re-encoding it
    yields ``i`` for every res ≤ MAX_RES because span ≥ 2^res (so the
    ceil stays below the next cell's start) and every cell's real
    interval is wider than 1 (so it contains an integer). The previous
    midpoint form ``(2i+1)*span // (2<<res)`` landed in the NEIGHBORING
    lat row for ~16% of rows at res=30 (cell width 1.676 < 2), which
    made the cover classification test a point OUTSIDE the cell —
    breaking both the superset guarantee and interior-short-circuit
    soundness for micro-polygons (review r3 finding, simulated)."""
    shift = 1 << res
    return -(off) + (int(i) * span + shift - 1) // shift


def _grid_supercover(x0: int, y0: int, x1: int, y1: int, res: int) -> set[tuple[int, int]]:
    """EXACT integer grid supercover of the closed segment — every cell
    whose closed square intersects the segment (plus boundary-touching
    neighbors: a segment running exactly along a grid line touches both
    adjacent cells, and both are returned).

    Column sweep with exact rational arithmetic in Python ints (no
    sampling, no float, no overflow): work in scaled coords
    ``u = (x + OFF) << res`` so column ``ix`` covers ``u ∈ [ix·SPAN,
    (ix+1)·SPAN)``; within a column the segment's v-extent endpoints are
    rationals with denominator ``du``, and their row cells are exact
    floor divisions. Replaces the sampled-DDA form whose thin-sliver
    escape risk was never provable (VERDICT r01 "What's wrong" #2)."""
    x0, y0, x1, y1 = int(x0), int(y0), int(x1), int(y1)
    lim = (1 << res) - 1
    shift = 1 << res
    u0, u1 = (x0 + _LON_OFF) * shift, (x1 + _LON_OFF) * shift
    v0, v1 = (y0 + _LAT_OFF) * shift, (y1 + _LAT_OFF) * shift
    du, dv = u1 - u0, v1 - v0
    out: set[tuple[int, int]] = set()

    def _clamp(i: int) -> int:
        return 0 if i < 0 else (lim if i > lim else i)

    def _add_rows(ix: int, rows: list[tuple[int, bool]]) -> None:
        (iy_a, ex_a), (iy_b, ex_b) = rows
        lo, hi = min(iy_a, iy_b), max(iy_a, iy_b)
        # v exactly on a row boundary at the low end ⇒ the lower neighbor
        # row is touched too (closed cells; floor put us in the upper one)
        if (iy_a == lo and ex_a) or (iy_b == lo and ex_b):
            lo -= 1
        cx = _clamp(ix)
        for iy in range(lo, hi + 1):
            out.add((cx, _clamp(iy)))

    if du == 0:
        ixs = [u0 // _LON_SPAN]
        if u0 % _LON_SPAN == 0:
            ixs.append(ixs[0] - 1)  # vertical segment ON a column boundary
        rows = [(v // _LAT_SPAN, v % _LAT_SPAN == 0) for v in (v0, v1)]
        for ix in ixs:
            _add_rows(ix, rows)
        return out

    umin, umax = (u0, u1) if u0 <= u1 else (u1, u0)
    ix_lo = umin // _LON_SPAN
    if umin % _LON_SPAN == 0:
        ix_lo -= 1  # endpoint exactly on a column boundary touches the left column
    ix_hi = umax // _LON_SPAN
    for ix in range(ix_lo, ix_hi + 1):
        a = max(umin, ix * _LON_SPAN)
        b = min(umax, (ix + 1) * _LON_SPAN)  # closed: boundary touch included
        if a > b:
            continue
        rows = []
        for uu in (a, b):
            p = v0 * du + (uu - u0) * dv
            q = du
            if q < 0:
                p, q = -p, -q
            den = q * _LAT_SPAN
            rows.append((p // den, p % den == 0))
        _add_rows(ix, rows)
    return out


def disk_bbox_fixed(lat_fixed: int, lon_fixed: int, radius_m: float) -> tuple[int, int, list[tuple[int, int]]]:
    """(lat_lo, lat_hi, [(lon_lo, lon_hi), ...]) — the fixed-point
    rectangle(s) circumscribing a geodesic disk, on the SAME sphere
    (EARTH_RADIUS_M) the haversine kernel uses, so ``kth_dist <= radius =>
    settled`` stays a sound exactness guarantee. Two lon intervals when
    the disk crosses the antimeridian; one full-range interval when the
    cap reaches a pole. Backend-agnostic (extracted in r4 so S2 disk
    covers share the exact geometry with Morton's — the spherical-cap
    bounding meridian dLambda = asin(sin c / cos phi) and the pole rule,
    ADVICE r01 high)."""
    import math

    from osmflat_rs_spark.functions.geo import EARTH_RADIUS_M

    c = radius_m / EARTH_RADIUS_M  # angular radius on the haversine sphere
    dlat = int(math.ceil(math.degrees(c) * COORD_SCALE)) + 1
    lat_rad = math.radians(lat_fixed / COORD_SCALE)
    if abs(lat_rad) + c >= math.pi / 2 - 1e-12 or c >= math.pi / 2:
        dlon = 2 * _LON_OFF  # cap contains (or reaches) a pole: all longitudes
    else:
        dlon = int(math.ceil(math.degrees(math.asin(math.sin(c) / math.cos(lat_rad))) * COORD_SCALE)) + 1
    lat_lo = max(-_LAT_OFF, lat_fixed - dlat)
    lat_hi = min(_LAT_OFF - 1, lat_fixed + dlat)
    lon_lo, lon_hi = lon_fixed - dlon, lon_fixed + dlon
    if lon_hi - lon_lo >= 2 * _LON_OFF - 1:
        return lat_lo, lat_hi, [(-_LON_OFF, _LON_OFF - 1)]
    # antimeridian wrap: a disk crossing +-180 covers TWO lon intervals —
    # clamping alone would silently drop the far-side cells and break the
    # 'settled => exact' guarantee for cross-meridian neighbors
    intervals = []
    if lon_lo < -_LON_OFF:
        intervals.append((lon_lo + 2 * _LON_OFF, _LON_OFF - 1))
        lon_lo = -_LON_OFF
    if lon_hi >= _LON_OFF:
        intervals.append((-_LON_OFF, lon_hi - 2 * _LON_OFF))
        lon_hi = _LON_OFF - 1
    intervals.append((lon_lo, lon_hi))
    return lat_lo, lat_hi, intervals


def disk_cover(lat_fixed: int, lon_fixed: int, radius_m: float, res: int) -> np.ndarray:
    """Morton cells intersecting the bbox that circumscribes a geodesic
    disk — the kNN ring-expansion primitive (see ``disk_bbox_fixed`` for
    the sphere/antimeridian/pole geometry)."""
    lat_lo, lat_hi, intervals = disk_bbox_fixed(lat_fixed, lon_fixed, radius_m)
    covers = [bbox_cover(lat_lo, lat_hi, lo, hi, res) for lo, hi in intervals]
    return np.unique(np.concatenate(covers)) if len(covers) > 1 else covers[0]


def pick_cover_res(lat_span_fixed: int, lon_span_fixed: int, target_cells: int = 256) -> int:
    """Choose a cover resolution so a bbox of the given span yields roughly
    ``target_cells`` cells — the knob balancing join fan-out (finer res →
    fewer false candidates, more cover rows)."""
    import math

    span = max(1, max(lat_span_fixed, lon_span_fixed))
    world = _LON_SPAN
    per_axis = max(1.0, math.sqrt(target_cells))
    res = int(math.log2(world / span * per_axis)) if span < world else 0
    return max(0, min(MAX_RES, res))
