"""Segment–segment intersection join (the fourth classic spatial join,
after PIP / kNN / radius): all pairs of line segments that PROPERLY
cross (strict transversal crossing — endpoint touching and collinear
overlap are excluded by contract, which keeps the predicate a pure sign
test with no degenerate-case ambiguity).

Reference analog: the reference renders way polylines
(osmflat-rs/examples/render-features.rs) but never intersects them;
this is the road-network/trajectory-crossing operation a user of that
data model asks for next (junction discovery, trajectory conflict
detection).

Scale design, in plan order (r6 shape — one Catalyst cover, one
exchange, one fused Python stage):

1. **Cover** (`catalyst_cover`, pure JVM codegen): each segment is
   covered by every grid cell that contains any of its points. The
   construction is the subpiece-bbox method: split the segment at
   m = ceil(max(|dx|,|dy|)/cell_size) + 1 parameter breakpoints (so
   each subpiece's bbox spans < 2 cells per axis), take each subpiece's
   integer-floor breakpoint bbox padded by 2 units (floor bound + the
   double-division rounding bound — a line segment is coordinate-
   monotone, so consecutive breakpoints ARE the subpiece bbox corners),
   and emit the cells that bbox overlaps via ``sequence`` explodes. The
   union over subpieces is a SUPERSET of every floor cell the segment
   passes through, so two properly-crossing segments always share the
   cell containing their intersection point — candidate generation is
   lossless with NO dilation step. Cover size scales with segment
   length / cell_size (the standard trade; ``cell_size`` is the knob).
2. **One exchange** clustering the cover by packed cell key; the
   per-row payload is the 4 fixed-width endpoint ints — bounded, unlike
   shipping variable geometry (the r4 pip_join_shuffle ring-payload
   lesson).
3. **Fused pair + verify** (`_pair_verify_fn`): per-cell i<j pairs are
   generated AND verified inside one NumPy stage — candidate pairs
   exist only as transient index arrays, never as JVM rows (the r5
   join-then-verify shape computed the cover twice, broadcast-built a
   hashed relation over it, and Arrow-shipped every candidate pair).
   A pair is emitted only from the floor cell of its exact intersection
   point (reference-point dedup, `_ref_cell_mask`), so the output is
   globally distinct with NO pair shuffle at all.
   The verification predicate is the classic 4-orientation sign test.
   Orientations are computed in float64 with a forward-error filter
   (bound 4·eps·(|ab|+|cd|)); only rows whose determinant falls inside
   the filter band are recomputed with exact arbitrary-precision
   Python ints — at planet-scale fixed-point coordinates (|Δ| up to
   2^32) the int64 product overflows, the float filter resolves ~all
   rows, and the exact fallback keeps the operator EXACT by
   construction rather than by data luck.

Every stage is Arrow-batched or pure column expressions; shuffles are
keyed by cell or pair id. A hot cell (many segments in one cell) is a
data-skew property — candidates within a cell are quadratic in that
cell's density, which ``cell_size`` and AQE skew-split govern; nothing
is corpus-quadratic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EPS4 = 4.0 * np.finfo(np.float64).eps


def _orient_signs(px, py, qx, qy, rx, ry) -> np.ndarray:
    """sign((q-p) × (r-p)) per row, exact.

    float64 fast path with a forward-error filter; rows inside the
    filter band (|det| ≤ 4·eps·(|ab|+|cd|), where the true result could
    have the opposite sign) are recomputed with Python bigints."""
    a = (qx - px).astype(np.float64)
    b = (ry - py).astype(np.float64)
    c = (qy - py).astype(np.float64)
    d = (rx - px).astype(np.float64)
    ab, cd = a * b, c * d
    det = ab - cd
    unsure = np.abs(det) <= _EPS4 * (np.abs(ab) + np.abs(cd))
    sign = np.sign(det).astype(np.int8)
    if unsure.any():
        idx = np.nonzero(unsure)[0]
        for i in idx:
            exact = (int(qx[i]) - int(px[i])) * (int(ry[i]) - int(py[i])) - (
                int(qy[i]) - int(py[i])
            ) * (int(rx[i]) - int(px[i]))
            sign[i] = 0 if exact == 0 else (1 if exact > 0 else -1)
    return sign


def _proper_mask(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2) -> np.ndarray:
    o1 = _orient_signs(ax1, ay1, ax2, ay2, bx1, by1)
    o2 = _orient_signs(ax1, ay1, ax2, ay2, bx2, by2)
    o3 = _orient_signs(bx1, by1, bx2, by2, ax1, ay1)
    o4 = _orient_signs(bx1, by1, bx2, by2, ax2, ay2)
    return (o1 * o2 < 0) & (o3 * o4 < 0)


def _pack_cell(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
    return (cx.astype(np.int64) << np.int64(32)) | (cy.astype(np.int64) & np.int64(0xFFFFFFFF))


def _ref_cell_exact(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2, cs) -> int:
    """Packed floor-cell of the exact intersection point, Python bigints.

    x* = ax1 + t·rx with t = tn/D, so floor(x*/cs) = (ax1·D + tn·rx) div
    (D·cs) once D is sign-normalized positive — exact for ANY int64
    coordinates."""
    rx, ry = int(ax2) - int(ax1), int(ay2) - int(ay1)
    sx, sy = int(bx2) - int(bx1), int(by2) - int(by1)
    d = rx * sy - ry * sx
    tn = (int(bx1) - int(ax1)) * sy - (int(by1) - int(ay1)) * sx
    if d < 0:
        d, tn = -d, -tn
    den = d * cs
    cx = (int(ax1) * d + tn * rx) // den
    cy = (int(ay1) * d + tn * ry) // den
    return (cx << 32) | (cy & 0xFFFFFFFF)


def _ref_cell_mask(cell_key, ax1, ay1, ax2, ay2, bx1, by1, bx2, by2, cs: int) -> np.ndarray:
    """True where ``cell_key`` is the floor cell of the pair's exact
    intersection point — the reference-point dedup rule: a properly
    crossing pair lies on both segments, so the pass-through cover of
    BOTH contains that cell and the pair is emitted exactly once, with
    no pair shuffle + distinct afterwards.

    Vectorized int64 fast path under magnitude guards (diffs < 2^30 keep
    D/tn products exact; the division numerator |tn·rx| + cs·D and the
    denominator D·cs must stay < 2^61, checked in float with 4x slop);
    rows outside the guards take the bigint path — same split as
    ``_orient_signs``. The quotient identity used keeps int64 exact:
    ax1 = q·cs + r (0 ≤ r < cs) ⇒ floor(x*/cs) = q + (r·D + tn·rx) div
    (D·cs), so the numerator carries r (< cs) instead of ax1."""
    n = len(ax1)
    out = np.zeros(n, dtype=bool)
    if n == 0:
        return out
    rx, ry = ax2 - ax1, ay2 - ay1
    sx, sy = bx2 - bx1, by2 - by1
    ex, ey = bx1 - ax1, by1 - ay1
    lim_diff = np.int64(1) << np.int64(30)
    small = (
        (np.abs(rx) < lim_diff)
        & (np.abs(ry) < lim_diff)
        & (np.abs(sx) < lim_diff)
        & (np.abs(sy) < lim_diff)
        & (np.abs(ex) < lim_diff)
        & (np.abs(ey) < lim_diff)
    )
    vec = np.zeros(n, dtype=bool)
    if small.any():
        d = rx * sy - ry * sx
        tn = ex * sy - ey * sx
        neg = d < 0
        dp = np.where(neg, -d, d)
        tnp = np.where(neg, -tn, tn)
        lim = 2.0**61
        fdp = dp.astype(np.float64)
        num_bound = (
            np.abs(tnp).astype(np.float64) * np.maximum(np.abs(rx), np.abs(ry)).astype(np.float64)
            + float(cs) * fdp
        )
        vec = small & (num_bound < lim) & (fdp * float(cs) < lim) & (dp > 0)
        if vec.any():
            v = np.nonzero(vec)[0]  # compress: unsafe rows must not even wrap
            qx = np.floor_divide(ax1[v], cs)
            qy = np.floor_divide(ay1[v], cs)
            r0x = ax1[v] - qx * cs
            r0y = ay1[v] - qy * cs
            dv, tv = dp[v], tnp[v]
            den = dv * np.int64(cs)
            cx = qx + np.floor_divide(r0x * dv + tv * rx[v], den)
            cy = qy + np.floor_divide(r0y * dv + tv * ry[v], den)
            out[v] = _pack_cell(cx, cy) == cell_key[v]
    for i in np.nonzero(~vec)[0]:
        out[i] = (
            _ref_cell_exact(ax1[i], ay1[i], ax2[i], ay2[i], bx1[i], by1[i], bx2[i], by2[i], cs)
            == cell_key[i]
        )
    return out


def catalyst_cover(slim: DataFrame, cell_size: int) -> DataFrame:
    """The pass-through cover as PURE Catalyst codegen (r6): the
    subpiece-bbox construction with ``sequence`` explodes instead of the
    r5 ``mapInPandas`` form — zero Python-boundary cost (guide §4: the
    r5 snap cover Arrow-shipped 6 int64 columns × ~4M rows per run;
    this form never leaves the JVM).

    Differences vs the r5 Python cover, both candidate-only (soundness
    is unchanged — the emitted cell set is a SUPERSET of every floor
    cell the segment passes through):

    - breakpoints use double division + FLOOR (exact while
      ``|Δ|·m < 2^52``; any fixed-point planet span qualifies) and the
      bbox pad is 2 units instead of 1, absorbing the sub-ulp division
      rounding on top of the floor bound;
    - no per-segment (cell, sid) dedup — consumers either dedup in
      NumPy after the cell shuffle (`segment_intersection_join`) or are
      dedup-free by construction (snap's rank-1 collapse).

    Emits (cell, sid, x1, y1, x2, y2); cells packed exactly like
    ``_pack_cell``.
    """
    cs = int(cell_size)
    dx = F.col("x2") - F.col("x1")
    dy = F.col("y2") - F.col("y1")
    m = (F.greatest(F.abs(dx), F.abs(dy)) / F.lit(cs)).cast("long") + F.lit(1)

    def _fdiv(num, den):  # floor division, exact for |num| < 2^52
        return F.floor(num.cast("double") / den.cast("double")).cast("long")

    sub = (
        slim.withColumn("_m", m)
        .withColumn("_i", F.explode(F.sequence(F.lit(0), F.col("_m") - 1)))
    )
    dxc, dyc = F.col("x2") - F.col("x1"), F.col("y2") - F.col("y1")
    bx0 = F.col("x1") + _fdiv(dxc * F.col("_i"), F.col("_m"))
    by0 = F.col("y1") + _fdiv(dyc * F.col("_i"), F.col("_m"))
    bx1 = F.col("x1") + _fdiv(dxc * (F.col("_i") + 1), F.col("_m"))
    by1 = F.col("y1") + _fdiv(dyc * (F.col("_i") + 1), F.col("_m"))
    sub = sub.select(
        "sid", "x1", "y1", "x2", "y2",
        _fdiv(F.least(bx0, bx1) - 2, F.lit(cs)).alias("_cx0"),
        _fdiv(F.greatest(bx0, bx1) + 2, F.lit(cs)).alias("_cx1"),
        _fdiv(F.least(by0, by1) - 2, F.lit(cs)).alias("_cy0"),
        _fdiv(F.greatest(by0, by1) + 2, F.lit(cs)).alias("_cy1"),
    )
    return (
        sub.withColumn("_cx", F.explode(F.sequence(F.col("_cx0"), F.col("_cx1"))))
        .withColumn("_cy", F.explode(F.sequence(F.col("_cy0"), F.col("_cy1"))))
        .select(
            F.expr("shiftleft(_cx, 32) | (_cy & 4294967295)").alias("cell"),
            "sid", "x1", "y1", "x2", "y2",
        )
    )


def _pair_verify_fn(cell_size: int, max_block_pairs: int = 4_000_000):
    """Fused per-cell pair generation + verification (r6): consumes the
    cell-partitioned cover, sorts it by (cell, sid) in NumPy, dedups
    (cell, sid), generates every intra-cell i<j pair grouped by cell
    SIZE CLASS (one ``triu_indices`` template per distinct size, applied
    to all same-size cells at once), verifies with ``_proper_mask``, and
    emits only surviving (id_a, id_b) rows.

    Replaces the r5 shape (cover computed TWICE → broadcast hash join →
    candidate rows Arrow-shipped into a separate ``_verify``): candidate
    pairs now exist only as transient NumPy index arrays inside the one
    Python stage — measured 6.05M candidate rows × 80 B that no longer
    cross the JVM↔Python boundary at the sf0.1 gate (guide §4.2, §2.3).
    ``max_block_pairs`` bounds the per-emission NumPy block so a hot
    cell cannot blow task memory.

    Output is globally DISTINCT already (r6b): a surviving pair is
    emitted only from the floor cell of its exact intersection point
    (``_ref_cell_mask`` — the reference-point rule), so the downstream
    pair shuffle + distinct stage is gone (guide §2.4 "remove shuffles
    outright"; measured: the distinct stage was ~0.7 s steady / 3.9 s
    first-JVM-trial and shuffled 22 MB of pairs at the sf0.1 gate).
    """

    def _pairs(batches):
        chunks = [pdf for pdf in batches if len(pdf)]
        empty = pd.DataFrame(
            {"id_a": np.empty(0, np.int64), "id_b": np.empty(0, np.int64)}
        )
        if not chunks:
            yield empty
            return
        cell = np.concatenate([c["cell"].to_numpy(np.int64) for c in chunks])
        sid = np.concatenate([c["sid"].to_numpy(np.int64) for c in chunks])
        x1 = np.concatenate([c["x1"].to_numpy(np.int64) for c in chunks])
        y1 = np.concatenate([c["y1"].to_numpy(np.int64) for c in chunks])
        x2 = np.concatenate([c["x2"].to_numpy(np.int64) for c in chunks])
        y2 = np.concatenate([c["y2"].to_numpy(np.int64) for c in chunks])
        del chunks
        order = np.lexsort((sid, cell))
        cell, sid = cell[order], sid[order]
        x1, y1, x2, y2 = x1[order], y1[order], x2[order], y2[order]
        keep = np.empty(len(cell), dtype=bool)
        keep[0] = True
        keep[1:] = (cell[1:] != cell[:-1]) | (sid[1:] != sid[:-1])
        cell, sid = cell[keep], sid[keep]
        x1, y1, x2, y2 = x1[keep], y1[keep], x2[keep], y2[keep]
        starts = np.flatnonzero(np.concatenate([[True], cell[1:] != cell[:-1]]))
        sizes = np.diff(np.append(starts, len(cell)))
        emitted = False
        for n in np.unique(sizes):
            if n < 2:
                continue
            gs = starts[sizes == n]
            tri_a, tri_b = np.triu_indices(int(n), 1)
            per = len(tri_a)
            step = max(1, int(max_block_pairs // per))
            for s0 in range(0, len(gs), step):
                g = gs[s0 : s0 + step]
                ia = (g[:, None] + tri_a[None, :]).ravel()
                ib = (g[:, None] + tri_b[None, :]).ravel()
                mask = _proper_mask(
                    x1[ia], y1[ia], x2[ia], y2[ia], x1[ib], y1[ib], x2[ib], y2[ib]
                )
                if mask.any():
                    ja, jb = ia[mask], ib[mask]
                    ok = _ref_cell_mask(
                        cell[ja], x1[ja], y1[ja], x2[ja], y2[ja],
                        x1[jb], y1[jb], x2[jb], y2[jb], cell_size,
                    )
                    if ok.any():
                        emitted = True
                        # sid ascending within a cell ⇒ id_a < id_b for free
                        yield pd.DataFrame(
                            {"id_a": sid[ja[ok]], "id_b": sid[jb[ok]]}
                        )
        if not emitted:
            yield empty

    return _pairs


def segment_intersection_join(
    segs: DataFrame,
    id_col: str = "sid",
    x1: str = "x1",
    y1: str = "y1",
    x2: str = "x2",
    y2: str = "y2",
    cell_size: int = 1 << 16,
) -> DataFrame:
    """All PROPERLY-crossing segment pairs → (id_a, id_b), id_a < id_b.

    ``segs``: one row per segment with integer (fixed-point) endpoint
    columns. Exact for any int64 coordinates (see module docstring for
    the float-filter + bigint-fallback contract). ``cell_size`` trades
    cover rows (∝ length/cell_size) against per-cell candidate density.
    """
    if cell_size < 2:
        raise ValueError(f"cell_size must be >= 2, got {cell_size}")
    slim = segs.select(
        F.col(id_col).cast("long").alias("sid"),
        F.col(x1).cast("long").alias("x1"),
        F.col(y1).cast("long").alias("y1"),
        F.col(x2).cast("long").alias("x2"),
        F.col(y2).cast("long").alias("y2"),
    )
    # r6 plan shape (guide §2.4, §4.2): one Catalyst cover (no Python),
    # ONE exchange clustering the cover by cell, one fused Python stage
    # that pairs + verifies + reference-point-dedups inside NumPy — the
    # plan ends at the Python stage. The r5 shape computed the cover twice, broadcast-
    # built a multi-MB hashed relation over it, and Arrow-shipped every
    # candidate pair into a separate verify stage. The explicit-count
    # repartition keeps the pairing stage spread (AQE would coalesce the
    # few-MB cover shuffle to 1-2 tasks and serialize the NumPy work);
    # the count follows spark.sql.shuffle.partitions — the cluster-scale
    # knob — not a local constant. Hot cells are governed by cell_size
    # (candidate density is per-cell-quadratic, as before).
    spark = segs.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    cov = catalyst_cover(slim, cell_size)
    return cov.repartition(n_part, "cell").mapInPandas(
        _pair_verify_fn(cell_size), schema="id_a long, id_b long"
    )
