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

Scale design, in plan order:

1. **Cover** (`_covers`, Arrow-batched): each segment is covered by
   every grid cell that contains any of its points. The construction is
   the subpiece-bbox method, EXACT in int64 end-to-end: split the
   segment at m = ceil(max(|dx|,|dy|)/cell_size) + 1 parameter
   breakpoints (so each subpiece's bbox spans < 2 cells per axis), take
   each subpiece's integer-floor breakpoint bbox padded by 1 unit (the
   floor-division error bound — a line segment is coordinate-monotone,
   so consecutive breakpoints ARE the subpiece bbox corners), and emit
   the ≤ 3×3 cells that bbox overlaps. The union over subpieces is a
   SUPERSET of every floor cell the segment passes through, so two
   properly-crossing segments always share the cell containing their
   intersection point — candidate generation is lossless with NO
   dilation step. Cover size scales with segment length / cell_size
   (the standard trade; ``cell_size`` is the knob).
2. **Candidate join**: one shuffle on the packed cell key; the per-row
   payload is the 4 fixed-width endpoint ints — bounded, unlike
   shipping variable geometry (the r4 pip_join_shuffle ring-payload
   lesson). Verification runs PIPELINED in the join stage (no exchange
   between them): a pair sharing k cells is verified k times — k is
   small and the test is vectorized arithmetic — which is strictly
   cheaper than the alternative (dedup first = shuffling every 80-byte
   candidate row by pair key before the filter). The final `distinct`
   then shuffles only the SURVIVING 16-byte pairs.
3. **Verify** (`_proper_sign`): the classic 4-orientation sign test.
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


def _cover_fn(cell_size: int):
    cs = int(cell_size)

    def _covers(batches):
        for pdf in batches:
            sid = pdf["sid"].to_numpy(np.int64)
            x1 = pdf["x1"].to_numpy(np.int64)
            y1 = pdf["y1"].to_numpy(np.int64)
            x2 = pdf["x2"].to_numpy(np.int64)
            y2 = pdf["y2"].to_numpy(np.int64)
            if len(sid) == 0:
                yield pd.DataFrame(
                    {c: np.empty(0, np.int64) for c in ("cell", "sid", "x1", "y1", "x2", "y2")}
                )
                continue
            dx, dy = x2 - x1, y2 - y1
            m = np.maximum(np.abs(dx), np.abs(dy)) // cs + 1  # subpieces per segment
            total = int(m.sum())
            row = np.repeat(np.arange(len(sid)), m)  # segment index per subpiece
            # i-th subpiece of its segment (0-based within the segment)
            i0 = np.concatenate([[0], np.cumsum(m)[:-1]])
            i = np.arange(total) - np.repeat(i0, m)
            # integer breakpoints P(i/m), floor division (error in [0,1))
            mi = m[row]
            bx0 = x1[row] + (dx[row] * i) // mi
            by0 = y1[row] + (dy[row] * i) // mi
            bx1_ = x1[row] + (dx[row] * (i + 1)) // mi
            by1_ = y1[row] + (dy[row] * (i + 1)) // mi
            # padded subpiece bbox covers the true piece (monotone coords)
            lox = np.minimum(bx0, bx1_) - 1
            hix = np.maximum(bx0, bx1_) + 1
            loy = np.minimum(by0, by1_) - 1
            hiy = np.maximum(by0, by1_) + 1
            cx0, cx1 = lox // cs, hix // cs
            cy0, cy1 = loy // cs, hiy // cs
            # bbox extent < 2·cs ⇒ at most 3 cells per axis
            outs = []
            for ox in range(3):
                for oy in range(3):
                    cx = cx0 + ox
                    cy = cy0 + oy
                    keep = (cx <= cx1) & (cy <= cy1)
                    if keep.any():
                        outs.append(
                            np.stack([_pack_cell(cx[keep], cy[keep]), row[keep]], axis=1)
                        )
            cells = np.concatenate(outs)
            # (cell, segment) dedup within batch. lexsort + consecutive
            # mask, NOT np.unique(axis=0): unique's void-view sort on a
            # 2-column int64 array is ~10x slower at millions of rows
            # (measured on the snap gate's 15M-row cover)
            order = np.lexsort((cells[:, 1], cells[:, 0]))
            cells = cells[order]
            keep = np.empty(len(cells), dtype=bool)
            keep[0] = True
            np.any(cells[1:] != cells[:-1], axis=1, out=keep[1:])
            cells = cells[keep]
            r = cells[:, 1]
            yield pd.DataFrame(
                {
                    "cell": cells[:, 0],
                    "sid": sid[r],
                    "x1": x1[r],
                    "y1": y1[r],
                    "x2": x2[r],
                    "y2": y2[r],
                }
            )

    return _covers


def _verify(batches):
    for pdf in batches:
        if len(pdf) == 0:
            yield pd.DataFrame({"id_a": np.empty(0, np.int64), "id_b": np.empty(0, np.int64)})
            continue
        keep = _proper_mask(
            *(pdf[c].to_numpy(np.int64) for c in
              ("ax1", "ay1", "ax2", "ay2", "bx1", "by1", "bx2", "by2"))
        )
        yield pd.DataFrame({"id_a": pdf["id_a"].to_numpy(np.int64)[keep],
                            "id_b": pdf["id_b"].to_numpy(np.int64)[keep]})


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
    cov = slim.mapInPandas(
        _cover_fn(cell_size),
        schema="cell long, sid long, x1 long, y1 long, x2 long, y2 long",
    )
    a = cov.select(
        "cell",
        F.col("sid").alias("id_a"),
        F.col("x1").alias("ax1"),
        F.col("y1").alias("ay1"),
        F.col("x2").alias("ax2"),
        F.col("y2").alias("ay2"),
    )
    b = cov.select(
        "cell",
        F.col("sid").alias("id_b"),
        F.col("x1").alias("bx1"),
        F.col("y1").alias("by1"),
        F.col("x2").alias("bx2"),
        F.col("y2").alias("by2"),
    )
    cand = a.join(b, "cell").filter(F.col("id_a") < F.col("id_b")).drop("cell")
    return cand.mapInPandas(_verify, schema="id_a long, id_b long").distinct()
