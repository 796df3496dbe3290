"""Polyline simplification: exact Ramer–Douglas–Peucker per line.

The zoom-dependent geometry-reduction step every tile pipeline runs
before the vector sinks (reference anchor: the renderer draws raw way
polylines, render-roads.rs — at low zooms a simplified way is the
standard substitute; `tiling.tile_assign_segments` + `render.py` consume
the output unchanged).

Semantics — Ramer's LINE-distance variant, EXACT integer arithmetic:

- per line (ordered vertices), recurse on ranges (lo, hi): find the
  interior vertex maximizing the squared distance to the infinite line
  through v[lo], v[hi]; if that maximum exceeds eps, KEEP it and recurse
  on both halves, else drop every interior vertex of the range;
- the distance compare is rational-exact: cross((b−a), (p−a))² > eps²·|b−a|²
  — arbitrary-precision Python ints engine-side (cross² exceeds int64 at
  WGS84 fixed-point scale), HUGEINT in the SQL oracle;
- degenerate chord (v[lo] == v[hi], e.g. closed rings): the metric falls
  back to squared POINT distance to v[lo] (> eps²);
- argmax ties break to the SMALLEST index — pinned on both sides;
- endpoints are always kept; single-vertex lines pass through.

The kept set is a deterministic function of the ranges (stack order is
irrelevant), which is what makes the recursion restatable as a DuckDB
recursive CTE (the gate's oracle): each range row computes its split
with correlated subqueries and emits its two children; the kept
vertices are exactly the distinct range endpoints.

Scale shape: one groupBy(key) shuffle into ``applyInPandas``; each line
simplifies independently (the per-line DP is genuinely recursive — the
legitimate Arrow-batch Python case, like the PIP refine). Worst case
O(n²) per line with n = vertices per line — bounded by the line, never
by the corpus; at OSM scale ways are ~10²-10³ vertices.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dp_keep(xs: list, ys: list, eps2: int) -> list:
    """Exact-int RDP keep mask (module-level: picklable, unit-testable)."""
    n = len(xs)
    keep = [False] * n
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo <= 1:
            continue
        ax, ay, bx, by = xs[lo], ys[lo], xs[hi], ys[hi]
        dx, dy = bx - ax, by - ay
        degenerate = dx == 0 and dy == 0
        thr = eps2 if degenerate else eps2 * (dx * dx + dy * dy)
        best, bestm = -1, -1
        for i in range(lo + 1, hi):
            if degenerate:
                px, py = xs[i] - ax, ys[i] - ay
                m = px * px + py * py
            else:
                c = dx * (ys[i] - ay) - dy * (xs[i] - ax)
                m = c * c
            if m > bestm:
                bestm, best = m, i
        if bestm > thr:
            keep[best] = True
            stack.append((lo, best))
            stack.append((best, hi))
    return keep


def simplify_lines(
    vertices: DataFrame,
    key: str | list[str],
    eps: int,
    order_cols: tuple = (),
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """→ the kept subset of ``vertices`` rows (all input columns pass
    through unchanged), per-line exact RDP at tolerance ``eps`` (same
    fixed-point units as ``lat``/``lon``)."""
    if eps < 0:
        raise ValueError(f"eps must be >= 0, got {eps}")
    keys = [key] if isinstance(key, str) else list(key)
    order = list(order_cols)
    if not order:
        raise ValueError("order_cols is required (RDP is order-defined)")
    eps2 = int(eps) * int(eps)
    schema = vertices.schema
    latc, lonc = lat, lon

    def _simplify(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.sort_values(order, kind="mergesort")
        if len(g) <= 2:
            return g
        xs = [int(v) for v in g[lonc]]
        ys = [int(v) for v in g[latc]]
        return g.loc[_dp_keep(xs, ys, eps2)]

    pts = vertices.filter(F.col(lat).isNotNull() & F.col(lon).isNotNull())
    return pts.groupBy(*keys).applyInPandas(_simplify, schema=schema)
