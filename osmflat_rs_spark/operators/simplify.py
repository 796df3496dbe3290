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


def chaikin_smooth(
    vertices: DataFrame,
    key: str | list[str],
    order_cols: tuple = (),
    iters: int = 2,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Chaikin corner-cutting smoothing (Chaikin 1974) → (key..., pos,
    lat_s, lon_s): the rendering-side complement of RDP — RDP REMOVES
    vertices within tolerance, Chaikin INSERTS the ¼/¾ subdivision
    points that round corners for display. Keep-endpoints variant:
    [P₀, Q₀, R₀, …, Q_{n−2}, R_{n−2}, P_{n−1}] per pass with
    Qᵢ = ¾Pᵢ + ¼Pᵢ₊₁ and Rᵢ = ¼Pᵢ + ¾Pᵢ₊₁.

    Exact-integer contract: output coordinates are scaled by 4^iters
    (each pass multiplies by 4: Q = 3Pᵢ + Pᵢ₊₁, R = Pᵢ + 3Pᵢ₊₁,
    endpoints by 4), so every value is an exact int64 — no float mixes,
    hash-exact oracle. Fixed-point world coords stay far under the
    bound (5.4e8 · 4² ≈ 8.6e9); ``iters`` ≤ 15 guarded.

    Plan shape: ONE groupBy shuffle collects each line's ordered vertex
    array; the K subdivision passes are IN-ROW Catalyst HOFs (sequence
    + F.get + flatten — zero Python, codegen) and the result explodes
    back to rows. Output size is ~2^K·n rows — K is small by nature
    (2-3 passes saturate visual smoothness). Singleton lines pass
    through (scaled)."""
    if not order_cols:
        raise ValueError("order_cols is required (smoothing is order-defined)")
    if not (1 <= iters <= 15):
        raise ValueError(f"iters must be in [1, 15], got {iters}")
    keys = [key] if isinstance(key, str) else list(key)
    pts = vertices.filter(F.col(lat).isNotNull() & F.col(lon).isNotNull())
    ordered = pts.groupBy(*keys).agg(
        F.array_sort(
            F.collect_list(
                F.struct(*[F.col(c) for c in order_cols], F.col(lat), F.col(lon))
            )
        ).alias("_arr")
    )
    arr = F.transform(
        F.col("_arr"), lambda s: F.struct(s[lat].cast("long").alias("la"), s[lon].cast("long").alias("lo"))
    )
    # each pass references its input array ~6 times; bind it to a real
    # projected column per pass so CollapseProject's non-cheap-alias
    # guard keeps the boundary and pass k evaluates ONCE per row (the
    # inlined form recomputes pass k-1 per element access — measured
    # superlinear blowup at 2 passes x 40-vertex lines)
    ordered = ordered.select(*keys, arr.alias("_arr"))
    arr = F.col("_arr")
    for _ in range(iters):
        n = F.size(arr)
        first, last = F.get(arr, 0), F.get(arr, n - 1)
        scale4 = lambda p: F.struct((4 * p["la"]).alias("la"), (4 * p["lo"]).alias("lo"))  # noqa: E731

        def _mid(a, i):
            p, q = F.get(a, i), F.get(a, i + 1)
            return F.array(
                F.struct((3 * p["la"] + q["la"]).alias("la"), (3 * p["lo"] + q["lo"]).alias("lo")),
                F.struct((p["la"] + 3 * q["la"]).alias("la"), (p["lo"] + 3 * q["lo"]).alias("lo")),
            )
        a_ref = arr
        nxt = F.when(n < 2, F.transform(arr, scale4)).otherwise(
            F.concat(
                F.array(scale4(first)),
                F.flatten(F.transform(F.sequence(F.lit(0), n - 2), lambda i: _mid(a_ref, i))),
                F.array(scale4(last)),
            )
        )
        ordered = ordered.select(*keys, nxt.alias("_arr"))
        arr = F.col("_arr")
    out = ordered.select(*keys, F.posexplode(arr).alias("pos", "_p"))
    return out.select(
        *keys, "pos", F.col("_p.la").alias("lat_s"), F.col("_p.lo").alias("lon_s")
    )
