"""Exact point-in-polygon + polygon bbox index (the broadcast "R-tree").

No shapely in the image, so the refinement kernel is a from-scratch
vectorized NumPy crossing-number test in pure int64 arithmetic — exact
(no float epsilon anywhere), with on-boundary defined as inside. This is
the exact-refinement phase of the two-phase cell-cover spatial join
(north rule), playing the role the hand-fused Rust predicate pipelines
play in the reference (e.g. tag predicates over raw bytes,
osmflat/src/tags.rs:35-84 — late, exact, vectorized evaluation).

``PolygonIndex`` is the broadcast-side structure: packed vertex arrays +
bboxes, picklable, built once on the driver and shipped to every executor
inside the pandas-UDF closure (the analog of the reference's broadcast
id-dictionary, osmflatc/src/ids.rs:96-158).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

_CHUNK = 65536
# max elements in one (ring_vertices x point_chunk) intermediate: 2^22
# elements ~ 34 MB per int64 array, ~8 live arrays ~ 270 MB per task
_ELEM_BUDGET = 1 << 22


def points_in_polygon(px: np.ndarray, py: np.ndarray, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Vectorized exact crossing-number containment.

    px/py: point coords (int64, fixed-point lon/lat); xs/ys: polygon ring
    vertices (implicit closure). Returns bool array; boundary counts as
    inside. All comparisons are integer-exact.
    """
    px = np.asarray(px, dtype=np.int64)
    py = np.asarray(py, dtype=np.int64)
    xs = np.asarray(xs, dtype=np.int64)
    ys = np.asarray(ys, dtype=np.int64)
    _assert_domain(px, py, xs, ys)
    out = np.zeros(px.shape[0], dtype=bool)
    # chunk sized so E*chunk stays bounded: the kernel materializes ~8
    # (E x chunk) int64/bool intermediates, so a fixed 65536-point chunk
    # against a 100k-vertex ring would need ~52 GB per array (executor
    # OOM); with the element budget the footprint is constant regardless
    # of ring size (r3 review)
    chunk = max(1, min(_CHUNK, _ELEM_BUDGET // max(1, xs.shape[0])))
    for s in range(0, px.shape[0], chunk):
        out[s : s + chunk] = _pip_chunk(px[s : s + chunk], py[s : s + chunk], xs, ys)
    return out


_LON_BOUND = 1_800_000_000  # ±180° fixed-point
_LAT_BOUND = 900_000_000  # ±90° fixed-point


def _assert_domain(px, py, xs, ys) -> None:
    """Exactness precondition (asserted, not assumed): inputs must be
    WGS84 fixed-point, |lon| ≤ 180°·SCALE and |lat| ≤ 90°·SCALE. Within
    that domain every product in the kernel is a (lon-delta ≤ 3.6e9) ×
    (lat-delta ≤ 1.8e9) ≤ 6.48e18 < 2^63 (exact int64), and the one
    subtraction that can exceed 2^63 (``cross``) wraps mod 2^64 with
    |true value| ≤ 1.296e19 < 2^64, so its ``== 0`` test cannot alias a
    nonzero value. Outside the domain int64 overflow would be silent —
    hence the check (ADVICE r01: the old comment promised a fallback
    that never existed; the real invariant is this domain restriction)."""
    for arr, bound in ((px, _LON_BOUND), (xs, _LON_BOUND), (py, _LAT_BOUND), (ys, _LAT_BOUND)):
        if arr.size and int(np.abs(arr).max()) > bound:
            raise ValueError(
                f"points_in_polygon: coordinate {int(np.abs(arr).max())} outside the "
                f"±{bound} WGS84 fixed-point domain the exact int64 kernel requires"
            )


def _pip_chunk(px: np.ndarray, py: np.ndarray, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    x1 = xs[:, None]  # (E, 1)
    y1 = ys[:, None]
    x2 = np.roll(xs, -1)[:, None]
    y2 = np.roll(ys, -1)[:, None]
    p_x = px[None, :]  # (1, N)
    p_y = py[None, :]

    dxe = (x2 - x1).astype(np.int64)
    dye = (y2 - y1).astype(np.int64)
    dxp = (p_x - x1).astype(np.int64)
    dyp = (p_y - y1).astype(np.int64)

    # Each product is (lon-delta ≤ 3.6e9) × (lat-delta ≤ 1.8e9) ≤ 6.48e18
    # < 2^63 — exact int64 (domain asserted in _assert_domain). Collinearity
    # is tested as product EQUALITY, never as a sign of a difference, so no
    # wraparound reasoning is needed anywhere in the kernel.
    lhs = dxe * dyp  # dxe*(py-y1)
    rhs = dye * dxp  # dye*(px-x1)

    # boundary: collinear AND within the segment's bbox
    on_line = lhs == rhs
    within = (
        (np.minimum(x1, x2) <= p_x)
        & (p_x <= np.maximum(x1, x2))
        & (np.minimum(y1, y2) <= p_y)
        & (p_y <= np.maximum(y1, y2))
    )
    on_boundary = (on_line & within).any(axis=0)

    # crossing number: edge straddles the horizontal ray (half-open to
    # handle vertices hit by the ray exactly once)
    straddles = (y1 > p_y) != (y2 > p_y)
    # point is strictly left of the edge at ray height:
    #   px < x1 + (py-y1) * dxe/dye  ⟺  sign-aware integer compare
    left = np.where(dye > 0, rhs < lhs, rhs > lhs)
    crossings = (straddles & left).sum(axis=0)

    return on_boundary | (crossings % 2 == 1)


def convex_contains(px: np.ndarray, py: np.ndarray, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Half-plane conjunction for a CCW convex ring (boundary inclusive).
    Exact int64; SQL-expressible (the cross-engine oracle form)."""
    px = np.asarray(px, dtype=np.int64)[None, :]
    py = np.asarray(py, dtype=np.int64)[None, :]
    xs = np.asarray(xs, dtype=np.int64)
    ys = np.asarray(ys, dtype=np.int64)
    _assert_domain(px.ravel(), py.ravel(), xs, ys)
    x1, y1 = xs[:, None], ys[:, None]
    x2, y2 = np.roll(xs, -1)[:, None], np.roll(ys, -1)[:, None]
    # cross ≥ 0 tested as product comparison (each side exact int64; a
    # subtraction could wrap past 2^63 and flip the sign)
    return ((x2 - x1) * (py - y1) >= (y2 - y1) * (px - x1)).all(axis=0)


@dataclass
class PolygonIndex:
    """Broadcastable packed polygon set with bbox pre-filter.

    CSR-style layout (ids + offsets + flat vertex arrays) so pickling is
    cheap and per-executor reconstruction is zero-copy — the Spark analog
    of an STRtree built once per executor from a broadcast payload.
    """

    ids: list[str]
    offsets: np.ndarray  # (P+1,) int64
    xs: np.ndarray  # flat lon vertices, int64 fixed-point
    ys: np.ndarray  # flat lat vertices
    bbox: np.ndarray = field(default=None)  # (P, 4): xmin, xmax, ymin, ymax

    @classmethod
    def build(cls, polys: list[tuple[str, np.ndarray, np.ndarray]]) -> "PolygonIndex":
        ids = [p[0] for p in polys]
        offsets = np.zeros(len(polys) + 1, dtype=np.int64)
        for i, (_, xs, _) in enumerate(polys):
            offsets[i + 1] = offsets[i] + len(xs)
        xs = np.concatenate([np.asarray(p[1], dtype=np.int64) for p in polys]) if polys else np.array([], np.int64)
        ys = np.concatenate([np.asarray(p[2], dtype=np.int64) for p in polys]) if polys else np.array([], np.int64)
        idx = cls(ids=ids, offsets=offsets, xs=xs, ys=ys)
        idx.bbox = np.stack(
            [
                np.array(
                    [
                        xs[offsets[i] : offsets[i + 1]].min(),
                        xs[offsets[i] : offsets[i + 1]].max(),
                        ys[offsets[i] : offsets[i + 1]].min(),
                        ys[offsets[i] : offsets[i + 1]].max(),
                    ]
                )
                for i in range(len(ids))
            ]
        ) if ids else np.zeros((0, 4), dtype=np.int64)
        return idx

    def ring(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        s, e = self.offsets[i], self.offsets[i + 1]
        return self.xs[s:e], self.ys[s:e]

    def contains(self, i: int, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """bbox pre-filter then exact PIP for polygon ``i`` over a point
        batch — the per-(cell, polygon) refinement kernel."""
        xmin, xmax, ymin, ymax = self.bbox[i]
        cand = (px >= xmin) & (px <= xmax) & (py >= ymin) & (py <= ymax)
        out = np.zeros(px.shape[0], dtype=bool)
        if cand.any():
            xs, ys = self.ring(i)
            out[cand] = points_in_polygon(px[cand], py[cand], xs, ys)
        return out
