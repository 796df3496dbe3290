"""Pluggable spatial-cell backend seam (VERDICT r02 #7).

The engine's spatial operators only need three capabilities from a cell
scheme, captured by :class:`CellBackend`:

1. ``cell_expr`` — assign each (lat, lon) point the ID of the one cell
   containing it at resolution ``res`` (JVM column expression preferred;
   a vectorized pandas UDF is acceptable for native-lib schemes);
2. ``polygon_cover_classified`` — a SUPERSET cover of a polygon (no
   false negatives) with an ``interior`` flag marking cells that lie
   entirely inside (the exact-refinement short-circuit);
3. the point-cell of (1) and the cover of (2) agree: a point inside the
   polygon always lands in a cover cell.

The default (and only always-available) backend is the built-in Morton
quadtree (``functions/cells.py``) — exact int64, hierarchical,
oracle-reproducible, zero native deps. ``H3Backend`` activates iff
``import h3`` succeeds (the wheel is not in this image), making the
north rule's "H3/S2 index" literally pluggable where wheels exist; its
containment modes map 1:1 onto the contract (``overlap`` ⇒ superset
cover, ``full`` ⇒ interior).

Reference provenance: the cell index generalizes the reference's sorted
id-dictionary lookup structure (osmflatc/src/ids.rs:96-158) to 2-D, per
the north rule; no reference analog exists for the backend seam itself.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column

from osmflat_rs_spark.functions import cells


class CellBackend:
    """Contract for a spatial cell scheme. See module docstring for the
    three capabilities; implementations must keep cover/point agreement
    or the two-phase join loses its no-false-negative guarantee."""

    name: str = "abstract"

    def cell_expr(self, lat_fixed: Column, lon_fixed: Column, res: int) -> Column:
        raise NotImplementedError

    def cell_np(self, lat_fixed: np.ndarray, lon_fixed: np.ndarray, res: int) -> np.ndarray:
        raise NotImplementedError

    def polygon_cover_classified(
        self, xs: np.ndarray, ys: np.ndarray, res: int
    ) -> tuple[np.ndarray, np.ndarray]:
        raise NotImplementedError


class MortonBackend(CellBackend):
    """Default: the built-in exact int64 Morton quadtree."""

    name = "morton"

    def cell_expr(self, lat_fixed, lon_fixed, res):
        return cells.cell_id_expr(lat_fixed, lon_fixed, res)

    def cell_np(self, lat_fixed, lon_fixed, res):
        return cells.cell_id_np(lat_fixed, lon_fixed, res)

    def polygon_cover_classified(self, xs, ys, res):
        return cells.polygon_cover_classified(xs, ys, res)


class H3Backend(CellBackend):
    """H3 hexagonal cells — active iff the ``h3`` wheel (v4 API) imports.

    ``cell_expr`` is a vectorized pandas UDF (H3 is a native lib — no JVM
    expression exists); at 10^12 rows the encode stays Arrow-batched and
    embarrassingly parallel, the same shape as the Morton hot path minus
    whole-stage codegen. Cover/interior come from
    ``h3.h3shape_to_cells_experimental`` containment modes: ``overlap``
    is a superset cover, ``full`` marks fully-contained cells — exactly
    the :class:`CellBackend` contract. Cell IDs are H3's uint64 as
    signed int64 (H3 indexes fit: the high bit is 0)."""

    name = "h3"

    def __init__(self):
        import h3  # noqa: F401 — availability gate

        self._h3 = h3

    @staticmethod
    def _encode_batch(la, lo, res):
        """Per-batch H3 encode → int64 cells. Uses the INT-NATIVE h3 API
        when present (h3.api.basic_int — no per-cell hex-string
        round-trip); the per-point Python call remains (h3-py exposes no
        vectorized encoder), so this path is Arrow-batched but NOT
        codegen-fast — at very large scale prefer the Morton default or a
        vectorized native binding."""
        import h3

        try:
            from h3.api import basic_int  # h3>=4 int-native API

            return [np.int64(np.uint64(basic_int.latlng_to_cell(a, o, res))) for a, o in zip(la, lo)]
        except ImportError:
            return [np.int64(np.uint64(int(h3.latlng_to_cell(a, o, res), 16))) for a, o in zip(la, lo)]

    def cell_expr(self, lat_fixed, lon_fixed, res):
        import pandas as pd
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        from osmflat_rs_spark.functions.geo import COORD_SCALE

        encode_batch = H3Backend._encode_batch

        @F.pandas_udf(T.LongType())
        def _encode(lat: pd.Series, lon: pd.Series) -> pd.Series:
            la = lat.to_numpy(dtype="float64") / COORD_SCALE
            lo = lon.to_numpy(dtype="float64") / COORD_SCALE
            return pd.Series(encode_batch(la, lo, res))

        return _encode(lat_fixed, lon_fixed)

    def cell_np(self, lat_fixed, lon_fixed, res):
        from osmflat_rs_spark.functions.geo import COORD_SCALE

        la = np.asarray(lat_fixed, dtype=np.float64) / COORD_SCALE
        lo = np.asarray(lon_fixed, dtype=np.float64) / COORD_SCALE
        return np.array(self._encode_batch(la, lo, res), dtype=np.int64)

    def polygon_cover_classified(self, xs, ys, res):
        from osmflat_rs_spark.functions.geo import COORD_SCALE

        h3 = self._h3
        ring = [(y / COORD_SCALE, x / COORD_SCALE) for x, y in zip(xs, ys)]
        shape = h3.LatLngPoly(ring)
        cover = h3.h3shape_to_cells_experimental(shape, res, contain="overlap")
        full = set(h3.h3shape_to_cells_experimental(shape, res, contain="full"))
        ids = np.array([np.int64(np.uint64(int(c, 16))) for c in cover], dtype=np.int64)
        interior = np.array([c in full for c in cover], dtype=bool)
        return ids, interior


class RowMajorBackend(CellBackend):
    """Row-major grid IDs over the same quantization as Morton — a second
    always-available scheme. Exists to prove (and test) that the spatial
    operators are cell-scheme agnostic: identical grid, completely
    different ID bit layout, so any hidden dependence on Morton ordering
    diverges immediately. Also the template for wiring a native-lib
    backend: only ``cell_expr`` + ``polygon_cover_classified`` matter."""

    name = "rowmajor"

    def cell_expr(self, lat_fixed, lon_fixed, res):
        from pyspark.sql import functions as F

        ix = cells._quantize_expr(lon_fixed, cells._LON_OFF, cells._LON_SPAN, res)
        iy = cells._quantize_expr(lat_fixed, cells._LAT_OFF, cells._LAT_SPAN, res)
        cell = (
            F.shiftleft(F.lit(1).cast("long"), 2 * res)
            .bitwiseOR(F.shiftleft(iy, res))
            .bitwiseOR(ix)
        )
        return cells._null_if_coords_null(cell, lat_fixed, lon_fixed)

    @staticmethod
    def _id_np(ix, iy, res):
        """The row-major ID formula, ONE place for both NumPy callers —
        the backend contract is cover/point agreement, so the point
        encoder and the cover encoder must never drift (cell_expr is the
        Column twin of this exact expression)."""
        return ((np.int64(1) << np.int64(2 * res)) | (iy.astype(np.int64) << np.int64(res)) | ix).astype(
            np.int64
        )

    def cell_np(self, lat_fixed, lon_fixed, res):
        ix, iy = cells.grid_coords_np(lat_fixed, lon_fixed, res)
        return self._id_np(ix, iy, res)

    def polygon_cover_classified(self, xs, ys, res):
        cs, interior = cells.polygon_cover_classified(xs, ys, res)
        ix, iy = cells.cell_to_grid_np(cs, res)
        return self._id_np(ix, iy, res), interior


def available_backends() -> list[str]:
    out = ["morton", "rowmajor"]
    try:
        import h3  # noqa: F401

        out.append("h3")
    except ImportError:
        pass
    return out


def get_backend(name: str | None = None) -> CellBackend:
    """Resolve a backend by name; ``None`` → the Morton default."""
    if name is None or name == "morton":
        return MortonBackend()
    if name == "rowmajor":
        return RowMajorBackend()
    if name == "h3":
        return H3Backend()  # raises ImportError iff the wheel is absent
    raise ValueError(f"unknown cell backend {name!r}; available: {available_backends()}")
