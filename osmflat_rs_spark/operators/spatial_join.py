"""Two-phase cell-cover point-in-polygon join (the north-rule centerpiece).

Phase 1 (coarse, pure JVM): encode every point into a quadtree cell
(``cell_id_expr`` — whole-stage-codegen'd) and equi-join against the
exploded polygon cell covers. The cover is a guaranteed superset (see
``cells.polygon_cover``), so phase 1 has **no false negatives**; it only
produces candidates.

Phase 2 (exact, vectorized Python): refine candidates with the exact
int64 crossing-number kernel over Arrow batches (``mapInPandas``), using
the broadcast ``PolygonIndex`` (the analog of the reference's broadcast
id-dictionary join, osmflatc/src/ids.rs:96-158 → SURVEY §2.3 J1).

Scale design:
- polygon side broadcast (dims are small relative to 10^12 points) → the
  join is map-side, NO shuffle of the point table at all;
- hot cells (one polygon covering a dense area) skew *task* sizes, not a
  shuffle — the optional ``salt`` repartitions candidates on
  (cell, pmod(xxhash64(point_id), salt)) so refinement batches balance
  across executors (north rule: salted repartitioning);
- ``cover_res`` trades cover size against candidate false-positive rate;
  default picks ~``target_cells_per_polygon`` cells per polygon bbox.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osmflat_rs_spark.functions import cells
from osmflat_rs_spark.functions.pip import PolygonIndex


def build_polygon_index(polygons: DataFrame) -> PolygonIndex:
    """Collect the (small) polygon table and pack it for broadcast."""
    rows = polygons.select("polygon_id", "ring").collect()
    polys = []
    for r in rows:
        xs = np.array([v["lon"] for v in r["ring"]], dtype=np.int64)
        ys = np.array([v["lat"] for v in r["ring"]], dtype=np.int64)
        polys.append((r["polygon_id"], xs, ys))
    return PolygonIndex.build(polys)


def _pick_res(index: PolygonIndex, target_cells: int) -> int:
    if len(index.ids) == 0:
        return 10
    spans_x = (index.bbox[:, 1] - index.bbox[:, 0]).max()
    spans_y = (index.bbox[:, 3] - index.bbox[:, 2]).max()
    return cells.pick_cover_res(int(spans_y), int(spans_x), target_cells)


def pip_join(
    points: DataFrame,
    polygons: DataFrame,
    point_id: str = "node_idx",
    lat: str = "lat",
    lon: str = "lon",
    cover_res: int | None = None,
    salt: int | None = None,
    target_cells_per_polygon: int = 256,
) -> DataFrame:
    """→ DataFrame(polygon_id, <point_id>) — exact containment pairs
    (boundary inclusive), bit-equal to the model oracle."""
    spark = points.sparkSession
    index = build_polygon_index(polygons)
    res = cover_res if cover_res is not None else _pick_res(index, target_cells_per_polygon)

    # driver-side cover build (polygon count is broadcast-small by design)
    cover_rows = []
    for i in range(len(index.ids)):
        xs, ys = index.ring(i)
        for c in cells.polygon_cover(xs, ys, res):
            cover_rows.append((int(c), i))
    cover = spark.createDataFrame(cover_rows, schema="cell long, poly_i int")

    pts = points.select(
        F.col(point_id).alias("_pt_id"),
        F.col(lat).cast("long").alias("_lat"),
        F.col(lon).cast("long").alias("_lon"),
    ).withColumn("cell", cells.cell_id_expr(F.col("_lat"), F.col("_lon"), res))

    candidates = pts.join(F.broadcast(cover), "cell")
    if salt:
        candidates = candidates.repartition(
            salt * points.sparkSession.sparkContext.defaultParallelism,
            F.col("cell"),
            F.pmod(F.xxhash64(F.col("_pt_id")), F.lit(salt)),
        )

    bc = spark.sparkContext.broadcast(index)

    def refine(batches):
        idx: PolygonIndex = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            keep_parts = []
            for poly_i, grp in pdf.groupby("poly_i", sort=False):
                mask = idx.contains(
                    int(poly_i),
                    grp["_lon"].to_numpy(np.int64),
                    grp["_lat"].to_numpy(np.int64),
                )
                if mask.any():
                    out = grp.loc[mask, ["_pt_id"]].copy()
                    out["polygon_id"] = idx.ids[int(poly_i)]
                    keep_parts.append(out)
            if keep_parts:
                yield pd.concat(keep_parts)[["polygon_id", "_pt_id"]]

    out_schema = f"polygon_id string, _pt_id {dict(points.dtypes)[point_id]}"
    return candidates.mapInPandas(refine, schema=out_schema).withColumnRenamed("_pt_id", point_id)
