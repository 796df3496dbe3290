"""D8 flow direction + flow accumulation over the density grid — the
standard GIS hydrology pair (ESRI/GRASS ``r.flow``/``flowacc``), here
over the occupied-cell density surface the raster family already uses
(hillshade/viewshed/KDE all share the same ``grid_exprs`` cells; the
reference's raster side is the render grid, render-roads.rs:71-81).

Semantics (sparse density grid, exact integers):

- z(cell) = point count (or an integer-valued ``value_col`` sum); only
  OCCUPIED cells participate — absent cells are not surface, so flow
  never routes through them (sparse-grid semantics, NOT DEM nodata
  filling).
- D8 receiver = the 8-neighbor with the steepest STRICT descent, slope
  = drop/distance with distance 1 (orthogonal) or √2 (diagonal). The
  compare is exact int64: drop²·(2/d²) — orthogonal keys scale ×2,
  diagonal ×1 — so no float ever enters the argmax. Ties break by the
  canonical neighbor order N8 (E, W, N, S, NE, SE, NW, SW — smallest
  index wins), pinned identically in the SQL oracle.
- Cells with no strictly-lower occupied neighbor (pits, plateau cells,
  outlets) have a NULL receiver.
- accumulation(v) = Σ weights of the cells strictly upstream of v
  (excluding v itself — the ESRI convention); weight is 1 per cell by
  default or the cell's z (mass-weighted drainage).

Scale shape: direction is ONE map-side-combined groupBy (points →
cells), an 8-way in-row fan (explode of a constant array — no join), a
re-aggregate keyed by cell, and a pure-codegen in-row argmax over ≤8
collected candidates. Accumulation peels the drainage forest leaf-front
by leaf-front: each round is two frontier-sized joins + one partial-agg
push (the ``graph.shortest_paths`` delta-relaxation discipline — work is
sized by the CURRENT frontier, never the whole grid), ``localCheckpoint``
per round cuts the lineage. Round count = drainage-tree height, which on
integer densities is ≤ max(z) and in practice tiny; a pointer-doubling
form would cut it to O(log height) at the cost of shuffling the full
node set per round — the peel is the right trade while height ≪ n/cores.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osmflat_rs_spark.plans.checkpoint import fresh_local_checkpoint

# canonical D8 neighbor offsets (ox, oy) OF THE NEIGHBOR relative to the
# cell, in tie-break priority order; m = 2 / d² (orthogonal 2, diagonal 1)
# so key = drop²·m compares slopes exactly without division
N8 = [(1, 0), (-1, 0), (0, 1), (0, -1), (1, 1), (1, -1), (-1, 1), (-1, -1)]


def _offsets_array() -> Column:
    return F.array(
        *[
            F.struct(
                F.lit(ox).cast("int").alias("ox"),
                F.lit(oy).cast("int").alias("oy"),
                F.lit(i).cast("int").alias("i"),
                F.lit(2 if ox * oy == 0 else 1).cast("long").alias("m"),
            )
            for i, (ox, oy) in enumerate(N8)
        ]
    )


def flow_direction_grid(
    pts: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    res: int = 16,
    value_col: str | None = None,
) -> DataFrame:
    """→ (ix, iy, z, rx, ry): every occupied grid cell with its density
    z and its D8 receiver cell (rx, ry) — NULL for pits/plateaus/outlets.

    Exactness contract: z must be integer-valued (counts, or an integer
    ``value_col`` sum) so the drop²·m keys are exact int64; the argmax is
    an in-row ``array_max`` over structs (key desc, then canonical index
    asc via negated index) — whole-stage codegen, no Python, no window."""
    from osmflat_rs_spark.functions.cells import grid_exprs

    ix, iy = grid_exprs(F.col(lat), F.col(lon), res)
    base = pts.filter(F.col(lat).isNotNull() & F.col(lon).isNotNull())
    z_agg = (
        F.sum(F.col(value_col)).cast("long") if value_col is not None else F.count(F.lit(1))
    ).alias("z")
    per_cell = base.groupBy(ix.alias("ix"), iy.alias("iy")).agg(z_agg)

    nb_t = "struct<nz:bigint,ox:int,oy:int,i:int,m:bigint>"
    fan = per_cell.select(
        F.explode(_offsets_array()).alias("o"), "ix", "iy", "z"
    ).select(
        (F.col("ix") - F.col("o.ox")).alias("tx"),
        (F.col("iy") - F.col("o.oy")).alias("ty"),
        F.lit(None).cast("long").alias("z_self"),
        F.struct(
            F.col("z").alias("nz"), F.col("o.ox"), F.col("o.oy"), F.col("o.i"), F.col("o.m")
        ).alias("nb"),
    )
    selfr = per_cell.select(
        F.col("ix").alias("tx"),
        F.col("iy").alias("ty"),
        F.col("z").alias("z_self"),
        F.lit(None).cast(nb_t).alias("nb"),
    )
    agg = (
        selfr.unionByName(fan)
        .groupBy("tx", "ty")
        .agg(
            F.max("z_self").alias("z"),
            F.collect_list("nb").alias("nbs"),  # nulls are skipped; ≤8 elems
        )
        .filter(F.col("z").isNotNull())  # fan targets that aren't occupied
    )
    z = F.col("z")
    cands = F.filter(F.col("nbs"), lambda n: n["nz"] < z)
    keyed = F.transform(
        cands,
        lambda n: F.struct(
            ((z - n["nz"]) * (z - n["nz"]) * n["m"]).alias("key"),
            (-n["i"]).alias("negi"),
            n["ox"].alias("ox"),
            n["oy"].alias("oy"),
        ),
    )
    best = F.array_max(keyed)
    return agg.select(
        F.col("tx").alias("ix"),
        F.col("ty").alias("iy"),
        "z",
        (F.col("tx") + best["ox"]).alias("rx"),
        (F.col("ty") + best["oy"]).alias("ry"),
    )


def flow_accumulation_grid(
    pts: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    res: int = 16,
    value_col: str | None = None,
    weight: str = "cells",
    max_iter: int = 100,
) -> DataFrame:
    """→ (ix, iy, z, rx, ry, acc): D8 flow accumulation — for each
    occupied cell, the total weight of cells strictly upstream of it
    (excluding itself; ESRI convention — sources are 0, confluences sum
    their tributaries). ``weight='cells'`` counts upstream cells;
    ``weight='z'`` accumulates upstream density mass.

    The drainage graph is a forest (each cell has ≤1 receiver, edges
    strictly decrease z, so no cycles by construction). Peeling: every
    round, the cells nobody still drains into (the current leaf front)
    push their subtree total one hop downstream and retire; a node
    becomes a leaf only after ALL its tributaries pushed, so each edge
    carries its full subtree weight exactly once. acc(v) = Σ pushes
    addressed to v across all rounds."""
    if weight not in ("cells", "z"):
        raise ValueError(f"weight must be 'cells' or 'z', got {weight!r}")
    dirs = flow_direction_grid(pts, lat, lon, res, value_col).transform(fresh_local_checkpoint)

    def pack(x, y):
        return F.shiftleft(x.cast("long"), 32) + y.cast("long")

    w0 = F.lit(1).cast("long") if weight == "cells" else F.col("z")
    active = (
        dirs.filter(F.col("rx").isNotNull())
        .select(pack(F.col("ix"), F.col("iy")).alias("id"), pack(F.col("rx"), F.col("ry")).alias("pid"), w0.alias("w"))
        .transform(fresh_local_checkpoint)
    )
    pushes: list[DataFrame] = []
    for _ in range(max_iter):
        if active.isEmpty():
            break
        parents = active.select(F.col("pid").alias("_p")).distinct()
        leaves = active.join(parents, active["id"] == parents["_p"], "left_anti")
        push = (
            leaves.groupBy("pid").agg(F.sum("w").alias("add")).transform(fresh_local_checkpoint)
        )
        if push.isEmpty():
            raise RuntimeError("flow_accumulation_grid: cycle in drainage graph (invariant broken)")
        pushes.append(push)
        rest = active.join(leaves.select("id"), "id", "left_anti")
        recv = push.select(F.col("pid").alias("id"), F.col("add").alias("_add"))
        active = (
            rest.join(recv, "id", "left")
            .select("id", "pid", (F.col("w") + F.coalesce(F.col("_add"), F.lit(0))).alias("w"))
            .transform(fresh_local_checkpoint)
        )
    else:
        raise RuntimeError(f"flow_accumulation_grid: no convergence in {max_iter} rounds")

    if pushes:
        allp = pushes[0]
        for p in pushes[1:]:
            allp = allp.unionByName(p)
        acc = allp.groupBy("pid").agg(F.sum("add").alias("acc"))
    else:
        acc = dirs.sparkSession.createDataFrame([], "pid long, acc long")
    out = dirs.join(
        acc.withColumnRenamed("pid", "_id"),
        pack(F.col("ix"), F.col("iy")) == F.col("_id"),
        "left",
    )
    return out.select(
        "ix", "iy", "z", "rx", "ry", F.coalesce(F.col("acc"), F.lit(0)).cast("long").alias("acc")
    )
