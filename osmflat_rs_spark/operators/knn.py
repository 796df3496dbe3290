"""kNN lookup via cell-ring expansion + per-query top-k window.

North-rule operator (no reference analog — the reference's only lookup
structure is the id dictionary, osmflatc/src/ids.rs:96-158; this is its
spatial generalization).

Algorithm (exact, guaranteed):
1. start with a disk cover of radius r around each query point (cells at
   the points' index resolution);
2. equi-join points on cell (cover side broadcast — queries are few
   relative to points), exact haversine via a vectorized NumPy pandas UDF
   (bit-identical to the model oracle's kernel);
3. per-query top-k by (dist, point_id) with ``row_number() <= k``;
4. a query is *settled* when it found ≥k candidates AND its kth distance
   ≤ r (nothing outside the covered disk can beat rank k). Unsettled
   queries double r and repeat — a driver loop over a shrinking query
   set, ≤ O(log) rounds.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from osmflat_rs_spark.functions import cells
from osmflat_rs_spark.functions.geo import COORD_SCALE


@F.pandas_udf(T.DoubleType())
def haversine_np_udf(lat1: pd.Series, lon1: pd.Series, lat2: pd.Series, lon2: pd.Series) -> pd.Series:
    """NumPy haversine over fixed-point int columns — same formula order as
    oracle.haversine_np so ranking ties are bit-exact cross-checks.

    DELIBERATELY duplicated from oracle.haversine_np rather than calling
    it: the pandas oracle is the independent model implementation the
    engine is tested AGAINST — sharing the kernel would make that
    comparison tautological. Divergence is guarded by the engine-vs-model
    equality tests (tests/test_spatial.py) and the DuckDB SQL haversine
    gate (road_length_users)."""
    import numpy as np

    from osmflat_rs_spark.functions.geo import COORD_SCALE as S
    from osmflat_rs_spark.functions.geo import EARTH_RADIUS_M as R

    a1 = lat1.to_numpy(dtype="float64") / S
    o1 = lon1.to_numpy(dtype="float64") / S
    a2 = lat2.to_numpy(dtype="float64") / S
    o2 = lon2.to_numpy(dtype="float64") / S
    lat1r = np.radians(a1)
    lat2r = np.radians(a2)
    dlat_half = (np.radians(a2) - np.radians(a1)) / 2.0
    dlon_half = (np.radians(o2) - np.radians(o1)) / 2.0
    a = np.sin(dlat_half) * np.sin(dlat_half) + np.cos(lat1r) * np.cos(lat2r) * np.sin(dlon_half) * np.sin(
        dlon_half
    )
    return pd.Series(2.0 * np.arcsin(np.sqrt(a)) * R)


def _radius_candidates(
    points: DataFrame,
    queries: DataFrame,
    radius_m: float,
    res: int | None,
    metric: str,
    id_col: str,
    broadcast_cover: bool,
    be,
    cell_col: str | None,
):
    """Shared candidate stage of ``knn_join_bulk`` and ``radius_join``:
    point prep (null-coord filter + cell encode or precomputed
    ``cell_col``), vectorized disk/bbox cover generation, the cell
    equi-join, and the exact per-pair distance. Returns ``(cand, pts,
    with_dist)`` -- ``pts``/``with_dist`` feed knn's brute-force rescue
    branch. All contracts (cover superset exactness, broadcast vs
    sort-merge degrade, bucketed-layout fast path) are documented on
    ``knn_join_bulk``."""
    from osmflat_rs_spark.functions.cell_backend import MortonBackend

    if res is None and not isinstance(be, MortonBackend):
        raise ValueError(f"backend {be.name!r} requires an explicit res")
    if cell_col is not None and res is None:
        raise ValueError(
            "cell_col requires an explicit res (the resolution the column was "
            "written at — auto-sizing cannot know it)"
        )
    if res is None:
        # size cells to the search radius (~16 cover cells per query):
        # a res too coarse for the radius makes every covered cell drag
        # in its whole point population (measured: res 14 at a 200m
        # radius over 8M dense points → 77M candidates; auto-res → ~1M)
        span = (
            2 * int(radius_m)
            if metric == "sqeuclid"
            else 2 * int(radius_m / 111_320.0 * COORD_SCALE) + 1
        )
        res = cells.pick_cover_res(span, span, target_cells=16)
    # null-coordinate points are not kNN candidates in EITHER branch: the
    # fast path already excluded them (cell_id_expr yields a NULL cell,
    # which no cover cell equi-joins), but the brute-force rescue branch
    # computed dist_m = NULL for them, and a NULLS-FIRST ascending window
    # put them at rank 1..n of every unsettled query (ADVICE r03). One
    # explicit filter keeps the two branches consistent — same policy as
    # the phantom-cell null guard in cells._null_if_coords_null.
    pts = points.select(
        F.col(id_col).alias("_nid"), F.col("lat").cast("long"), F.col("lon").cast("long"),
        *([F.col(cell_col).alias("cell")] if cell_col is not None else []),
    ).filter(F.col("lat").isNotNull() & F.col("lon").isNotNull())
    if cell_col is None:
        pts = pts.withColumn("cell", be.cell_expr("lat", "lon", res))

    morton_fast = isinstance(be, MortonBackend)

    def gen_cover(batches):
        import math

        import numpy as np
        import pandas as pd

        r_int = int(math.ceil(radius_m))  # ceil: the bbox must contain the metric disk

        def scalar_rows(pdf, rows):
            for qid, la, lo in zip(pdf["query_id"], pdf["lat"], pdf["lon"]):
                if metric == "sqeuclid":
                    cover_cells = be.bbox_cover(
                        int(la) - r_int, int(la) + r_int, int(lo) - r_int, int(lo) + r_int, res
                    )
                else:
                    cover_cells = be.disk_cover(int(la), int(lo), radius_m, res)
                for c in cover_cells:
                    rows["query_id"].append(qid)
                    rows["q_lat"].append(int(la))
                    rows["q_lon"].append(int(lo))
                    rows["cell"].append(int(c))

        for pdf in batches:
            if not morton_fast:
                # non-Morton: per-query cover loop (see docstring contract)
                rows = {"query_id": [], "q_lat": [], "q_lon": [], "cell": []}
                scalar_rows(pdf, rows)
                yield pd.DataFrame(rows)
                continue
            # Morton: whole-batch NumPy (r5, VERDICT r4 #4 — no per-query
            # Python). sqeuclid covers the ±r bbox; haversine covers the
            # geodesic-disk bbox, vectorized for the common case with the
            # rare pole/antimeridian rows routed through the exact scalar
            # two-interval form.
            la = pdf["lat"].to_numpy(np.int64)
            lo = pdf["lon"].to_numpy(np.int64)
            if metric == "sqeuclid":
                cells_arr, owner = cells.bbox_cover_batch(
                    la - r_int, la + r_int, lo - r_int, lo + r_int, res
                )
                hard_idx = np.array([], dtype=np.int64)
            else:
                lat_lo, lat_hi, lon_lo, lon_hi, simple = cells.disk_bbox_fixed_batch(
                    la, lo, radius_m
                )
                s = np.flatnonzero(simple)
                cells_arr, owner_s = cells.bbox_cover_batch(
                    lat_lo[s], lat_hi[s], lon_lo[s], lon_hi[s], res
                )
                owner = s[owner_s]
                hard_idx = np.flatnonzero(~simple)
            out = pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy()[owner],
                    "q_lat": la[owner],
                    "q_lon": lo[owner],
                    "cell": cells_arr,
                }
            )
            if len(hard_idx):
                rows = {"query_id": [], "q_lat": [], "q_lon": [], "cell": []}
                scalar_rows(pdf.iloc[hard_idx], rows)
                out = pd.concat([out, pd.DataFrame(rows)], ignore_index=True)
            yield out

    if morton_fast and metric == "sqeuclid":
        # r6: the ±r bbox cover in PURE Catalyst (guide §4 — no Python
        # stage, no Arrow; at the 1M-query degrade design point this was
        # a ~16M-row Arrow production). Quantize the clamped bbox corners
        # with the exact cell_id_expr quantizer, enumerate the grid range
        # with sequence explodes, recombine with the table-lookup Morton
        # spread — the same cells bbox_cover_batch emits, bit-identical.
        import math as _math

        r_int = int(_math.ceil(radius_m))
        q_lat = F.col("lat").cast("long")
        q_lon = F.col("lon").cast("long")
        ix0 = cells.quantize_expr(q_lon - r_int, "lon", res)
        ix1 = cells.quantize_expr(q_lon + r_int, "lon", res)
        iy0 = cells.quantize_expr(q_lat - r_int, "lat", res)
        iy1 = cells.quantize_expr(q_lat + r_int, "lat", res)
        cover = (
            queries.select(
                "query_id", q_lat.alias("q_lat"), q_lon.alias("q_lon"),
                ix0.alias("_ix0"), ix1.alias("_ix1"), iy0.alias("_iy0"), iy1.alias("_iy1"),
            )
            .withColumn("_ix", F.explode(F.sequence(F.col("_ix0"), F.col("_ix1"))))
            .withColumn("_iy", F.explode(F.sequence(F.col("_iy0"), F.col("_iy1"))))
            .select(
                "query_id", "q_lat", "q_lon",
                cells.cell_from_grid_expr(F.col("_ix"), F.col("_iy"), res).alias("cell"),
            )
        )
    else:
        cover = queries.select("query_id", "lat", "lon").mapInPandas(
            gen_cover, schema="query_id string, q_lat long, q_lon long, cell long"
        )

    def with_dist(df: DataFrame) -> DataFrame:
        if metric == "sqeuclid":
            # |delta| clamped at 2^31-1 so dlat²+dlon² ≤ 2·(2^31-1)² < 2^63:
            # exact int64 with no ANSI overflow even in the brute-force
            # fallback, where lon deltas reach 3.6e9 (one raw square is
            # 1.3e19 > 2^63). The clamp is monotone, so ranking — and thus
            # top-k exactness — is unaffected whenever the kth true
            # neighbor lies within 2^31-1 units (≈ 214°·1e7-scale ⇒ ~21.4°
            # of lon); farther candidates saturate and tie-break by id.
            cap = F.lit((1 << 31) - 1).cast("long")
            dlat = F.least(F.abs(F.col("lat") - F.col("q_lat")), cap)
            dlon = F.least(F.abs(F.col("lon") - F.col("q_lon")), cap)
            return df.withColumn("dist_m", (dlat * dlat + dlon * dlon).cast("long"))
        return df.withColumn("dist_m", haversine_np_udf("q_lat", "q_lon", "lat", "lon"))

    cover_side = F.broadcast(cover) if broadcast_cover else cover
    cand = with_dist(pts.join(cover_side, "cell"))
    return cand, pts, with_dist


def knn_join_bulk(
    points: DataFrame,
    queries: DataFrame,  # (query_id, lat, lon) fixed-point
    k: int = 5,
    res: int | None = None,
    radius_m: float = 1000.0,
    metric: str = "haversine",
    id_col: str = "node_idx",
    exact_fallback: bool = True,
    broadcast_cover: bool = True,
    backend=None,
    cell_col: str | None = None,
) -> DataFrame:
    """Fully-distributed kNN — no driver loop, no per-round collect
    (contrast: ``knn_join`` below iterates driver-side, right for dozens
    of queries, wrong for millions). Construction is LAZY: no Spark jobs
    run until the returned DataFrame is acted on (asserted in
    tests/test_spatial.py::test_knn_bulk_construction_is_lazy).

    One candidate pass: each query explodes to its disk-cover cells
    (vectorized in ``mapInPandas``), equi-joins points on cell, exact
    distance, per-query top-k window. Queries whose kth distance exceeds
    ``radius_m`` (no exactness guarantee) or with <k candidates fall back
    to an exact broadcast scan — correct for ANY radius choice; ``radius_m``
    only tunes how much work takes the fast path.

    ``metric``:
      - ``"haversine"`` — geodesic meters (vectorized NumPy pandas UDF;
        ``radius_m`` in meters; cover = geodesic-disk bbox, cells.disk_cover);
      - ``"sqeuclid"`` — EXACT int64 squared euclidean distance in
        fixed-point coordinate units, pure JVM expression (no Python on
        the hot path; ``radius_m`` in fixed-point units; cover = the
        ±radius bbox, which is an exact superset of the metric disk).
        Settled test compares kth d² ≤ radius².

    ``broadcast_cover=True`` (default) hints the cover side of the
    candidate join for broadcast. The cover is |queries| × ~16 cells wide,
    so the broadcast path is bounded by the QUERY-SET size: it is right up
    to a few million query rows (the cover must fit the driver/executor
    broadcast limit), and it is mandatory protection for the point table
    — the cover's stats are opaque (mapInPandas output), so without the
    hint AQE would sort-merge and shuffle the entire point corpus. For
    query sets beyond broadcast range pass ``broadcast_cover=False``: the
    candidate join then shuffles BOTH sides on the cell key (sort-merge)
    — points move once, which is the correct degrade at that scale — or
    pre-bucket the points by cell (sources/bucketed.py) so only the cover
    side shuffles.

    ``exact_fallback=False`` drops the brute-force rescue branch from the
    plan entirely — use when settledness is guaranteed/asserted (e.g. the
    driver gate, which verifies it in tests): the whole plan is then the
    cell equi-join with zero full-corpus scans.

    ``backend`` (r4): a ``functions.cell_backend.CellBackend`` supplying
    point encode + disk/bbox covers (default Morton). The settledness
    guarantee is backend-independent — every backend's disk cover is
    composed from the SAME exact disk-bbox geometry
    (``cells.disk_bbox_fixed``) and the backend's superset
    ``bbox_cover``. Non-Morton backends require an explicit ``res``
    (resolution scales are scheme-specific). SCALE CONTRACT (r5): only
    the Morton default has a whole-batch vectorized cover stage (zero
    per-query Python); S2/H3 covers run one Python cover call per query
    (S2: a hierarchical refinement costing ~ms per query even with the
    rect memo) — fine for thousands of queries, unsuitable for the
    documented 1M-query bulk design point. Use Morton there.

    ``cell_col`` (r5 — the bucketed-layout fast path): name of a
    PRECOMPUTED cell column on ``points`` (written by
    ``cells.cluster_by_cell`` / a ``write_bucketed(..., 'cell')`` table
    at the SAME backend and ``res`` — caller contract, so ``res`` must
    be explicit). With a cell-bucketed table and
    ``broadcast_cover=False`` the candidate sort-merge join consumes
    the bucketed scan directly: the point table — the 10^12-row side —
    is joined with NO Exchange at all; only the query cover shuffles
    (plan-pinned in tests/test_plans.py)."""
    from osmflat_rs_spark.functions.cell_backend import MortonBackend

    be = backend or MortonBackend()
    cand, pts, with_dist = _radius_candidates(
        points, queries, radius_m, res, metric, id_col, broadcast_cover, be, cell_col
    )
    settle_bound = float(radius_m) ** 2 if metric == "sqeuclid" else float(radius_m)
    # asc_nulls_last is belt-and-braces: dist_m cannot be NULL after the
    # null-coordinate filter above, but a NULL must never outrank a real
    # distance if an upstream schema ever reintroduces one
    w = Window.partitionBy("query_id").orderBy(F.col("dist_m").asc_nulls_last(), F.col("_nid").asc())
    topk = (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "_nid", "dist_m")
    )
    if not exact_fallback:
        return topk.withColumnRenamed("_nid", id_col)

    # Lazy fallback (VERDICT r02 #6 — the old form ran an eager
    # unsettled.isEmpty() probe and persisted topk without unpersisting):
    # the settled check now lives IN the plan. `topk` is consumed three
    # times (fast path, settled stats, anti-join) but all three share one
    # identical window subtree, so physical planning reuses its shuffle
    # exchange — no persist, no cache leak, no job at construction. When
    # every query settles, the brute-force branch's broadcast build side
    # (`unsettled`) is empty and AQE's empty-relation propagation
    # collapses the branch at runtime, skipping the full point-table scan
    # — the same short-circuit the eager probe bought, now plan-level.
    settled_stats = topk.groupBy("query_id").agg(
        F.count("*").alias("n"), F.max("dist_m").alias("kd")
    )
    ok_ids = settled_stats.filter((F.col("n") >= k) & (F.col("kd") <= F.lit(settle_bound))).select("query_id")
    fast = topk.join(ok_ids, "query_id", "left_semi")
    unsettled = queries.join(ok_ids, "query_id", "left_anti").select(
        "query_id", F.col("lat").alias("q_lat"), F.col("lon").alias("q_lon")
    )
    # Constant-key broadcast HASH join, not crossJoin: a BroadcastHashJoin
    # build side that turns out empty at runtime (every query settled) is
    # an EmptyHashedRelation, which AQE propagates into an empty relation
    # — the point scan below never runs. A BroadcastNestedLoopJoin
    # (crossJoin) uses IdentityBroadcastMode, which AQE cannot collapse
    # (measured: the full scan executes even with zero unsettled rows).
    # The key must be column-DEPENDENT (always 0, but derived from a
    # column): a literal key gets constant-folded out of the
    # equi-condition and the join degrades back to a nested loop (also
    # measured). xxhash64 makes the key TYPE-AGNOSTIC and NULL-safe —
    # the earlier `_nid % 1` form threw under ANSI mode for string id
    # columns and dropped NULL-id rows from the rescue scan.
    slow_cand = with_dist(
        pts.withColumn("_k", F.pmod(F.xxhash64("_nid"), F.lit(1)).cast("int"))
        .join(
            F.broadcast(
                unsettled.withColumn("_k", F.pmod(F.xxhash64("query_id"), F.lit(1)).cast("int"))
            ),
            "_k",
        )
        .select("_nid", "lat", "lon", "query_id", "q_lat", "q_lon")
    )
    slow = (
        slow_cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "_nid", "dist_m")
    )
    return fast.unionByName(slow).withColumnRenamed("_nid", id_col)


def radius_join(
    points: DataFrame,
    queries: DataFrame,  # (query_id, lat, lon) fixed-point
    radius_m: float = 1000.0,
    res: int | None = None,
    metric: str = "haversine",
    id_col: str = "node_idx",
    broadcast_cover: bool = True,
    backend=None,
    cell_col: str | None = None,
) -> DataFrame:
    """Geodesic radius join (distance join) — ALL (query, point) pairs
    with distance ≤ ``radius_m``; the third classic spatial join next to
    point-in-polygon (``spatial_join.pip_join``) and kNN
    (``knn_join_bulk``), same candidate machinery as the latter
    (``_radius_candidates``: vectorized disk/bbox covers → cell
    equi-join → exact distance).

    Unconditionally EXACT with no fallback branch: the cover is a
    superset of the metric disk (haversine: the geodesic-disk bbox;
    sqeuclid: the ±r bbox), so every within-radius point is a candidate
    by construction — unlike kNN there is no settledness question, the
    radius IS the contract. Each point owns exactly one cell and a
    query's cover cells are distinct, so a pair appears at most once; no
    dedup step. → DataFrame(query_id, <id_col>, dist_m); ``metric`` /
    ``broadcast_cover`` / ``backend`` / ``cell_col`` exactly as on
    ``knn_join_bulk`` (sqeuclid: pure-JVM int64 d² in fixed-point units,
    ``radius_m`` in those units; the bucketed-layout ``cell_col`` path
    joins the point table with zero Exchanges).

    Scale shape: output size is data-dependent (Θ(pairs within r)) — at
    10^12 points pick r so the per-query neighborhood is bounded, same
    contract as any distance join. No reference analog (the reference's
    only lookup structure is the id dictionary, osmflatc/src/ids.rs:
    96-158); north-rule spatial surface."""
    from osmflat_rs_spark.functions.cell_backend import MortonBackend

    be = backend or MortonBackend()
    cand, _pts, _wd = _radius_candidates(
        points, queries, radius_m, res, metric, id_col, broadcast_cover, be, cell_col
    )
    if metric == "sqeuclid" and float(radius_m).is_integer():
        # exact int64 boundary compare — a double bound is only exact to
        # 2^53, and d² values run to 2·(2^31-1)² (the with_dist clamp)
        bound = F.lit(min(int(radius_m) ** 2, (1 << 63) - 1)).cast("long")
    else:
        bound = F.lit(float(radius_m) ** 2 if metric == "sqeuclid" else float(radius_m))
    return (
        cand.filter(F.col("dist_m") <= bound)
        .select("query_id", "_nid", "dist_m")
        .withColumnRenamed("_nid", id_col)
    )


def knn_join(
    points: DataFrame,
    queries: pd.DataFrame,  # columns: query_id, lat, lon (fixed-point ints)
    k: int = 5,
    res: int = 14,
    init_radius_m: float = 500.0,
    max_rounds: int = 20,
) -> DataFrame:
    """→ DataFrame(query_id, rank, node_idx, dist_m), rank 1..k by
    (dist, node_idx) — exact kNN, tie-broken deterministically.

    Driver-loop form: right for DOZENS of queries (interactive lookups,
    ring expansion with per-round driver collects). Guarded: large query
    sets must use ``knn_join_bulk`` (fully distributed, no driver loop)."""
    if len(queries) > 10_000:
        raise ValueError(
            f"knn_join is the driver-loop form (per-round toPandas); "
            f"{len(queries)} queries would collect candidate sets to the driver "
            f"every round — use knn_join_bulk for large query sets"
        )
    spark = points.sparkSession
    pts = (
        points.select(F.col("node_idx"), F.col("lat").cast("long"), F.col("lon").cast("long"))
        .filter(F.col("lat").isNotNull() & F.col("lon").isNotNull())
        .withColumn("cell", cells.cell_id_expr("lat", "lon", res))
    )
    pts = pts.persist()

    # once the search radius covers the whole globe, the candidate set IS
    # the corpus: accept whatever exists (possibly < k rows — a corpus
    # with fewer than k points has a well-defined answer, and no larger
    # radius can add candidates). Without this, sparse/remote workloads
    # ran all rounds then raised, with a cover that quadruples per
    # doubling (driver-side blowup), and defaults capped the reach at
    # 500*2^11 ≈ 1,024 km — far short of the ~20,015 km antipodal max.
    GLOBE_M = 20_100_000.0

    pending = queries.copy()
    radius = {qid: init_radius_m for qid in pending["query_id"]}
    settled_parts: list[pd.DataFrame] = []

    try:
        for _ in range(max_rounds):
            if pending.empty:
                break
            # per-round EFFECTIVE resolution sized to the largest pending
            # radius: disk_cover at fixed res grows quadratically with the
            # radius (a globe-radius bbox at res 14 is 2^28 cells — driver
            # OOM). Coarsening keeps every cover ≈ ≤4k cells; points join on
            # their Morton ANCESTOR cell (pure shiftright), so the cover is
            # still an exact superset and settledness stays sound.
            max_r = max(radius[qid] for qid in pending["query_id"])
            span = 2 * int(max_r / 111_320.0 * COORD_SCALE) + 1
            eff_res = min(res, cells.pick_cover_res(span, span, target_cells=4096))
            cover_rows = []
            for q in pending.itertuples():
                for c in cells.disk_cover(int(q.lat), int(q.lon), radius[q.query_id], eff_res):
                    cover_rows.append((q.query_id, int(q.lat), int(q.lon), int(c)))
            cover = spark.createDataFrame(
                pd.DataFrame(cover_rows, columns=["query_id", "q_lat", "q_lon", "jcell"]),
                schema="query_id string, q_lat long, q_lon long, jcell long",
            )
            jcell = F.shiftright(F.col("cell"), 2 * (res - eff_res)) if eff_res < res else F.col("cell")
            cand = (
                pts.withColumn("jcell", jcell)
                .join(F.broadcast(cover), "jcell")
                .withColumn("dist_m", haversine_np_udf("q_lat", "q_lon", "lat", "lon"))
            )
            w = Window.partitionBy("query_id").orderBy(F.col("dist_m").asc(), F.col("node_idx").asc())
            topk = (
                cand.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", "rank", "node_idx", "dist_m")
            )
            pdf = topk.toPandas()
            # settled: k results with kth dist within the guaranteed radius,
            # OR the radius already covered the entire globe
            kth = pdf.groupby("query_id").agg(n=("rank", "size"), kd=("dist_m", "max"))
            done = set(
                qid for qid, row in kth.iterrows() if row["n"] >= k and row["kd"] <= radius[qid]
            )
            done |= {qid for qid in pending["query_id"] if radius[qid] >= GLOBE_M}
            if not pdf.empty and done:
                settled_parts.append(pdf[pdf["query_id"].isin(done)])
            pending = pending[~pending["query_id"].isin(done)]
            for qid in pending["query_id"]:
                radius[qid] = min(radius[qid] * 2.0, GLOBE_M)
        else:
            if not pending.empty:
                raise RuntimeError(f"knn did not settle for queries: {list(pending['query_id'])}")
    finally:
        pts.unpersist()
    out = (
        pd.concat(settled_parts, ignore_index=True)
        if settled_parts
        else pd.DataFrame(columns=["query_id", "rank", "node_idx", "dist_m"])
    )
    return spark.createDataFrame(out, schema="query_id string, rank int, node_idx long, dist_m double")


def isolated_points(
    points: DataFrame,
    radius_m: float,
    res: int | None = None,
    metric: str = "sqeuclid",
    id_col: str = "node_idx",
    backend=None,
    dense_prune: bool = True,
) -> DataFrame:
    """Distance ANTI-join: points with NO other point within
    ``radius_m`` → the input's (id, lat, lon) rows that are isolated.
    The spatial complement of ``radius_join`` — outlier detection,
    sensor-coverage gaps, "safe to thin" filters.

    Two-phase, mirroring the interior/boundary split of the PIP kernel:

    1. DENSE PRUNE (sqeuclid only, ``dense_prune``): at the finest res
       whose cell DIAGONAL is ≤ r, any two co-cell points are within r
       by construction — ONE cell-keyed exchange (count-over-cell
       window; no pair generation, no distance math) eliminates every
       point of every ≥2-occupancy cell. In clustered data (the
       100-TB common case — that's what "hot cells" means) this kills
       the overwhelming majority before phase 2.
    2. The survivors (co-cell singletons) run the exact
       ``radius_join`` as queries against the FULL point set; any
       non-self pair within r disqualifies; a left_anti keeps the rest.
       Output size of the pair stage is bounded by survivors ×
       neighbors-within-r — survivors are by construction in sparse
       neighborhoods, so the blowup the naive self-join hits on dense
       clusters cannot happen here.

    Exactness: phase 1 only ever removes TRUE non-isolated points
    (diagonal bound), phase 2 is the unconditionally-exact radius join
    — no approximation anywhere. No reference analog (the reference has
    no distance predicates at all); north-rule spatial surface.
    """
    from osmflat_rs_spark.functions.cells import _LAT_SPAN, _LON_SPAN, MAX_RES

    pts = points.select(
        F.col(id_col), F.col("lat").cast("long"), F.col("lon").cast("long")
    ).filter(F.col("lat").isNotNull() & F.col("lon").isNotNull())
    survivors = pts
    if dense_prune and metric == "sqeuclid":
        r2 = float(radius_m) ** 2
        inner = next(
            (
                s
                for s in range(MAX_RES + 1)
                if (_LON_SPAN / 2**s) ** 2 + (_LAT_SPAN / 2**s) ** 2 <= r2
            ),
            None,
        )
        if inner is not None:
            cell = cells.cell_id_expr("lat", "lon", inner)
            counted = pts.withColumn("_c", cell).withColumn(
                "_n", F.count("*").over(Window.partitionBy("_c"))
            )
            survivors = counted.filter(F.col("_n") == 1).select(id_col, "lat", "lon")
    # the cover kernel's Arrow schema types query_id as string — ship the
    # id through as its string form and anti-join on that
    q = survivors.select(
        F.col(id_col).cast("string").alias("query_id"), F.col("lat"), F.col("lon")
    )
    pairs = radius_join(
        pts, q, radius_m=radius_m, res=res, metric=metric, id_col=id_col,
        backend=backend,
    )
    hit = (
        pairs.filter(F.col("query_id") != F.col(id_col).cast("string"))
        .select(F.col("query_id").alias("_qid"))
        .distinct()
    )
    return (
        survivors.withColumn("_qid", F.col(id_col).cast("string"))
        .join(hit, "_qid", "left_anti")
        .drop("_qid")
    )


def service_areas(
    points: DataFrame,
    sites: DataFrame,
    point_id: str = "event_id",
    site_id: str = "site_id",
    lat: str = "lat",
    lon: str = "lon",
    max_sites_inrow: int = 10_000,
    assign_only: bool = False,
) -> DataFrame:
    """Voronoi service areas: assign every point to its NEAREST site
    (exact int² planar distance, ties by smallest site id) and roll up
    → (site, n_points, rms_d) — the facility / reverse-kNN rollup
    ("how many events does each depot capture, and how tightly").
    ``rms_d`` = √(Σd²/n) in coordinate units — RMS rather than mean-d²
    deliberately: it keeps the float's MAGNITUDE in the coordinate
    range, inside the band where round-6 is engine-portable (DuckDB's
    round computes x·10⁶, which itself rounds once x exceeds 2^53/10⁶ ≈
    9e9 — raw mean-d² at ~1e10 hash-diverged exactly there).
    ``assign_only=True`` returns the per-point assignment
    (point, site, d2) instead.

    Scale shape — the SMALL-SITES regime (the common one: depots,
    cities, cells of interest), complementary to ``knn_join_bulk``:
    sites are collected to the driver (bounded by ``max_sites_inrow``,
    loud failure beyond — the same driver-table contract as the SRP
    hyperplanes / IVF centroids) and folded per point IN-ROW with an
    ordered ``F.aggregate`` over the site array literal — ZERO shuffle
    for the assignment, one map-side-combined aggregate for the rollup.
    For large site tables use ``knn_join_bulk(k=1)`` (cell-cover
    equi-join) instead; this operator refuses rather than degrade.

    Exactness: d² accumulates as DECIMAL(38,0) (coordinate deltas up to
    3.6e9 square past 2^63 — the knn.py clamp lesson; decimal keeps the
    argmin exact and ANSI-overflow-proof), the site fold is an ordered
    left fold (deterministic ties without relying on input order), and
    the rollup sums d² exactly; floats appear only in the final
    √(Σd²/n) projection (round-6 contract).
    """
    srows = sites.select(
        F.col(site_id).cast("long").alias("sid"),
        F.col(lat).cast("long").alias("slat"),
        F.col(lon).cast("long").alias("slon"),
    ).collect()
    if not srows:
        raise ValueError("sites is empty")
    if len(srows) > max_sites_inrow:
        raise ValueError(
            f"{len(srows)} sites exceeds max_sites_inrow={max_sites_inrow}; "
            "use knn_join_bulk(k=1) for large site tables"
        )
    srows = sorted(srows, key=lambda r: r["sid"])
    arr = F.array(
        *[
            F.struct(
                F.lit(r["sid"]).cast("long").alias("sid"),
                F.lit(r["slat"]).cast("long").alias("slat"),
                F.lit(r["slon"]).cast("long").alias("slon"),
            )
            for r in srows
        ]
    )
    dec = "decimal(38,0)"

    init = F.struct(
        F.lit(None).cast(dec).alias("d2"), F.lit(None).cast("long").alias("sid")
    )

    def merge(acc, s):
        dla = (F.col("_plat") - s["slat"]).cast(dec)
        dlo = (F.col("_plon") - s["slon"]).cast(dec)
        # (d2, sid) struct comparison IS the (dist asc, id asc) argmin
        cand = F.struct((dla * dla + dlo * dlo).alias("d2"), s["sid"].alias("sid"))
        return F.when(acc["sid"].isNull() | (cand < acc), cand).otherwise(acc)

    best = F.aggregate(arr, init, merge)
    assigned = points.select(
        F.col(point_id).alias("point"),
        F.col(lat).cast("long").alias("_plat"),
        F.col(lon).cast("long").alias("_plon"),
    ).withColumn("_best", best)
    assigned = assigned.select(
        "point",
        F.col("_best.sid").alias(site_id),
        F.col("_best.d2").alias("d2"),
    )
    if assign_only:
        return assigned
    return (
        assigned.groupBy(site_id)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.sum("d2").alias("_sd2"),
        )
        .select(
            site_id,
            "n_points",
            F.round(
                F.sqrt(F.col("_sd2").cast("double") / F.col("n_points").cast("double")),
                6,
            ).alias("rms_d"),
        )
    )


def kmeans_assign_step(
    points: DataFrame,
    centroids: list,
    id_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """ONE exact Lloyd assignment + partial-sum step over fixed integer
    centroids → (cluster, n, sum_lat, sum_lon): the inner loop of every
    distributed k-means (the IVF coarse quantizer's float form is
    ``ann.train_ivf_centroids_distributed``), restated on the engine's
    fixed-point coordinates so EVERY value is an exact int64 —
    assignment is argmin of squared euclidean with ties to the LOWEST
    cluster index (stated, deterministic), sums are map-side-combined
    int64 (no float reassociation anywhere, so the step is bit-stable
    and SQL-gateable where the iterated float trainer is not).

    ``centroids`` is a driver-side list of (lat, lon) ints (k is small
    by definition — it IS the broadcast side); the argmin is
    array_min + array_position over a k-element distance array —
    expression size LINEAR in k (a chained-CASE running best doubles
    per step, ~2^k nodes), and array_position's first-match semantics
    IS the lowest-index tie rule. One projection, one groupBy. Callers
    iterate by feeding means back in; this single step is the
    gate-able unit.
    """
    if not centroids:
        raise ValueError("centroids must be non-empty")
    la, lo = F.col(lat_col).cast("long"), F.col(lon_col).cast("long")

    def d2(c):
        clat, clon = int(c[0]), int(c[1])
        return (la - F.lit(clat)) * (la - F.lit(clat)) + (lo - F.lit(clon)) * (lo - F.lit(clon))

    arr = F.array(*[d2(c) for c in centroids])
    best_i = F.array_position(arr, F.array_min(arr)) - 1  # 1-based, first match
    return (
        points.filter(la.isNotNull() & lo.isNotNull())
        .select(best_i.cast("long").alias("cluster"), la.alias("_la"), lo.alias("_lo"))
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_la").alias("sum_lat"),
            F.sum("_lo").alias("sum_lon"),
        )
    )


def lof_scores(
    points: DataFrame,
    k: int = 10,
    res: int | None = None,
    radius: float = 1000.0,
    id_col: str = "node_idx",
    fp_scale: int = 10**15,
    exact_fallback: bool = True,
    backend=None,
) -> DataFrame:
    """Local Outlier Factor (Breunig et al. 2000) over the corpus →
    (id, n_nn, kdist, lof) — the density-RATIO outlier score: a point
    is anomalous not because its neighbors are far (that's every
    point in a sparse region) but because its local density is low
    RELATIVE to its neighbors' — lof ≈ 1 inside any uniform region at
    any density, ≫ 1 for true outliers. The corpus-scale anomaly
    detector that composes entirely on the engine's distributed kNN.

    Dissimilarity is the EXACT int64 squared-euclidean d² in
    fixed-point coordinate units (a monotone transform of distance —
    density ratios differ from textbook-euclid LOF but rank the same
    neighbors, and integers keep every later sum exact; the declared
    semantics). Pipeline: one ``knn_join_bulk`` self-query (k+1, self
    row dropped, (d², id) tie-break re-rank), then pure joins over the
    bounded k·n pair table: k-distance = the kth d²; reach(p,o) =
    max(d²(p,o), kdist(o)); lrd snaps to the ``fp_scale`` lattice as
    floor(n_nn·scale / Σreach) — exact integer long division, so the
    Σ of neighbor lrds is an order-free int64 sum and lof =
    Σlrd_o / (n_nn · lrd_p) is one float division (ROUND 6).

    Degenerate duplicates (Σreach = 0: a point whose whole
    neighborhood is coincident) yield NULL lof — the textbook
    dist-to-kNN > 0 precondition surfaced instead of hidden. Scale
    shape: the kNN candidate pass is the cell equi-join (no
    crossJoin); everything after is 3 shuffles keyed by point id over
    k·n rows."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # the bulk-kNN cover stage's Arrow schema types query_id as string;
    # ids travel as strings internally and are cast back on output
    id_type = points.schema[id_col].dataType
    q = points.select(F.col(id_col).cast("string").alias("query_id"), "lat", "lon")
    nn = knn_join_bulk(
        points,
        q,
        k=k + 1,
        res=res,
        radius_m=radius,
        metric="sqeuclid",
        id_col=id_col,
        exact_fallback=exact_fallback,
        backend=backend,
    )
    # joins are keyed by the STRING form (the cover stage's query_id
    # type); ordering/tie-breaks use the ORIGINAL typed id so they match
    # the kNN kernel's (d2, id) contract and the SQL oracle
    pairs = nn.filter(F.col(id_col).cast("string") != F.col("query_id")).select(
        F.col("query_id").alias("_p"),
        F.col(id_col).cast("string").alias("_o"),
        F.col(id_col).alias("_oid"),
        F.col("dist_m").alias("_d2"),
    )
    w = Window.partitionBy("_p").orderBy(F.col("_d2").asc(), F.col("_oid").asc())
    # pairs feeds THREE consumers (k-distance, reachability, the lrd
    # numerator) — materialize the k·n-row table once instead of
    # re-running the whole kNN candidate pass + rank per consumer
    from osmflat_rs_spark.plans.checkpoint import fresh_local_checkpoint

    pairs = (
        pairs.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .transform(fresh_local_checkpoint)
    )
    kd = pairs.groupBy("_p").agg(F.max("_d2").alias("kdist"))
    sc = int(fp_scale)
    reach = (
        pairs.join(kd.select(F.col("_p").alias("_o"), F.col("kdist").alias("_okd")), "_o")
        .select("_p", "_o", F.greatest(F.col("_d2"), F.col("_okd")).alias("_r"))
    )
    lrd = (
        reach.groupBy("_p")
        .agg(F.count(F.lit(1)).alias("_n"), F.sum("_r").alias("_sr"))
        .select(
            "_p", "_n",
            F.when(
                F.col("_sr") > 0,
                F.expr(f"(_n * {sc}L) div _sr"),
            ).alias("_lrd"),
        )
    )
    num = (
        pairs.join(lrd.select(F.col("_p").alias("_o"), F.col("_lrd").alias("_olrd")), "_o")
        .groupBy("_p")
        .agg(F.sum("_olrd").alias("_slrd"), F.count("_olrd").alias("_nvalid"))
    )
    out = (
        num.join(lrd, "_p")
        .join(kd, "_p")
        .select(
            F.col("_p").cast(id_type).alias(id_col),
            F.col("_n").cast("long").alias("n_nn"),
            F.col("kdist").cast("long").alias("kdist"),
            F.round(
                F.when(
                    (F.col("_lrd") > 0) & (F.col("_nvalid") == F.col("_n")),
                    F.col("_slrd").cast("double")
                    / (F.col("_n").cast("double") * F.col("_lrd").cast("double")),
                ),
                6,
            ).alias("lof"),
        )
    )
    return out
