"""Inverse-distance-weighted (IDW) spatial interpolation — estimate a
field value at arbitrary query locations from the k nearest observed
points (Shepard 1968, the standard deterministic interpolator in every
GIS stack). The reference engine exposes the raw ingredients (node
coordinates + tag values, e.g. osmflat-rs examples read node coords and
attributes per entity) but has no interpolation surface; this is the
analytics-engine extension of its kNN family.

Scale shape: the neighbor search IS ``knn_join_bulk`` — per-query
disk-cover cells equi-joined against the point table, no crossJoin, no
driver loop — so interpolation inherits the fully-distributed kNN plan.
The only additions are one id-equi-join back to the point table to fetch
the interpolated column (queries × k rows against the big table — the
same dictionary-join shape as ingest's J1) and one per-query aggregate.
Everything after the kNN is pure JVM Catalyst expressions.

Semantics (matches the SQL oracle bit-for-bit up to float rounding):
- weight_i = 1 / d_i^power, with d from the kNN metric (for
  ``metric="sqeuclid"`` d² is exact int64, so power=2 means
  weight = 1/d² with no sqrt anywhere);
- exact hits: if any of the k neighbors has d = 0, the estimate is the
  MEAN of the zero-distance values (the standard IDW convention —
  the limit of the weighted form as d→0) and the rest are ignored.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def idw_interpolate(
    points: DataFrame,
    queries: DataFrame,
    value_col: str = "value",
    k: int = 5,
    power: int = 2,
    id_col: str = "event_id",
    **knn_kwargs,
) -> DataFrame:
    """(query_id, idw, n_neighbors) per query row.

    ``points`` needs (id_col, lat, lon, value_col); ``queries`` needs
    (query_id, lat, lon) in the same fixed-point units. ``knn_kwargs``
    pass through to :func:`knn_join_bulk` (res, radius_m, metric,
    exact_fallback, backend, ...). ``power`` is the IDW exponent over
    the metric distance d; with the exact ``sqeuclid`` metric the
    returned ``dist_m`` is d², so the weight exponent is power/2 —
    power=2 (the default, and Shepard's) stays sqrt-free.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if power <= 0:
        raise ValueError(f"power must be > 0, got {power}")
    from osmflat_rs_spark.operators.knn import knn_join_bulk

    nn = knn_join_bulk(points, queries, k=k, id_col=id_col, **knn_kwargs)
    metric = knn_kwargs.get("metric", "haversine")
    exp = power / 2.0 if metric == "sqeuclid" else float(power)
    vals = points.select(F.col(id_col), F.col(value_col).alias("_v"))
    j = nn.join(vals, id_col)
    d = F.col("dist_m").cast("double")
    w = F.when(d > 0, F.lit(1.0) / F.pow(d, F.lit(exp)))
    return (
        j.groupBy("query_id")
        .agg(
            F.count(F.when(d == 0, 1)).alias("_n0"),
            F.avg(F.when(d == 0, F.col("_v"))).alias("_v0"),
            F.sum(w * F.col("_v")).alias("_num"),
            F.sum(w).alias("_den"),
            F.count(F.lit(1)).alias("n_neighbors"),
        )
        .select(
            "query_id",
            F.when(F.col("_n0") > 0, F.col("_v0"))
            .otherwise(F.col("_num") / F.col("_den"))
            .alias("idw"),
            "n_neighbors",
        )
    )


def huff_probabilities(
    points: DataFrame,
    facilities,
    radius: float,
    id_col: str = "node_idx",
    lat: str = "lat",
    lon: str = "lon",
    res: int | None = None,
    backend=None,
) -> DataFrame:
    """Huff spatial-interaction model (Huff 1963) — probabilistic market
    share: each demand point patronizes facility j with probability
    p_ij = w_ij / Σ_k w_ik over the facilities within ``radius``, where
    the weight is the REGULARIZED inverse-square gravity term

        w_ij = A_j / (d²_ij + 1)

    (exact int64 d² in fixed-point units; the +1 keeps a point sitting
    exactly ON a facility finite while preserving the β=2 decay — the
    regularization IS the declared contract, making every weight ONE
    rational of exact integers instead of a pow() chain). → (id,
    facility_id, attractiveness, d2, p); points with no facility in
    range emit nothing (outside every market area).

    ``facilities``: list of (facility_id, lat, lon, attractiveness)
    tuples — the small dimension side (drives the broadcast cell cover
    of ``knn.radius_join``; the demand table never moves). One keyed
    groupBy(point) for the normalizer + one equi-join back — the only
    shuffles, both on the point id.
    """
    from osmflat_rs_spark.operators.knn import radius_join

    rows = list(facilities)
    if not rows:
        raise ValueError("need at least one facility")
    spark = points.sparkSession
    fac = spark.createDataFrame(
        rows, schema="query_id string, lat long, lon long, attractiveness long"
    )
    pairs = radius_join(
        points,
        fac.select("query_id", "lat", "lon"),
        radius_m=float(radius),
        res=res,
        metric="sqeuclid",
        id_col=id_col,
        backend=backend,
    )
    att = F.broadcast(fac.select(F.col("query_id"), F.col("attractiveness")))
    w = pairs.join(att, "query_id").select(
        F.col(id_col),
        F.col("query_id").alias("facility_id"),
        "attractiveness",
        F.col("dist_m").cast("long").alias("d2"),
        (
            F.col("attractiveness").cast("double")
            / (F.col("dist_m").cast("double") + F.lit(1.0))
        ).alias("_w"),
    )
    tot = w.groupBy(id_col).agg(F.sum("_w").alias("_tw"))
    return (
        w.join(tot, id_col)
        .select(
            id_col, "facility_id", "attractiveness", "d2",
            (F.col("_w") / F.col("_tw")).alias("p"),
        )
    )


def ipf_balance(
    od: "DataFrame",
    o_col: str,
    d_col: str,
    seed_col: str,
    o_marg: "DataFrame",
    d_marg: "DataFrame",
    iters: int = 3,
):
    """Iterative proportional fitting (Furness balancing) of a
    doubly-constrained spatial-interaction matrix (Deming & Stephan
    1940; the gravity-model workhorse of every trip-distribution
    stack): given a seed T⁰_od > 0 (typically a distance-decay kernel)
    and target margins O_o, D_d (ΣO = ΣD), alternately rescale rows to
    meet O and columns to meet D for ``iters`` rounds → (o, d, t).

    Scale shape: zones are inherently bounded (the aggregated corpus,
    ~10³-10⁵), so margins and per-round row/column sums are zone-sized
    tables that BROADCAST; the zone-pair matrix is the only large
    relation and it is never re-keyed beyond the two groupBy
    aggregates each round (2·iters exchanges on (o) / (d) — the
    honest relational IPF; nothing driver-side, no crossJoin here:
    building the seed pairs is the caller's choice). Float contract:
    each scaling divides by a same-magnitude positive row/column sum,
    so reassociation error stays ~1e-13 relative; callers round the
    final t (the gate uses ROUND 6).

    Requires seed > 0 on every retained pair (a zero row/column sum
    would divide by zero — raise early instead of emitting NULLs), and
    margin frames with exactly (key, total) columns named
    ``{o,d}_col`` + 'tot'.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    t = od.select(
        F.col(o_col), F.col(d_col), F.col(seed_col).cast("double").alias("_t")
    )
    for _ in range(iters):
        rs = t.groupBy(o_col).agg(F.sum("_t").alias("_rs"))
        t = (
            t.join(F.broadcast(o_marg), o_col)
            .join(F.broadcast(rs), o_col)
            .select(
                o_col, d_col,
                (F.col("_t") * F.col("tot") / F.col("_rs")).alias("_t"),
            )
        )
        cs = t.groupBy(d_col).agg(F.sum("_t").alias("_cs"))
        t = (
            t.join(F.broadcast(d_marg), d_col)
            .join(F.broadcast(cs), d_col)
            .select(
                o_col, d_col,
                (F.col("_t") * F.col("tot") / F.col("_cs")).alias("_t"),
            )
        )
    return t.select(o_col, d_col, F.col("_t").alias("t"))


def hansen_accessibility(
    points: "DataFrame",
    queries: "DataFrame",
    radius_m: float,
    weight_col: str,
    scale_l2: int,
    res: int | None = None,
    id_col: str = "node_idx",
    query_id: str = "query_id",
):
    """Hansen (1959) gravity accessibility: per query location q,
    A_q = Σ over in-range opportunities j of w_j · f(d_qj) with the
    regularized rational kernel f(d) = L²/(L² + d²) — "how much
    opportunity is reachable from here", the classic potential /
    accessibility index of transport geography (the open-ended kernel
    truncated at ``radius_m``, the standard practical form).

    Composition over the engine's radius machinery: candidates and
    exact int64 d² come from ``knn.radius_join`` (metric='sqeuclid' —
    vectorized covers → cell equi-join, NO crossJoin), weights arrive
    by one id-equi-join back to the point table (the IDW join-back
    shape), then one per-query aggregate. Zero-neighbor queries
    survive with A = 0 via a left join from the query table. Exactness:
    w·L² and L²+d² are exact int64 (caller keeps w·scale_l2 < 2^53),
    each kernel term is one exact double division, and only the
    ≤ |neighbors|-term sum is reassociation-sensitive — callers round
    (the gate uses ROUND 9). → (query_id, n_within, access).
    """
    from osmflat_rs_spark.operators.knn import radius_join

    if scale_l2 < 1:
        raise ValueError(f"scale_l2 must be >= 1, got {scale_l2}")
    pairs = radius_join(
        points.select(id_col, "lat", "lon"),
        queries,
        radius_m=radius_m,
        res=res,
        metric="sqeuclid",
        id_col=id_col,
    )
    w = points.select(F.col(id_col), F.col(weight_col).alias("_w"))
    l2 = F.lit(int(scale_l2)).cast("long")
    per = (
        pairs.join(w, id_col)
        .groupBy(query_id)
        .agg(
            F.count(F.lit(1)).alias("n_within"),
            F.sum(
                (F.col("_w") * l2).cast("double") / (l2 + F.col("dist_m"))
            ).alias("_a"),
        )
    )
    return queries.select(query_id).join(per, query_id, "left").select(
        query_id,
        F.coalesce(F.col("n_within"), F.lit(0).cast("long")).alias("n_within"),
        F.round(F.coalesce(F.col("_a"), F.lit(0.0)), 9).alias("access"),
    )


def gravity_calibrate(
    flows: "DataFrame",
    o_col: str,
    d_col: str,
    flow_col: str,
    d2_col: str,
):
    """One-row gravity-model calibration: OLS of
    y = ln T_od − ln O_o − ln D_d  on  x = ln(d² + 1) over observed
    flows (T > 0), where O/D are the flows' own margins — the
    log-linearized unconstrained gravity model T ≈ k·O·D·d^(−β), so
    the fitted slope is −β/2 (x carries d², twice the log of
    distance; +1 keeps intra-zonal d = 0 pairs defined). The standard
    companion to :func:`ipf_balance`: calibrate β here, seed IPF with
    d^(−β) there. → (n_pairs, slope, intercept, r2), ln-floats under
    the repo's ROUND(·, 9) contract.

    Scale shape: margins are two zone-sized aggregates BROADCAST back
    onto the flow table (flows are never re-keyed), and the fit is one
    closed-form global aggregate over the six OLS sums — no iteration,
    nothing driver-side. y uses ln-subtraction, not division, so both
    engines see identical operands. Degenerate inputs (< 2 pairs or a
    constant x) yield NULL slope/intercept/r2.
    """
    t = flows.filter(F.col(flow_col) > 0).select(
        F.col(o_col).alias("_o"),
        F.col(d_col).alias("_d"),
        F.col(flow_col).cast("long").alias("_t"),
        F.col(d2_col).cast("long").alias("_d2"),
    )
    om = t.groupBy("_o").agg(F.sum("_t").alias("_ot"))
    dm = t.groupBy("_d").agg(F.sum("_t").alias("_dt"))
    pts = (
        t.join(F.broadcast(om), "_o")
        .join(F.broadcast(dm), "_d")
        .select(
            F.log(F.col("_d2").cast("double") + 1).alias("_x"),
            (
                F.log(F.col("_t").cast("double"))
                - F.log(F.col("_ot").cast("double"))
                - F.log(F.col("_dt").cast("double"))
            ).alias("_y"),
        )
    )
    a = pts.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
    )
    den = F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    num = F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    deny = F.col("_n") * F.col("_syy") - F.col("_sy") * F.col("_sy")
    slope = num / den
    icept = (F.col("_sy") - slope * F.col("_sx")) / F.col("_n")
    ok = den != 0
    return a.select(
        F.col("_n").cast("long").alias("n_pairs"),
        F.when(ok, F.round(slope, 9)).alias("slope"),
        F.when(ok, F.round(icept, 9)).alias("intercept"),
        F.when(ok & (deny != 0), F.round(num * num / (den * deny), 9)).alias("r2"),
    )


def kriging_interpolate(
    points: "DataFrame",
    queries: "DataFrame",
    value_col: str = "value",
    k: int = 8,
    nugget: float = 0.0,
    sill: float = 1.0,
    range_: float = 1.0,
    model: str = "exponential",
    id_col: str = "event_id",
    **knn_kwargs,
):
    """Ordinary kriging → (query_id, kriged, kvar, n_neighbors): the
    BLUE spatial interpolator (Matheron 1963/Cressie 1993) — per query,
    weights solve the (k+1)×(k+1) ordinary-kriging system
    [Γ 1; 1ᵀ 0]·[w; λ] = [γ(q,·); 1] under a fitted variogram model
    γ(d) = nugget + (sill−nugget)·f(d/range) (f exponential 1−e^(−3h)
    or spherical), prediction = Σwᵢzᵢ and kriging VARIANCE =
    Σwᵢγ(q,i) + λ — the uncertainty surface IDW cannot give. Feed
    (nugget, sill, range) from :func:`empirical_variogram`'s fitted
    curve; this operator deliberately takes them as parameters (model
    fitting is a tiny driver-side regression over the variogram
    table).

    Scale shape: neighbors come from ``knn_join_bulk`` (cell-cover
    candidates, no crossJoin); ONE id-equi-join back fetches each
    neighbor's (lat, lon, z); per-query groups collapse in-row
    (array_sort(collect_list) — deterministic by neighbor id) and the
    solves run BATCHED in one Arrow ``applyInPandas`` pass per
    partition: queries stack into an (nq, k+1, k+1) tensor and ONE
    vectorized ``np.linalg.solve`` handles the whole batch — no
    per-query Python loop, no driver participation. Exactly-k groups
    only (under-populated neighborhoods yield NULL prediction with
    n_neighbors < k reported — flag, don't extrapolate).

    Not SQL-restatable (dense linear solve), so gates carry no
    oracle_sql; correctness is pinned by a direct NumPy
    reference-model pytest (the BPE/IVF-trainer precedent).
    """
    import numpy as np
    import pandas as pd

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if model not in ("exponential", "spherical"):
        raise ValueError(f"unknown variogram model: {model!r}")
    if sill < nugget or nugget < 0 or range_ <= 0:
        raise ValueError(f"need 0 <= nugget <= sill and range > 0, got {nugget}, {sill}, {range_}")
    from osmflat_rs_spark.operators.knn import knn_join_bulk

    kw = dict(knn_kwargs)
    kw.setdefault("metric", "sqeuclid")
    nn = knn_join_bulk(points, queries, k=k, id_col=id_col, **kw)
    pts = points.select(
        F.col(id_col),
        F.col("lat").alias("_plat"),
        F.col("lon").alias("_plon"),
        F.col(value_col).cast("double").alias("_z"),
    )
    qxy = queries.select("query_id", F.col("lat").alias("_qlat"), F.col("lon").alias("_qlon"))
    j = nn.join(pts, id_col).join(qxy, "query_id")
    grouped = j.groupBy("query_id").agg(
        F.first("_qlat").alias("qlat"),
        F.first("_qlon").alias("qlon"),
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(id_col).cast("string").alias("nid"),
                    F.col("_plat").alias("la"),
                    F.col("_plon").alias("lo"),
                    F.col("_z").alias("z"),
                )
            )
        ).alias("nb"),
    )
    nug, si, rg = float(nugget), float(sill), float(range_)
    mdl = model

    def solve_fn(pdfs):
        for pdf in pdfs:
            if not len(pdf):
                continue
            full = pdf[pdf["nb"].map(len) == k].reset_index(drop=True)
            part = pdf[pdf["nb"].map(len) != k]
            out_rows = []
            if len(full):
                nq = len(full)
                la = np.array([[e["la"] for e in nb] for nb in full["nb"]], dtype=np.float64)
                lo = np.array([[e["lo"] for e in nb] for nb in full["nb"]], dtype=np.float64)
                z = np.array([[e["z"] for e in nb] for nb in full["nb"]], dtype=np.float64)
                qla = full["qlat"].to_numpy(np.float64)[:, None]
                qlo = full["qlon"].to_numpy(np.float64)[:, None]

                def gamma(d):
                    h = d / rg
                    if mdl == "exponential":
                        f = 1.0 - np.exp(-3.0 * h)
                    else:
                        f = np.where(h >= 1.0, 1.0, 1.5 * h - 0.5 * h**3)
                    g = nug + (si - nug) * f
                    return np.where(d == 0.0, 0.0, g)

                dij = np.sqrt(
                    (la[:, :, None] - la[:, None, :]) ** 2
                    + (lo[:, :, None] - lo[:, None, :]) ** 2
                )
                dq = np.sqrt((la - qla) ** 2 + (lo - qlo) ** 2)
                A = np.zeros((nq, k + 1, k + 1))
                A[:, :k, :k] = gamma(dij)
                A[:, k, :k] = 1.0
                A[:, :k, k] = 1.0
                b = np.ones((nq, k + 1))
                b[:, :k] = gamma(dq)
                try:
                    sol = np.linalg.solve(A, b[:, :, None])[:, :, 0]
                except np.linalg.LinAlgError:
                    # coincident neighbors make singular systems; fall
                    # back to per-query least squares for this batch
                    sol = np.stack(
                        [np.linalg.lstsq(A[i], b[i], rcond=None)[0] for i in range(nq)]
                    )
                w, lam = sol[:, :k], sol[:, k]
                pred = (w * z).sum(axis=1)
                kvar = (w * gamma(dq)).sum(axis=1) + lam
                for i in range(nq):
                    out_rows.append((full["query_id"].iloc[i], float(pred[i]), float(kvar[i]), k))
            for _, r in part.iterrows():
                out_rows.append((r["query_id"], None, None, len(r["nb"])))
            yield pd.DataFrame(out_rows, columns=["query_id", "kriged", "kvar", "n_neighbors"])

    return grouped.mapInPandas(
        solve_fn, "query_id string, kriged double, kvar double, n_neighbors int"
    )


def gwr_local(
    points: DataFrame,
    queries: DataFrame,
    x_col: str,
    y_col: str,
    bandwidth: float,
    id_col: str = "node_idx",
    fp_scale: int = 10**9,
    **radius_kwargs,
):
    """Geographically weighted regression (Fotheringham/Brunsdon/
    Charlton) → one row per regression point: (query_id, n_nbrs,
    slope, icept) — the local bivariate fit y ~ x whose coefficients
    VARY over space, the standard answer to "is this relationship the
    same everywhere or is the global OLS averaging away opposite
    regimes". Bisquare kernel w = (1 − (d/b)²)² inside the bandwidth
    disk, 0 outside — so the neighborhood is exactly the engine's
    ``radius_join`` output (sqeuclid metric: d² and b² are exact
    int64, no cover approximation leaks into the weights).

    Determinism: each pair's kernel weight is computed from the exact
    integers (d², b²) in a pinned double expression and SNAPPED to the
    ``fp_scale`` lattice before any aggregation, so the five weighted
    moment sums (Σw, Σwx, Σwy, Σwx², Σwxy) are order-free exact int64
    (contract: n_nbrs·fp·max(x)² < 2^63 — shrink ``fp_scale`` for
    huge covariates); slope/intercept are the closed-form double
    ratios of those sums (ROUND 6), NULL when the local design is
    degenerate (n < 2 or zero weighted x-variance). Scale shape: the
    radius join IS the plan (cell-cover candidates, no crossJoin);
    after it, one map-side-combined groupBy per regression point.
    """
    sc = int(fp_scale)
    b2 = float(bandwidth) * float(bandwidth)
    from osmflat_rs_spark.operators.knn import radius_join

    pts = points.select(
        F.col(id_col), "lat", "lon",
        F.col(x_col).cast("long").alias("_x"),
        F.col(y_col).cast("long").alias("_y"),
    ).filter(F.col("_x").isNotNull() & F.col("_y").isNotNull())
    pairs = radius_join(
        pts, queries, radius_m=float(bandwidth), metric="sqeuclid",
        id_col=id_col, **radius_kwargs,
    )
    j = pairs.join(pts.select(id_col, "_x", "_y"), id_col)
    u = F.col("dist_m").cast("double") / F.lit(b2)
    wfp = F.floor((1 - u) * (1 - u) * F.lit(float(sc)) + F.lit(0.5)).cast("long")
    g = j.select(
        "query_id", wfp.alias("_w"), "_x", "_y"
    ).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_nbrs"),
        F.sum("_w").alias("sw"),
        F.sum(F.col("_w") * F.col("_x")).alias("swx"),
        F.sum(F.col("_w") * F.col("_y")).alias("swy"),
        F.sum(F.col("_w") * F.col("_x") * F.col("_x")).alias("swxx"),
        F.sum(F.col("_w") * F.col("_x") * F.col("_y")).alias("swxy"),
    )
    swd = F.col("sw").cast("double")
    num = swd * F.col("swxy").cast("double") - F.col("swx").cast("double") * F.col("swy").cast("double")
    den = swd * F.col("swxx").cast("double") - F.col("swx").cast("double") * F.col("swx").cast("double")
    slope = F.when((F.col("n_nbrs") > 1) & (den > 0), num / den)
    icept = F.when(
        slope.isNotNull() & (F.col("sw") > 0),
        (F.col("swy").cast("double") - slope * F.col("swx").cast("double")) / swd,
    )
    return g.select(
        "query_id",
        F.col("n_nbrs").cast("long").alias("n_nbrs"),
        F.round(slope, 6).alias("slope"),
        F.round(icept, 6).alias("icept"),
    )
