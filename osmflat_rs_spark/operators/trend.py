"""Space-time cube + Mann-Kendall / Theil-Sen trend — the "emerging
hot spot" workflow (ArcGIS Space Time Pattern Mining): aggregate events
into a (cell_x, cell_y, time_bin) cube, then score every cell's time
series for monotone trend.

Scale shape (the whole point at 100 TB): the cube is ONE map-side-
combined groupBy that reduces the raw points to occupied (cell, bin)
rows; the trend statistics are then bounded IN-ROW expressions over
each cell's dense T-length series (T = number of global time bins, a
caller knob — the contract is T ≤ ~1000, the in-row pair scan is
O(T²) per cell with zero additional shuffles). Two exchanges total,
both keyed by cell; no self-join over the cube, no per-point window.

Reference anchor: the reference renders static per-pixel densities
(osmflat-rs render-roads.rs accumulation); the cube is that raster
given a time axis, and Mann-Kendall is the standard nonparametric
trend test (Mann 1945, Kendall 1975) + Theil-Sen slope (Sen 1968)
ArcGIS applies per cube cell.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def space_time_cube(
    pts: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    ts: str = "ts",
    res: int = 14,
    bin_us: int = 86_400_000_000,
) -> DataFrame:
    """Aggregate points into the space-time cube → (ix, iy, tbin, n).

    One map-side-combined groupBy; ``tbin`` is the floored epoch-µs
    bin index (floor division — pre-1970 timestamps bin correctly).
    NULL coordinates/timestamps are dropped (no cell to live in)."""
    from osmflat_rs_spark.functions.cells import grid_exprs

    if bin_us <= 0:
        raise ValueError(f"bin_us must be > 0, got {bin_us}")
    ix, iy = grid_exprs(F.col(lat), F.col(lon), res)
    # NTZ-tolerant epoch µs (sessions._us contract: session pinned UTC,
    # so the NTZ->TZ cast is exact)
    t = F.floor(F.unix_micros(F.col(ts).cast("timestamp")) / F.lit(bin_us)).cast("long")
    return (
        pts.filter(F.col(lat).isNotNull() & F.col(lon).isNotNull() & F.col(ts).isNotNull())
        .groupBy(ix.alias("ix"), iy.alias("iy"), t.alias("tbin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _pair_scan(vals: Column, t: Column, fn) -> Column:
    """Flattened upper-triangle (i < j) scan over a T-length array:
    fn(v_i, v_j, i, j) per pair. Guarded for T < 2 (Spark's sequence
    runs DESCENDING when start > stop — never let that happen)."""
    inner = lambda i: F.transform(
        F.sequence(i + 1, t - 1),
        lambda j: fn(F.get(vals, i), F.get(vals, j), i, j),
    )
    return F.when(
        t >= 2, F.flatten(F.transform(F.sequence(F.lit(0), t - 2), inner))
    ).otherwise(F.array().cast("array<double>"))


def mann_kendall(
    cube: DataFrame,
    cell_cols: tuple[str, ...] = ("ix", "iy"),
    tbin: str = "tbin",
    value: str = "n",
    t_range: tuple[int, int] | None = None,
) -> DataFrame:
    """Mann-Kendall trend test + Theil-Sen slope per cube cell →
    (*cell_cols, s, var_s, z, sen).

    Every cell's series is densified IN-ROW to the global bin range
    (missing bins = 0 — absence of events IS the observation; pass
    ``t_range`` to pin the range, else one tiny min/max aggregate is
    broadcast). Then, per cell, pure expressions:

    - S = Σ_{i<j} sign(v_j − v_i) — the MK statistic;
    - Var(S) = [T(T−1)(2T+5) − Σ_g t_g(t_g−1)(2t_g+5)]/18 with the
      tie-group correction (counts tie heavily — mandatory);
    - z = (S∓1)/√Var (continuity-corrected), 0 at S=0, NULL when
      Var = 0 (a fully-tied series has no trend evidence);
    - sen = median over pairs of (v_j − v_i)/(j − i) — the robust
      slope in value-per-bin units (even count → mean of the two
      middle slopes, the MEDIAN convention DuckDB shares).

    The cube must be unique on (*cell_cols, tbin) — `space_time_cube`
    guarantees it; a duplicate key fails loudly in map_from_entries."""
    if t_range is not None:
        t0, t1 = (F.lit(int(t_range[0])), F.lit(int(t_range[1])))
        g = cube
    else:
        rng = cube.agg(F.min(tbin).alias("_t0"), F.max(tbin).alias("_t1"))
        g = cube.join(F.broadcast(rng))
        t0, t1 = F.col("_t0"), F.col("_t1")
    per_cell = g.groupBy(*cell_cols).agg(
        F.map_from_entries(F.collect_list(F.struct(tbin, value))).alias("_m"),
        F.first(t0).alias("_a"),
        F.first(t1).alias("_b"),
    )
    vals = F.transform(
        F.sequence(F.col("_a"), F.col("_b")),
        lambda b: F.coalesce(F.try_element_at(F.col("_m"), b), F.lit(0)).cast("long"),
    )
    per_cell = per_cell.withColumn("_v", vals).withColumn("_t", F.size("_v"))
    t = F.col("_t").cast("long")

    signs = _pair_scan(F.col("_v"), F.col("_t"), lambda a, b, i, j: F.signum(b - a))
    s = F.aggregate(signs, F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long"))

    tie_counts = F.transform(
        F.array_distinct(F.col("_v")),
        lambda v: F.size(F.filter(F.col("_v"), lambda e: e == v)).cast("long"),
    )
    tie_term = F.aggregate(
        tie_counts,
        F.lit(0).cast("long"),
        lambda acc, c: acc + c * (c - 1) * (2 * c + 5),
    )
    var_s = (
        (t * (t - 1) * (2 * t + 5) - tie_term).cast("double") / F.lit(18.0)
    )

    slopes = F.array_sort(
        _pair_scan(
            F.col("_v"),
            F.col("_t"),
            lambda a, b, i, j: (b - a).cast("double") / (j - i).cast("double"),
        )
    )
    m = F.size(slopes)
    mid = ((m - 1) / 2).cast("int")
    sen = F.when(
        m > 0,
        F.when(m % 2 == 1, F.get(slopes, mid)).otherwise(
            (F.get(slopes, (m / 2).cast("int") - 1) + F.get(slopes, (m / 2).cast("int"))) / 2.0
        ),
    )

    out = per_cell.withColumn("_s", s).withColumn("_var", var_s)
    z = F.when(
        F.col("_var") > 0,
        F.when(F.col("_s") > 0, (F.col("_s") - 1).cast("double"))
        .when(F.col("_s") < 0, (F.col("_s") + 1).cast("double"))
        .otherwise(F.lit(0.0))
        / F.sqrt(F.col("_var")),
    )
    return out.select(
        *cell_cols,
        F.col("_s").alias("s"),
        F.col("_var").alias("var_s"),
        z.alias("z"),
        sen.alias("sen"),
    )


def emerging_hotspots(
    pts: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    ts: str = "ts",
    res: int = 14,
    bin_us: int = 86_400_000_000,
) -> DataFrame:
    """The composed workflow: space_time_cube → mann_kendall. A cell
    with z ≥ 1.96 is an intensifying (emerging) hot spot, z ≤ −1.96 a
    diminishing one; `sen` is the rate in events/bin."""
    return mann_kendall(space_time_cube(pts, lat=lat, lon=lon, ts=ts, res=res, bin_us=bin_us))


def grouped_ols(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group ordinary-least-squares line as EXACT RATIONALS → one
    row per group (n, slope_num, slope_den, icept_num, icept_den): the
    parametric complement of Mann-Kendall/Theil-Sen above (those rank;
    OLS fits), emitted WITHOUT any division so every value is an exact
    integer and the gate hash-compares bit-for-bit:

        slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
        intercept = (Σy·Σx² − Σx·Σxy) / (n·Σx² − (Σx)²)

    numerators and the shared denominator are returned UNREDUCED (no
    gcd — both engines agree on the raw moment arithmetic; callers
    divide at read time, or reduce if they need canonical form).
    Groups whose x is constant (den = 0: n < 2 or all-equal x) emit
    NULL numerators/denominator — the vertical-line case, stated.

    Scale shape: ONE map-side-combined aggregate; the five moment sums
    accumulate as DECIMAL(38,0) (exact, order-invariant — the
    mean_center precedent: int64 sums overflow at ~10^12 rows while
    per-row products stay in int64 for |x|,|y| ≤ ~3·10⁹), and the
    closed-form combinations are DECIMAL products of those sums. No
    window, no second exchange, no float anywhere.
    """
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    dec = "decimal(38,0)"
    g = (
        df.filter(x.isNotNull() & y.isNotNull())
        .groupBy(F.col(group_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x.cast(dec)).alias("_sx"),
            F.sum(y.cast(dec)).alias("_sy"),
            F.sum((x * x).cast(dec)).alias("_sxx"),
            F.sum((x * y).cast(dec)).alias("_sxy"),
        )
    )
    nn = F.col("n").cast(dec)
    den = nn * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    s_num = nn * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    i_num = F.col("_sy") * F.col("_sxx") - F.col("_sx") * F.col("_sxy")
    guard = F.nullif(den, F.lit(0).cast(dec))
    return g.select(
        group_col,
        "n",
        F.when(guard.isNotNull(), s_num).alias("slope_num"),
        F.when(guard.isNotNull(), i_num).alias("icept_num"),
        guard.alias("den"),
    )


def seasonal_profile(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    period_hours: int = 24,
) -> DataFrame:
    """(key, hour, n, mean_v, key_mean, seasonal_idx): additive
    seasonal decomposition of a metric by hour-of-period — the
    telemetry-cleaning table behind "is this hour's value anomalous
    FOR this hour": per (key, hour-of-period) mean, the key's overall
    mean, and the seasonal index (their difference). The classical
    STL-lite first pass; subtract seasonal_idx from raw values to get
    the deseasonalized residual stream.

    Exactness: hour = (epoch µs ÷ 3 600 000 000) mod period — pure
    int64 on both engines; means are one exact-int sum divided once
    (IEEE-exact, no rounding contract); seasonal_idx is one exact
    subtraction of those quotients. Scale shape: one (key, hour)
    groupBy reduces the corpus; the per-key rollup re-aggregates the
    REDUCED table (never rescans the corpus) and BROADCASTS back onto
    it. NULL values are excluded from both means symmetrically.
    """
    if period_hours < 1:
        raise ValueError(f"period_hours must be >= 1, got {period_hours}")
    us_per_hour = 3_600_000_000
    hour = F.pmod(
        F.floor(F.unix_micros(F.col(ts_col).cast("timestamp")) / us_per_hour),
        F.lit(period_hours),
    ).cast("int")
    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(key_col).alias("_k"), hour.alias("hour"), F.col(value_col).cast("long").alias("_v")
    )
    ph = base.groupBy("_k", "hour").agg(
        F.count(F.lit(1)).alias("n"), F.sum("_v").alias("_s")
    )
    pk = ph.groupBy("_k").agg(
        F.sum("n").alias("_kn"), F.sum("_s").alias("_ks")
    )
    mean_v = F.col("_s").cast("double") / F.col("n")
    key_mean = F.col("_ks").cast("double") / F.col("_kn")
    return ph.join(F.broadcast(pk), "_k").select(
        F.col("_k").alias(key_col),
        "hour",
        "n",
        mean_v.alias("mean_v"),
        key_mean.alias("key_mean"),
        (mean_v - key_mean).alias("seasonal_idx"),
    )


def changepoint_amoc(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """(key, n, t_star, split_order, mean_l, mean_r, stat): at-most-one
    change-point (AMOC) mean-shift detection per key — the split t
    maximizing the CUSUM-scaled shift |mean_L − mean_R|·√(t(n−t)/n)
    over the ``order_col`` sequence (Hinkley 1970's likelihood-ratio
    statistic for a Gaussian mean change, restated without σ). The
    offline "did this series break, and where" primitive; run residuals
    from :func:`seasonal_profile` through it to find level shifts the
    seasonality doesn't explain.

    Distributed shape: ONE window sort per key (prefix sum +
    row_number over order_col) — the sequential-looking scan is
    prefix-summable, so no driver loop and no per-key collect; the
    argmax collapses in the same aggregate via max(struct(stat, −t)),
    deterministic at float ties (smallest t wins). Keys with n < 2
    yield NULL split columns. Exactness: prefix sums are exact int64;
    each candidate's means are one exact division; the statistic is a
    short deterministic IEEE tree, so both engines pick the SAME
    argmax row — no rounding contract anywhere. Standard window-skew
    caveat: one key owning 10⁹ rows serializes its partition.
    """
    from pyspark.sql import Window

    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(key_col).alias("_k"),
        F.col(order_col).alias("_o"),
        F.col(value_col).cast("long").alias("_v"),
    )
    w = Window.partitionBy("_k").orderBy("_o")
    wall = Window.partitionBy("_k")
    r = (
        base.withColumn("_t", F.row_number().over(w))
        .withColumn("_s", F.sum("_v").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("_n", F.count(F.lit(1)).over(wall))
        .withColumn("_tot", F.sum("_v").over(wall))
    )
    t, n = F.col("_t"), F.col("_n")
    mean_l = F.col("_s").cast("double") / t
    mean_r = (F.col("_tot") - F.col("_s")).cast("double") / (n - t)
    stat = F.abs(mean_l - mean_r) * F.sqrt((t * (n - t)).cast("double") / n)
    cand = r.filter(t < n).select(
        "_k", "_o", t.alias("_ct"), n.alias("n"),
        mean_l.alias("_ml"), mean_r.alias("_mr"), stat.alias("_st"),
    )
    best = F.max(
        F.struct(
            F.col("_st").alias("s"),
            (-F.col("_ct")).alias("nt"),
            F.col("_o").alias("o"),
            F.col("_ml").alias("ml"),
            F.col("_mr").alias("mr"),
        )
    )
    single = (
        base.groupBy("_k").agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") < 2)
        .select(
            F.col("_k").alias(key_col), F.col("n").cast("long").alias("n"),
            F.lit(None).cast("long").alias("t_star"),
            F.lit(None).cast(dict(base.dtypes)["_o"]).alias("split_order"),
            F.lit(None).cast("double").alias("mean_l"),
            F.lit(None).cast("double").alias("mean_r"),
            F.lit(None).cast("double").alias("stat"),
        )
    )
    out = (
        cand.groupBy("_k")
        .agg(F.first("n").alias("n"), best.alias("_b"))
        .select(
            F.col("_k").alias(key_col),
            F.col("n").cast("long").alias("n"),
            (-F.col("_b.nt")).cast("long").alias("t_star"),
            F.col("_b.o").alias("split_order"),
            F.col("_b.ml").alias("mean_l"),
            F.col("_b.mr").alias("mean_r"),
            F.col("_b.s").alias("stat"),
        )
    )
    return out.unionByName(single)


def cusum_kernel(rows, mu: int, slack: int, h: int,
                 p_hi: int = 0, min_hi: int = 0, p_lo: int = 0, min_lo: int = 0):
    """The shared two-sided CUSUM recurrence (Page 1954) over exact
    ints — SINGLE source of truth for the streaming twin (same parity
    discipline as the MinHash scheme). Page's S⁺_t = max(0, S⁺_{t−1} +
    v − μ − slack) is tracked in its drawdown form S⁺ = P − min(0,
    min-prefix P) with P the plain running sum of (v − μ − slack) —
    algebraically identical, and the form the BATCH operator can
    window (a running sum + running min are prefix-computable; the
    clipped recurrence alone is not). alarm = S⁺ > h or S⁻ > h (no
    restart — the statistic keeps accumulating, Page's original).
    rows = [(o, v)] pre-sorted by o; returns (out_rows, p_hi, min_hi,
    p_lo, min_lo) with out_rows = [(o, v, s_hi, s_lo, alarm)]."""
    out = []
    for o, v in rows:
        p_hi += v - mu - slack
        min_hi = min(min_hi, p_hi)
        p_lo += mu - slack - v
        min_lo = min(min_lo, p_lo)
        s_hi = p_hi - min(0, min_hi)
        s_lo = p_lo - min(0, min_lo)
        out.append((o, v, s_hi, s_lo, s_hi > h or s_lo > h))
    return out, p_hi, min_hi, p_lo, min_lo


def cusum_scan(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    mu: int,
    slack: int,
    h: int,
) -> DataFrame:
    """(key, o, v, s_hi, s_lo, alarm): per-key two-sided CUSUM drift
    detector — the SEQUENTIAL change detector (alarms once cumulative
    drift beyond ``slack`` around target ``mu`` exceeds ``h``)
    complementing the offline argmax of :func:`changepoint_amoc`.

    Distributed shape: Page's clipped recurrence looks
    order-sequential, but its drawdown identity S_t = P_t − min(0,
    min_{i≤t} P_i) (P = running raw sum) makes it PURE WINDOW algebra:
    one shuffle keyed by ``key_col``, then a running sum and a running
    min per side over the same sort — whole-stage-codegen JVM
    expressions, no Arrow worker, no driver loop (and the SQL oracle
    is four window functions instead of a recursive CTE). Everything
    exact int64; alarm carries NO restart (the statistic keeps
    accumulating — Page's original; a restart policy is a downstream
    choice). NULL values are dropped; h/slack must be ≥ 0.
    """
    from pyspark.sql import Window

    if h < 0 or slack < 0:
        raise ValueError(f"h and slack must be >= 0, got h={h}, slack={slack}")
    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(key_col).cast("string").alias("key"),
        F.col(order_col).cast("long").alias("o"),
        F.col(value_col).cast("long").alias("v"),
    )
    w = Window.partitionBy("key").orderBy("o").rowsBetween(Window.unboundedPreceding, 0)
    zero = F.lit(0).cast("long")
    r = base.select(
        "key", "o", "v",
        F.sum(F.col("v") - F.lit(mu + slack)).over(w).alias("_ph"),
        F.sum(F.lit(mu - slack) - F.col("v")).over(w).alias("_pl"),
    )
    # second window pass over the SAME partitioning/ordering — no new
    # exchange, Catalyst stacks the Window nodes on one sort
    r = r.select(
        "key", "o", "v",
        (F.col("_ph") - F.least(zero, F.min("_ph").over(w))).alias("s_hi"),
        (F.col("_pl") - F.least(zero, F.min("_pl").over(w))).alias("s_lo"),
    )
    return r.withColumn("alarm", (F.col("s_hi") > h) | (F.col("s_lo") > h))


def isotonic_fit(
    df: DataFrame,
    group_col: str,
    x_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group weighted isotonic (monotone non-decreasing) regression
    → (group, x, n, y_mean, fit): the L2-optimal monotone fit of the
    per-x means, computed by pool-adjacent-violators (PAVA; Barlow et
    al. 1972) — THE calibration primitive (probability calibration,
    monotone response curves, dose-response) sklearn users reach for.

    Scale shape: the corpus collapses FIRST into the (group, x)
    sufficient statistics (exact int64 Σv and n — one map-side-combined
    groupBy; this is the only corpus-sized work), then PAVA runs per
    group over the x-domain table (bounded by |x| distinct values) in
    one Arrow pass. Fitted values are pooled-block means
    (Σ_block v)/(n_block) — exact int sums divided once — so they are
    bit-identical to the closed-form minimax characterization
    fit(i) = max_{j≤i} min_{l≥i} avg(j..l), which is how the SQL
    oracle reproduces the sequential algorithm WITHOUT recursion
    (O(|x|³) per group — fine for the bounded domain, impossible for
    the corpus; the identity is the whole trick). NULLs drop; x must
    be integer-ordered.
    """
    import pandas as pd

    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).cast("string").alias("g"),
        F.col(x_col).cast("long").alias("x"),
        F.col(value_col).cast("long").alias("v"),
    )
    agg = base.groupBy("g", "x").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )

    def pava(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("x", kind="mergesort").reset_index(drop=True)
        # stack of blocks [x_start_idx, S, W]
        blocks = []
        for i in range(len(pdf)):
            s, w = int(pdf["s"].iloc[i]), int(pdf["n"].iloc[i])
            blocks.append([i, s, w])
            while len(blocks) > 1 and blocks[-2][1] * blocks[-1][2] >= blocks[-1][1] * blocks[-2][2]:
                _, s1, w1 = blocks.pop()
                blocks[-1][1] += s1
                blocks[-1][2] += w1
        fit = [0.0] * len(pdf)
        for bi, (start, s, w) in enumerate(blocks):
            end = blocks[bi + 1][0] if bi + 1 < len(blocks) else len(pdf)
            for i in range(start, end):
                fit[i] = s / w
        out = pdf[["g", "x", "n"]].copy()
        out["y_mean"] = pdf["s"] / pdf["n"]
        out["fit"] = fit
        return out

    return agg.groupBy("g").applyInPandas(
        pava, "g string, x long, n long, y_mean double, fit double"
    ).select(
        F.col("g").alias(group_col), "x", "n", "y_mean", "fit"
    )


def acf(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    max_lag: int = 5,
):
    """Sample autocorrelation function per key → one row per (key,
    lag ∈ 1..max_lag): (key, lag, n, n_pairs, r) — the Box–Jenkins
    identification primitive (which ARIMA order, is there residual
    structure, is the metric i.i.d. enough to A/B-test daily). Uses
    the standard SAMPLE-ACF convention: overall mean and full-series
    variance in the denominator, r_k = Σ_{t≤n−k}(x_t−x̄)(x_{t+k}−x̄)
    / Σ(x_t−x̄)², so r is guaranteed in [−1, 1] and matches
    statsmodels' ``acf(adjusted=False)``.

    Scale shape: ONE window sort per key produces all max_lag lagged
    columns (the same sort the delta-decode family rides — W1/W3
    machinery), then one map-side-combined groupBy(key) holds the
    exact int64 cross/head/tail sums for every lag at once; the lag
    axis is unpivoted in-row via ``stack``. No self-join, no per-lag
    pass, shuffle bytes = keys × O(max_lag). Closed-form double
    arithmetic from the exact sums (pinned op order, ROUND 6);
    zero-variance or too-short series yield NULL r. Callers keep
    n·max² < 2^63.
    """
    from pyspark.sql import Window

    if not (1 <= max_lag <= 64):
        raise ValueError(f"max_lag must be in [1, 64], got {max_lag}")
    v = F.col(value_col).cast("long")
    base = df.select(
        F.col(key_col).alias("_k"), F.col(order_col).alias("_o"), v.alias("_x")
    ).filter(F.col("_x").isNotNull())
    w = Window.partitionBy("_k").orderBy("_o")
    cols = [F.lag("_x", k).over(w).alias(f"_l{k}") for k in range(1, max_lag + 1)]
    lagged = base.select("_k", "_x", *cols)
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("sx"),
        F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
    ]
    for k in range(1, max_lag + 1):
        lk = F.col(f"_l{k}")
        aggs += [
            F.sum(F.when(lk.isNotNull(), F.col("_x") * lk)).alias(f"sxy{k}"),
            F.sum(F.when(lk.isNotNull(), F.col("_x"))).alias(f"st{k}"),   # tail: t = k+1..n
            F.sum(lk).alias(f"sh{k}"),                                     # head: t = 1..n-k
            F.count(lk).alias(f"np{k}"),
        ]
    g = lagged.groupBy("_k").agg(*aggs)
    # unpivot the lag axis in-row
    stack_args = []
    for k in range(1, max_lag + 1):
        stack_args += [F.lit(k), F.col(f"sxy{k}"), F.col(f"st{k}"), F.col(f"sh{k}"), F.col(f"np{k}")]
    st = g.select(
        "_k", "n", "sx", "sxx",
        F.expr(
            f"stack({max_lag}, "
            + ", ".join(
                f"{k}L, sxy{k}, st{k}, sh{k}, np{k}" for k in range(1, max_lag + 1)
            )
            + ") as (lag, sxy, st, sh, np)"
        ),
    )
    n = F.col("n").cast("double")
    xbar = F.col("sx").cast("double") / n
    # numerator = sxy - xbar*(sh + st) + n_pairs*xbar^2 ; denominator = sxx - n*xbar^2
    num = (
        F.col("sxy").cast("double")
        - xbar * (F.col("sh").cast("double") + F.col("st").cast("double"))
        + F.col("np").cast("double") * xbar * xbar
    )
    den = F.col("sxx").cast("double") - n * xbar * xbar
    r = F.when((F.col("np") > 0) & (den > 0), num / den)
    return st.select(
        F.col("_k").alias(key_col),
        F.col("lag").cast("long").alias("lag"),
        F.col("n").cast("long").alias("n"),
        F.col("np").cast("long").alias("n_pairs"),
        F.round(r, 6).alias("r"),
    )


def decompose(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    period: int,
    fp_scale: int = 10**6,
):
    """Classical additive seasonal decomposition per key → one row per
    input row: (key, order, x, trend, seasonal, resid) — the
    moving-average decomposition behind every "is the metric actually
    down or is it just Saturday" dashboard (the first stage of STL,
    Cleveland et al. 1990, with the classical MA trend instead of
    loess): trend = the period-spanning centered moving average (for
    even periods the classical 2×m MA — period+1 rows with
    half-weight endpoints, so every phase contributes EXACTLY equal
    weight and the seasonal never leaks into the trend; for odd
    periods the plain period-row mean), seasonal = per-(key, phase)
    mean of the detrended series re-centered to sum ~0 across
    phases, resid = x − trend − seasonal.

    Determinism: the even-period trend is the exact int64 numerator
    2·Σwindow − x_first − x_last over ONE division by 2m (odd: Σ/m);
    detrended values snap to the ``fp_scale`` lattice so the
    per-phase and per-key means are exact-int sums in any partition
    order — one division each after that (ROUND 6). Edge rows whose
    centered window is incomplete get NULL trend/resid and do not
    feed the seasonal means — the classical convention.

    Scale shape: ONE window sort per key (rowsBetween ±h sum, count,
    first, last — all O(1) frame state, codegen), one map-side-
    combined groupBy for the (key, phase) means (output bounded by
    keys × period), broadcast back. The windowed subtree feeds BOTH
    the phase-mean aggregate and the final row output (the standard
    aggregate-join-back shape), so it evaluates twice — fine when the
    source is a parquet scan (the second pass re-reads, it does not
    re-shuffle); persist the input first if it is an expensive
    upstream pipeline. Phase = order mod period, so
    ``order_col`` must be a dense integer index per key (the
    dense-index operator produces one).
    """
    from pyspark.sql import Window

    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    sc = float(int(fp_scale))
    base = df.select(
        F.col(key_col).alias("_k"),
        F.col(order_col).cast("long").alias("_o"),
        F.col(value_col).cast("long").alias("_x"),
    ).filter(F.col("_x").isNotNull())
    even = period % 2 == 0
    h = period // 2 if even else (period - 1) // 2
    w = Window.partitionBy("_k").orderBy("_o").rowsBetween(-h, h)
    full = 2 * h + 1
    if even:
        # 2 x m MA: half-weight endpoints -> exact int numerator / (2m)
        num = (
            2 * F.sum("_x").over(w)
            - F.first("_x").over(w)
            - F.last("_x").over(w)
        )
        trend = F.when(
            F.count(F.lit(1)).over(w) == full,
            num.cast("double") / F.lit(2.0 * period),
        )
    else:
        trend = F.when(
            F.count(F.lit(1)).over(w) == full,
            F.sum("_x").over(w).cast("double") / F.lit(float(period)),
        )
    t = base.select("_k", "_o", "_x", trend.alias("_trend"))
    det_fp = F.floor((F.col("_x").cast("double") - F.col("_trend")) * F.lit(sc) + F.lit(0.5)).cast(
        "long"
    )
    t = t.withColumn("_det_fp", det_fp).withColumn("_ph", F.pmod(F.col("_o"), F.lit(period)))
    ph = t.groupBy("_k", "_ph").agg(
        F.sum("_det_fp").alias("_sd"), F.count("_det_fp").alias("_nd")
    )
    # re-center: subtract the mean of the phase means within each key
    ctr = ph.filter(F.col("_nd") > 0).groupBy("_k").agg(
        F.sum(
            F.floor(F.col("_sd").cast("double") / F.col("_nd").cast("double") + F.lit(0.5)).cast(
                "long"
            )
        ).alias("_sm"),
        F.count(F.lit(1)).alias("_np"),
    )
    phm = (
        ph.join(F.broadcast(ctr), "_k", "left")
        .select(
            "_k", "_ph",
            F.when(
                F.col("_nd") > 0,
                (
                    F.floor(F.col("_sd").cast("double") / F.col("_nd").cast("double") + F.lit(0.5))
                    - F.col("_sm").cast("double") / F.col("_np").cast("double")
                )
                / F.lit(sc),
            ).alias("_seas"),
        )
    )
    # LEFT joins end to end: a key whose whole series is shorter than
    # the MA window has no complete window, hence no ctr row — inner
    # joins would silently DROP its rows instead of emitting the
    # documented NULL trend/seasonal/resid (r5c review finding)
    out = t.join(F.broadcast(phm), ["_k", "_ph"], "left")
    return out.select(
        F.col("_k").alias(key_col),
        F.col("_o").alias(order_col),
        F.col("_x").alias(value_col),
        F.round("_trend", 6).alias("trend"),
        F.round("_seas", 6).alias("seasonal"),
        F.round(F.col("_x").cast("double") - F.col("_trend") - F.col("_seas"), 6).alias("resid"),
    )


def rolling_ols(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    half_window: int = 10,
):
    """Rolling OLS slope per key → one row per input row: (key, order,
    x, n_win, slope, icept) — the local trend estimate under each
    point ("is this metric accelerating RIGHT NOW"), the windowed twin
    of :func:`grouped_ols`: over the centered 2h+1-row window, fit
    value against the ROW OFFSET −h..h (so the slope is per-step and
    the window's offset sums Σt, Σt² are CONSTANTS — only Σy and Σty
    vary, halving the frame state).

    Exactness: Σy and Σty ride the window as exact int64 (Σty via the
    offset identity Σ(oᵢ−ō)yᵢ computed as Σoᵢyᵢ − ō·Σyᵢ with ō = the
    center order, both terms exact ints — ``order_col`` must be a
    DENSE per-key integer index so offsets are row offsets); slope =
    Σty_centered / Σt² is ONE division by the constant integer
    Σt² = h(h+1)(2h+1)/3, intercept = Σy/(2h+1) another (ROUND 6).
    Edge rows with incomplete windows emit NULL slope. ONE window
    sort per key; O(1) frame state; pure codegen."""
    from pyspark.sql import Window

    if half_window < 1:
        raise ValueError(f"half_window must be >= 1, got {half_window}")
    h = int(half_window)
    full = 2 * h + 1
    st2 = h * (h + 1) * (2 * h + 1) // 3  # sum of t^2 for t in -h..h
    base = df.select(
        F.col(key_col).alias("_k"),
        F.col(order_col).cast("long").alias("_o"),
        F.col(value_col).cast("long").alias("_x"),
    ).filter(F.col("_x").isNotNull())
    w = Window.partitionBy("_k").orderBy("_o").rowsBetween(-h, h)
    sy = F.sum("_x").over(w)
    soy = F.sum(F.col("_o") * F.col("_x")).over(w)
    cnt = F.count(F.lit(1)).over(w)
    # centered cross-sum: Σ(o - o_center)·y = Σo·y − o_center·Σy, exact
    sty = soy - F.col("_o") * sy
    out = base.select(
        "_k", "_o", "_x",
        cnt.alias("_n"),
        F.when(cnt == full, sty.cast("double") / F.lit(float(st2))).alias("_slope"),
        F.when(cnt == full, sy.cast("double") / F.lit(float(full))).alias("_icept"),
    )
    return out.select(
        F.col("_k").alias(key_col),
        F.col("_o").alias(order_col),
        F.col("_x").alias(value_col),
        F.col("_n").cast("long").alias("n_win"),
        F.round("_slope", 6).alias("slope"),
        F.round("_icept", 6).alias("icept"),
    )


def forecast_accuracy(
    df: DataFrame,
    key_col: str,
    order_col: str,
    actual_col: str,
    forecast_col: str,
    fp_scale: int = 10**9,
):
    """Forecast accuracy per key → (key, n, mae, rmse, smape, mase) —
    the four standard readouts, each with its documented failure mode
    covered by the next: MAE (scale-dependent), RMSE (outlier-heavy),
    sMAPE (scale-free but breaks at zeros), MASE (Hyndman & Koehler
    2006 — error relative to the naive lag-1 forecast, the one safe
    cross-series comparator: MASE < 1 beats naive).

    Exactness: MAE/RMSE numerators are exact int64 Σ|e| and Σe²
    (callers keep n·max² < 2^63); each sMAPE term 2|e|/(|a|+|f|) is a
    per-row rational snapped to the ``fp_scale`` lattice before the
    order-free sum (rows with |a|+|f| = 0 contribute 0 by the
    standard convention, counted in n); MASE's denominator is the
    key's exact naive-error sum Σ|a_t − a_{t−1}| over one lag window
    — MAE/naiveMAE reduces to an exact-int cross ratio, one double
    division (NULL when the naive error is 0 or n < 2). ROUND 6.
    Scale shape: one window sort per key (the lag), one
    map-side-combined groupBy — the groupBy rides the window's
    hash(key) partitioning, single Exchange."""
    from pyspark.sql import Window

    sc = int(fp_scale)
    base = df.select(
        F.col(key_col).alias("_k"),
        F.col(order_col).alias("_o"),
        F.col(actual_col).cast("long").alias("_a"),
        F.col(forecast_col).cast("long").alias("_f"),
    ).filter(F.col("_a").isNotNull() & F.col("_f").isNotNull())
    w = Window.partitionBy("_k").orderBy("_o")
    lagged = base.withColumn("_pa", F.lag("_a").over(w))
    e = F.abs(F.col("_a") - F.col("_f"))
    denom = F.abs(F.col("_a")) + F.abs(F.col("_f"))
    smape_fp = F.when(
        denom > 0,
        F.floor(
            (2 * e.cast("double") / denom.cast("double")) * F.lit(float(sc)) + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0))
    g = lagged.groupBy("_k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(e).alias("_se"),
        F.sum(e * e).alias("_se2"),
        F.sum(smape_fp).alias("_ssm"),
        F.sum(F.abs(F.col("_a") - F.col("_pa"))).alias("_snaive"),
        F.count("_pa").alias("_nnaive"),
    )
    nd = F.col("n").cast("double")
    mase = F.when(
        (F.col("_nnaive") > 0) & (F.col("_snaive") > 0),
        # MAE/naiveMAE = (se/n) / (snaive/nnaive) = se*nnaive / (n*snaive)
        (F.col("_se") * F.col("_nnaive")).cast("double")
        / (F.col("n") * F.col("_snaive")).cast("double"),
    )
    return g.select(
        F.col("_k").alias(key_col),
        F.col("n").cast("long").alias("n"),
        F.round(F.col("_se").cast("double") / nd, 6).alias("mae"),
        F.round(F.sqrt(F.col("_se2").cast("double") / nd), 6).alias("rmse"),
        F.round(F.col("_ssm").cast("double") / nd / F.lit(float(sc)), 6).alias("smape"),
        F.round(mase, 6).alias("mase"),
    )
