"""Gap-based sessionization (batch + Structured Streaming).

Splits each key's ordered event sequence into sessions wherever the gap
to the previous event reaches ``gap_s`` — the standard event-pipeline
primitive for turning a raw activity log into trajectories/visits. The
ordering machinery is the reference's span-sequence invariant
(osmflatc/src/osmpbf.rs block order → SURVEY §2.5 W1-W3) applied to the
time axis: lag-diff (W3 consecutive-pair zip) feeding a running sum
(W1 delta-decode form) is exactly the delta-decode composition.

Boundary semantics are pinned to Spark's native ``session_window``,
whose merge test is INCLUSIVE (sessions merge while ``start <=
current_end``): a gap of exactly ``gap_s`` still merges; only a gap
STRICTLY GREATER than ``gap_s`` starts a new session. The batch
operator uses the same rule so both forms agree bit-for-bit on the
same input (pinned by tests/test_sessions.py with exact-gap rows).

Scale design:
- ``sessionize`` is ONE shuffle (the window's partitionBy(key)); the
  session index is a running sum over a lag — both O(1)-state window
  functions, no row amplification, whole-stage-codegen'd.
- ``session_stats`` groups by (key, session_idx) directly on the window
  output: HashPartitioning(key) already satisfies the clustered
  distribution of the superset grouping key, so Catalyst plans NO
  second exchange (plan-asserted in tests/test_sessions.py).
- per-key cost is bounded by that key's event count — hot keys are a
  data-skew property (AQE handles the window's shuffle skew), never a
  candidate-pair blow-up.
- ``stream_sessionize`` is the incremental form: watermark + native
  ``session_window`` aggregation, state is one (start, end, counts)
  tuple per OPEN session per key — bounded by active keys, emitted and
  dropped once the watermark passes a session's close.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _us(c: Column) -> Column:
    # parquet timestamps are NTZ; sessions are tz-agnostic (only gaps
    # matter) and the engine session is pinned UTC, so the cast is exact
    return F.unix_micros(c.cast("timestamp"))


def sessionize(
    events: DataFrame,
    key: str | list[str],
    ts_col: str = "ts",
    gap_s: float = 1800.0,
    order_cols: tuple = (),
    session_col: str = "session_idx",
) -> DataFrame:
    """→ ``events`` + ``<session_col>`` (0-based per key, in time order).

    A new session starts when ``ts - prev_ts > gap_s`` (strictly —
    see module docstring for why the boundary is inclusive-merge). ``order_cols`` break ts
    ties deterministically (pass a unique id column when (key, ts) can
    collide)."""
    keys = [key] if isinstance(key, str) else list(key)
    gap_us = int(round(gap_s * 1_000_000))
    w = Window.partitionBy(*keys).orderBy(ts_col, *order_cols)
    prev = F.lag(ts_col).over(w)
    boundary = F.when(prev.isNull(), F.lit(0)).otherwise(
        ((_us(F.col(ts_col)) - _us(prev)) > F.lit(gap_us)).cast("int")
    )
    run = Window.partitionBy(*keys).orderBy(ts_col, *order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn(session_col, F.sum(boundary).over(run).cast("long"))


def session_stats(
    events: DataFrame,
    key: str | list[str],
    ts_col: str = "ts",
    gap_s: float = 1800.0,
    order_cols: tuple = (),
) -> DataFrame:
    """→ one row per (key, session_idx): ``start_us``/``end_us`` (epoch
    µs, integer-exact cross-engine), ``n_events``, ``duration_s``.
    Composes on ``sessionize``'s window output with no second exchange —
    the groupBy keys are a superset of the window's partition key."""
    keys = [key] if isinstance(key, str) else list(key)
    s = sessionize(events, keys, ts_col, gap_s, order_cols)
    return s.groupBy(*keys, "session_idx").agg(
        F.min(_us(F.col(ts_col))).alias("start_us"),
        F.max(_us(F.col(ts_col))).alias("end_us"),
        F.count(F.lit(1)).alias("n_events"),
        ((F.max(_us(F.col(ts_col))) - F.min(_us(F.col(ts_col)))) / F.lit(1_000_000.0)).alias(
            "duration_s"
        ),
    )


def stream_sessionize(
    spark,
    src_dir: str,
    schema: str,
    out_dir: str,
    checkpoint_dir: str,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_s: float = 1800.0,
    watermark: str = "0 seconds",
):
    """Incremental sessionization over a file stream: watermarked native
    ``session_window`` aggregation, append mode (a session row is emitted
    exactly once, when the watermark closes it). Returns the started
    query (``availableNow`` — drains everything currently in ``src_dir``
    then stops; re-run with the same checkpoint for exactly-once
    catch-up, the same replay contract as ``stream_pip_assign``).

    State per key = the open sessions' (window, count) — bounded by
    active keys × open sessions, dropped at emit. The batch operator
    above reproduces the same rows (same inclusive-merge
    boundary), which is how tests pin the semantics."""
    src = spark.readStream.schema(schema).parquet(src_dir)
    # watermarks require TIMESTAMP (reject NTZ, parquet's default); the
    # engine session is pinned UTC so the cast is an identity
    src = src.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    agg = (
        src.withWatermark(ts_col, watermark)
        .groupBy(F.col(key), F.session_window(F.col(ts_col), f"{gap_s} seconds"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key,
            _us(F.col("session_window.start")).alias("start_us"),
            F.col("n_events"),
        )
    )
    return (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def funnel_steps(
    events: DataFrame,
    steps: list,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel completion per user → (user, ts_step1..ts_stepK,
    steps_reached): the conversion-analysis primitive (view → click →
    purchase). ``ts_step_i`` is the EARLIEST event of type ``steps[i]``
    STRICTLY AFTER the user's ``ts_step_{i-1}`` (greedy-earliest is the
    standard funnel semantics and is provably optimal: taking the
    earliest completion of each prefix can never prevent a later step
    from completing); NULL once a step is unreached. Strictness means
    same-timestamp events never satisfy two consecutive steps — the
    deterministic contract, restated by the oracle's chained min-CTEs.

    Scale shape: step i is one filter (type = steps[i] — pushed to the
    scan) + one map-side-combined min-agg keyed by user + one
    broadcast-eligible equi-join against the (user, ts_{i-1}) table,
    whose size is BOUNDED BY CONVERTED USERS (monotonically shrinking —
    the funnel itself prunes the work). K steps = K bounded passes; no
    per-user event collection, no windows over the raw log.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    u, t = F.col(user_col), F.col(ts_col)
    reached = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(u.alias("user"))
        .agg(F.min(t).alias("ts_step1"))
    )
    out = reached
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            events.filter(F.col(type_col) == step)
            .select(u.alias("user"), t.alias("_ts"))
            .join(reached.select("user", F.col(f"ts_step{i - 1}").alias("_prev")), "user")
            .filter(F.col("_ts") > F.col("_prev"))
            .groupBy("user")
            .agg(F.min("_ts").alias(f"ts_step{i}"))
        )
        out = out.join(nxt, "user", "left")
        reached = nxt
    done_cols = [F.when(F.col(f"ts_step{i}").isNotNull(), 1).otherwise(0)
                 for i in range(1, len(steps) + 1)]
    total = done_cols[0]
    for c in done_cols[1:]:
        total = total + c
    return out.select(
        F.col("user").alias(user_col),
        *[f"ts_step{i}" for i in range(1, len(steps) + 1)],
        total.cast("long").alias("steps_reached"),
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_cols: tuple = ("event_id",),
) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams
    → (from_type, to_type, n, p): counts of consecutive (type_i →
    type_j) pairs in (ts, *order_cols) order, and the row-conditional
    probability p = n / Σ_j n (the clickstream "what happens next"
    matrix; rows where the user has a next event — the last event of
    each user emits no pair).

    Determinism: the ordering key is (ts, *order_cols) — callers pass a
    unique tiebreaker (default event_id) so same-timestamp events have
    one canonical order in both engines. Counts are exact ints; p is
    ONE IEEE division per row on exact operands (round-6 contract).

    Scale shape: one entity-keyed lag window (the movement_profile /
    sessionize shuffle — per-user cost bounded by the user's own
    events, AQE handles hot-key skew) + one map-side-combined pair
    count; the row totals come from a #types-sized aggregate OF the
    pair table (never a second corpus pass), broadcast back.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), *[F.col(c).asc() for c in order_cols]
    )
    pairs = (
        events.withColumn("_next", F.lead(type_col).over(w))
        .filter(F.col("_next").isNotNull())
        .groupBy(F.col(type_col).alias("from_type"), F.col("_next").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("_tot"))
    return (
        pairs.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n").cast("double") / F.col("_tot").cast("double"), 6).alias("p"),
        )
    )


def scd2_history(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    order_cols: tuple = (),
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change log: per
    key, each record becomes a VALIDITY INTERVAL [valid_from, valid_to)
    — the half-open convention (valid_to = the next change's timestamp;
    NULL = current) every warehouse uses for as-of reconstruction. The
    engine's ``asof`` join answers "state at time t" against exactly
    this shape.

    Consecutive records with IDENTICAL attributes are COLLAPSED first
    (the no-op-update case: a feed that re-emits unchanged rows must
    not fragment history), via one lag compare over the same
    (key ORDER BY ts, order_cols) window the lead pass uses — both
    windows plus the collapse ride ONE sort shuffle. All timestamps are
    exact int64 microseconds. Ties on the full (ts, *order_cols) key
    are the caller's data error; order_cols exists to break ts ties
    deterministically (the engine-wide determinism contract).

    → (key, valid_from, valid_to, is_current, *attr_cols).
    """
    from pyspark.sql import Window

    order = [F.col("_t")] + [F.col(c) for c in order_cols]
    base = df.select(
        F.col(key_col).alias("_k"),
        _us(F.col(ts_col)).alias("_t"),
        *[F.col(c) for c in order_cols],
        *[F.col(c) for c in attr_cols],
    ).filter(F.col("_t").isNotNull())
    w = Window.partitionBy("_k").orderBy(*order)
    # collapse no-op updates: keep a row only if ANY attribute differs
    # from the previous row (or it is the first)
    # eqNullSafe: NULL-vs-value is a CHANGE and NULL-vs-NULL is not —
    # plain == would yield NULL and the keep-filter would drop the row
    changed = F.lit(False)
    for c in attr_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(F.col(c)).over(w))
    first = F.lag(F.col("_t")).over(w).isNull()
    kept = base.withColumn("_keep", first | changed).filter(F.col("_keep"))
    w2 = Window.partitionBy("_k").orderBy(*order)
    out = kept.withColumn("valid_to", F.lead(F.col("_t")).over(w2))
    return out.select(
        F.col("_k").alias(key_col),
        F.col("_t").alias("valid_from"),
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
        *[F.col(c) for c in attr_cols],
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_us: int = 7 * 24 * 3_600_000_000,
) -> DataFrame:
    """Cohort retention matrix — the product-analytics staple beside
    funnel/transitions: users are cohorted by their FIRST-activity
    period (⌊t_first/period⌋, exact integer floor on microseconds), and
    each later active period counts them once →
    (cohort, period_offset, n_users) with offset 0 = the cohort's own
    size (every user is active in their first period by definition).

    Scale shape: one min-aggregate for first activity (map-side
    combined), one distinct over (user, period) — the only
    corpus-sized exchange — then a broadcast-sized rollup; counts are
    exact, no windows, no Python. Period boundaries are fixed epochs
    (not calendar months) — the deterministic convention the oracle
    reproduces with the same integer division.
    """
    if period_us <= 0:
        raise ValueError(f"period_us must be positive, got {period_us}")
    t = _us(F.col(ts_col))
    # exact any-sign floor division (the engine-wide pmod trick)
    period = ((t - F.pmod(t, F.lit(int(period_us)))) / F.lit(int(period_us))).cast("long")
    base = events.select(
        F.col(user_col).alias("_u"), period.alias("_p")
    ).filter(F.col("_p").isNotNull())
    firsts = base.groupBy("_u").agg(F.min("_p").alias("cohort"))
    active = base.distinct()
    return (
        active.join(firsts, "_u")
        .groupBy("cohort", (F.col("_p") - F.col("cohort")).alias("period_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def attribution(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    touch_types: tuple,
    conversion_type: str,
    window_us: int,
) -> DataFrame:
    """Marketing attribution → (channel, n_last, credit_linear): for
    every conversion, credit the touch events that preceded it within
    ``window_us`` — LAST-TOUCH gives the whole conversion to the most
    recent touch (the asof discipline), LINEAR splits it 1/n across
    every in-window touch (Shapley's uniform special case). The two
    standard models of funnel analytics, computed in one pass each.

    Scale shape: last-touch is ONE union-tag window (the
    ``asof_join`` trade — no per-conversion candidate blow-up);
    linear is one range join bounded by the window (each conversion
    matches only its ≤ window touches — the same bounded-output
    contract as the interval join) followed by an exact 1/n split:
    n is an exact int, so each conversion contributes exactly 1.0 of
    credit and Σcredit_linear = conversions with in-window touches
    (asserted in tests). Credit fractions are single IEEE divisions;
    the final per-channel sums are the only reassociation-sensitive
    fold → ROUND(credit_linear, 6). Channels with last-touch wins but
    zero linear credit (or vice versa) cannot exist by construction;
    touch types with no credit at all still emit a (channel, 0, 0.0)
    row so the report is total over ``touch_types``. The per-conversion
    1/n count is a window over the bounded pair table (NOT a broadcast
    of the conversions-sized count map). Determinism caveat: touches
    sharing one exact timestamp tie arbitrarily for last-touch —
    pre-reduce such ties (e.g. min channel per (user, ts)) when exact
    reproducibility is required, as the gate does.
    """
    from osmflat_rs_spark.operators.asof import asof_join

    if window_us <= 0:
        raise ValueError(f"window_us must be > 0, got {window_us}")
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    touches = events.filter(F.col(type_col).isin(*touch_types)).select(
        F.col(user_col).alias("u"), t.alias("tt"),
        F.col(ts_col).alias("_rts"), F.col(type_col).alias("channel")
    )
    convs = events.filter(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("u"), t.alias("ct"),
        F.col(ts_col).alias("_rts"),
        F.monotonically_increasing_id().alias("_cid"),
    )
    # last touch: asof backward with tolerance (asof_join owns the
    # timestamp->us conversion; hand it the raw timestamp column)
    last = asof_join(
        convs.select("u", F.col("_rts").alias("ts"), "_cid"),
        touches.select("u", F.col("_rts").alias("ts"), "channel"),
        on="u",
        direction="backward",
        tolerance_us=window_us,
    )
    n_last = last.filter(F.col("channel_right").isNotNull()).groupBy(
        F.col("channel_right").alias("channel")
    ).agg(F.count(F.lit(1)).alias("n_last"))
    # linear: bounded range join, exact 1/n split per conversion
    pairs = convs.join(touches, "u").filter(
        (F.col("tt") <= F.col("ct")) & (F.col("tt") >= F.col("ct") - F.lit(window_us))
    )
    wc = Window.partitionBy("_cid")
    linear = (
        pairs.withColumn("_n", F.count(F.lit(1)).over(wc))
        .groupBy("channel")
        .agg(F.sum(F.lit(1.0) / F.col("_n")).alias("credit_linear"))
    )
    base = events.sparkSession.createDataFrame(
        [(c,) for c in touch_types], "channel string"
    )
    return (
        base.join(n_last, "channel", "left")
        .join(linear, "channel", "left")
        .select(
            "channel",
            F.coalesce(F.col("n_last"), F.lit(0).cast("long")).alias("n_last"),
            F.round(F.coalesce(F.col("credit_linear"), F.lit(0.0)), 6).alias("credit_linear"),
        )
    )


def markov_entropy_rate(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_cols: tuple = ("event_id",),
) -> DataFrame:
    """One-row entropy rate of the first-order event-type chain →
    (n_pairs, n_states, h_rate, h_max, predictability):
    H = −Σ_i π̂_i Σ_j P_ij ln P_ij with π̂ the EMPIRICAL from-state
    distribution — equivalently −Σ_pairs ln P(pair)/N, so it falls out
    of the transition pair table in one ln-sum. H → 0 means the next
    event is determined; predictability = 1 − H/ln(n_states) is the
    bounded score product analytics quotes ("how scripted are our
    users"). The sequence-level summary the per-cell
    :func:`~osmflat_rs_spark.operators.hotspot.segregation_h` family
    gives for space.

    Scale shape: rides :func:`event_transitions`' machinery — one lag
    window + one pair reduce; everything here is arithmetic over the
    (#types²)-sized pair table. Exact counts; ln-sums ROUND 6.
    """
    pairs = event_transitions(events, user_col, ts_col, type_col, order_cols)
    # recompute exact conditional from counts (the table's p is rounded)
    tot = pairs.groupBy("from_type").agg(F.sum("n").alias("_ft"))
    j = pairs.join(F.broadcast(tot), "from_type")
    n, ft = F.col("n").cast("double"), F.col("_ft").cast("double")
    a = j.agg(
        F.sum("n").cast("long").alias("n_pairs"),
        F.sum(F.col("n") * (F.log(ft) - F.log(n))).alias("_hsum"),
        F.countDistinct("from_type").alias("n_states"),
    )
    h = F.col("_hsum") / F.col("n_pairs")
    hmax = F.log(F.col("n_states").cast("double"))
    return a.select(
        "n_pairs",
        F.col("n_states").cast("long").alias("n_states"),
        F.round(h, 6).alias("h_rate"),
        F.round(hmax, 6).alias("h_max"),
        F.when(F.col("n_states") > 1, F.round(1 - h / hmax, 6)).alias("predictability"),
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan–Meier survival curve with right-censoring → one row per
    DISTINCT event time t: (t, n_risk, n_event, n_censored, s):
    Ŝ(t) = Π_{t_i ≤ t} (1 − d_i/n_i) — THE retention/churn curve
    (1958; what "survival of a user cohort" means when users who are
    still active must not count as churned). ``duration_col`` =
    observed time (int64), ``event_col`` = 1 if the terminal event was
    OBSERVED at that time, 0 if censored there (subject left the
    window still alive).

    Scale shape: subjects reduce to per-(t, flag) counts first (one
    corpus exchange); the curve lives on the DISTINCT-times table —
    risk sets are a reverse cumulative sum and the product telescopes
    as exp(Σ ln(1 − d/n)) over a forward cumulative window, so the
    whole estimator is two window passes over the reduced table (the
    classic sequential product restated as prefix algebra — the CUSUM
    drawdown lesson again). Global ORDER BY on distinct times — fine
    for any realistic time domain; pre-bucket otherwise. d_i/n_i and
    the ln-sums carry ROUND(s, 6). Censored-only times emit rows with
    n_event = 0 and unchanged s (they still shrink later risk sets).
    """
    from osmflat_rs_spark.plans.indexing import sorted_prefix_scan

    base = df.select(
        F.col(duration_col).cast("long").alias("t"),
        (F.col(event_col).cast("int") > 0).cast("int").alias("e"),
    ).filter(F.col("t").isNotNull())
    per_t = base.groupBy("t").agg(
        F.sum("e").cast("long").alias("n_event"),
        F.sum(F.lit(1) - F.col("e")).cast("long").alias("n_censored"),
    ).withColumn("_c", F.col("n_event") + F.col("n_censored"))
    # r6: distributed ordered scans instead of the single-partition
    # Window.orderBy over the distinct-times table (VERDICT r05 #2).
    # Risk sets are exact int cumulative counts (bit-identical); the
    # ln-sum is a double prefix whose association differs from the
    # window form only in the last ulp, inside the published ROUND-6.
    sc = sorted_prefix_scan(per_t, ["t"], long_sums=[("_c", "_cc")])
    tot = per_t.agg(F.sum("_c").cast("long").alias("_tot"))
    r = sc.crossJoin(F.broadcast(tot)).withColumn(
        "n_risk", (F.col("_tot") - (F.col("_cc") - F.col("_c"))).cast("long")
    )
    lnterm = F.when(
        F.col("n_event") > 0,
        F.log(
            (F.col("n_risk") - F.col("n_event")).cast("double")
            / F.col("n_risk").cast("double")
        ),
    ).otherwise(F.lit(0.0))
    r = sorted_prefix_scan(
        r.withColumn("_ln", lnterm), ["t"], double_sums=[("_ln", "_lnc")]
    ).withColumn("s", F.round(F.exp(F.col("_lnc")), 6))
    return r.select("t", "n_risk", "n_event", "n_censored", "s")


def logrank_test(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str,
):
    """One-row log-rank test (Mantel–Cox) comparing the survival of
    exactly two groups → (n_a, n_b, o_a, e_a, chi2): at every distinct
    event time, group A's observed deaths vs the hypergeometric
    expectation d·n_a/n given the risk sets, χ² = (Σ(O−E))²/ΣV with
    V = d·(n_a/n)·(1−n_a/n)·(n−d)/(n−1) — the standard "did cohort A
    churn differently" significance companion to
    :func:`kaplan_meier`'s curves.

    Scale shape: per-(group, time) reduce first; risk sets are reverse
    cumulative sums over the distinct-times table (two window passes,
    same as KM), the test statistic one aggregate. The group column
    must have exactly TWO values (raise otherwise — a k-group
    log-rank is a different statistic); single-subject times where
    n = 1 contribute zero variance and drop from ΣV exactly as the
    textbook prescribes. Counts exact; e_a/chi2 ROUND 6.
    """
    from pyspark.sql import Window

    base = df.select(
        F.col(group_col).cast("string").alias("g"),
        F.col(duration_col).cast("long").alias("t"),
        (F.col(event_col).cast("int") > 0).cast("int").alias("e"),
    ).filter(F.col("t").isNotNull())
    gs = [r["g"] for r in base.select("g").distinct().orderBy("g").collect()]
    if len(gs) != 2:
        raise ValueError(f"logrank_test needs exactly 2 groups, got {gs}")
    ga = gs[0]
    per = base.groupBy("t").agg(
        F.sum(F.when(F.col("g") == ga, F.col("e")).otherwise(0)).alias("da"),
        F.sum("e").alias("d"),
        F.sum(F.when(F.col("g") == ga, 1).otherwise(0)).alias("ca"),
        F.count(F.lit(1)).alias("c"),
    )
    # r6: risk sets via the distributed ordered scan (exact int
    # cumulative counts — bit-identical to the window form, without the
    # single-partition Window.orderBy; VERDICT r05 #2).
    from osmflat_rs_spark.plans.indexing import sorted_prefix_scan

    sc = sorted_prefix_scan(per, ["t"], long_sums=[("ca", "_cca"), ("c", "_cc")])
    tots2 = per.agg(
        F.sum("ca").cast("long").alias("_ta"), F.sum("c").cast("long").alias("_tc")
    )
    r = (
        sc.crossJoin(F.broadcast(tots2))
        .withColumn("na", (F.col("_ta") - (F.col("_cca") - F.col("ca"))).cast("long"))
        .withColumn("nn", (F.col("_tc") - (F.col("_cc") - F.col("c"))).cast("long"))
        .filter(F.col("d") > 0)
    )
    pa = F.col("na").cast("double") / F.col("nn")
    ea = F.col("d") * pa
    v = F.when(
        F.col("nn") > 1,
        F.col("d") * pa * (1 - pa) * (F.col("nn") - F.col("d")).cast("double")
        / (F.col("nn") - 1),
    ).otherwise(F.lit(0.0))
    tots = base.groupBy().pivot("g", gs).count()
    a = r.agg(
        F.sum("da").cast("long").alias("o_a"),
        F.sum(ea).alias("_ea"),
        F.sum(v).alias("_v"),
    ).crossJoin(F.broadcast(tots))
    diff = F.col("o_a") - F.col("_ea")
    return a.select(
        F.col(ga).cast("long").alias("n_a"),
        F.col(gs[1]).cast("long").alias("n_b"),
        "o_a",
        F.round("_ea", 6).alias("e_a"),
        F.when(F.col("_v") > 0, F.round(diff * diff / F.col("_v"), 6)).alias("chi2"),
    )


def ab_conversion(
    df: DataFrame,
    group_col: str,
    converted_col: str,
    z: float = 1.959963984540054,
) -> DataFrame:
    """Two-variant conversion readout → one row per group: (group, n,
    n_conv, rate, wilson_lo, wilson_hi) plus the same columns work for
    k variants — the Wilson score interval (1927), which unlike the
    naive ±z√(p(1−p)/n) behaves at 0 %, 100 % and small n (the
    standard product-analytics CI; z defaults to the two-sided 95 %
    quantile). One exact-count aggregate per group; the interval is a
    short deterministic IEEE tree → ROUND 6.
    """
    g = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col(converted_col).cast("int") > 0).cast("long")).alias("n_conv"),
    )
    n, x = F.col("n").cast("double"), F.col("n_conv").cast("double")
    p = x / n
    z2 = z * z
    denom = 1 + z2 / n
    center = (p + z2 / (2 * n)) / denom
    half = (z / denom) * F.sqrt(p * (1 - p) / n + z2 / (4 * n * n))
    return g.select(
        F.col("g").alias(group_col),
        F.col("n").cast("long").alias("n"),
        F.col("n_conv").cast("long").alias("n_conv"),
        F.round(p, 6).alias("rate"),
        F.round(F.greatest(F.lit(0.0), center - half), 6).alias("wilson_lo"),
        F.round(F.least(F.lit(1.0), center + half), 6).alias("wilson_hi"),
    )


def cuped_adjust(
    df: DataFrame,
    group_col: str,
    metric_col: str,
    covariate_col: str,
):
    """CUPED variance reduction (Deng et al. 2013, WSDM — the
    experimentation-platform standard) → one row per group: (group, n,
    mean_raw, mean_adj, var_raw, var_adj, theta, var_reduction):
    adjust each unit's metric by its pre-experiment covariate,
    ŷ = y − θ(x − x̄), with θ = cov(x, y)/var(x) POOLED across groups
    (the unbiasedness condition — a per-group θ would bias the
    contrast) — group means are unchanged in expectation while
    variance drops by the squared correlation.

    Everything from ONE aggregate over exact int64 sums (Σx, Σy, Σxy,
    Σx², Σy² per group + pooled via a second tiny rollup): θ and the
    variances are closed-form moment expressions → ROUND 6. Callers
    keep n·max² < 2^63. Degenerate var(x) = 0 yields θ = 0 (no
    adjustment) rather than NULLs — CUPED degrades to the raw metric.
    """
    g = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(covariate_col).cast("long")).alias("sx"),
        F.sum(F.col(metric_col).cast("long")).alias("sy"),
        F.sum((F.col(covariate_col).cast("long") * F.col(metric_col).cast("long"))).alias("sxy"),
        F.sum((F.col(covariate_col).cast("long") * F.col(covariate_col).cast("long"))).alias("sxx"),
        F.sum((F.col(metric_col).cast("long") * F.col(metric_col).cast("long"))).alias("syy"),
    )
    pooled = g.agg(
        F.sum("n").alias("pn"), F.sum("sx").alias("px"), F.sum("sy").alias("py"),
        F.sum("sxy").alias("pxy"), F.sum("sxx").alias("pxx"),
    )
    pn, px, py, pxy, pxx = (F.col(c).cast("double") for c in ("pn", "px", "py", "pxy", "pxx"))
    varx_p = pxx / pn - (px / pn) * (px / pn)
    cov_p = pxy / pn - (px / pn) * (py / pn)
    theta = F.when(varx_p > 0, cov_p / varx_p).otherwise(F.lit(0.0))
    pooled = pooled.select(theta.alias("theta"), (px / pn).alias("xbar"))
    j = g.crossJoin(F.broadcast(pooled))
    n, sx, sy, sxy, sxx, syy = (F.col(c).cast("double") for c in ("n", "sx", "sy", "sxy", "sxx", "syy"))
    th, xb = F.col("theta"), F.col("xbar")
    mean_raw = sy / n
    mean_x = sx / n
    var_raw = syy / n - mean_raw * mean_raw
    # var(y - θx) = var(y) - 2θcov(x,y) + θ²var(x), all within-group
    cov_g = sxy / n - mean_x * mean_raw
    var_x = sxx / n - mean_x * mean_x
    var_adj = var_raw - 2 * th * cov_g + th * th * var_x
    mean_adj = mean_raw - th * (mean_x - xb)
    return j.select(
        F.col("g").alias(group_col),
        F.col("n").cast("long").alias("n"),
        F.round(mean_raw, 6).alias("mean_raw"),
        F.round(mean_adj, 6).alias("mean_adj"),
        F.round(var_raw, 6).alias("var_raw"),
        F.round(var_adj, 6).alias("var_adj"),
        F.round(th, 6).alias("theta"),
        F.when(var_raw > 0, F.round(1 - var_adj / var_raw, 6)).alias("var_reduction"),
    )


def sprt_bernoulli(
    df: DataFrame,
    order_col: str,
    outcome_col: str,
    p0: float,
    p1: float,
    alpha: float = 0.05,
    beta: float = 0.05,
):
    """Wald's sequential probability ratio test (1945) over an ordered
    Bernoulli stream → one row: (n, n_pos, llr_final, decision,
    n_decided, llr_at_decision): cumulative log-likelihood ratio
    Σ ln(p1/p0) per success + ln((1−p1)/(1−p0)) per failure against
    the Wald boundaries ln(β/(1−α)) / ln((1−β)/α); the FIRST crossing
    decides ('accept_h1' / 'accept_h0'), later samples can't undo it
    — the always-valid sequential test batch peeking violates.

    Prefix algebra once more: the LLR is a running sum over the order
    (one window), the first crossing an in-aggregate min(struct) over
    the crossing rows — no driver loop, no resort. Per-row increments
    are one of two CONSTANT doubles (computed once in Python, embedded
    as literals — both engines add identical operands in identical
    order, so the running sum is bit-deterministic). 'continue' means
    the stream ended without crossing. Requires 0 < p0 < p1 < 1.
    """
    import math

    from pyspark.sql import Window

    if not (0 < p0 < p1 < 1):
        raise ValueError(f"need 0 < p0 < p1 < 1, got {p0}, {p1}")
    if not (0 < alpha < 1 and 0 < beta < 1):
        raise ValueError(f"bad error rates: {alpha}, {beta}")
    w_pos = math.log(p1 / p0)
    w_neg = math.log((1 - p1) / (1 - p0))
    lo = math.log(beta / (1 - alpha))
    hi = math.log((1 - beta) / alpha)
    base = df.select(
        F.col(order_col).cast("long").alias("o"),
        (F.col(outcome_col).cast("int") > 0).cast("int").alias("x"),
    )
    # r6: distributed ordered scan (VERDICT r05 #2) — the row index is
    # an exact int running count; the LLR keeps the identical per-row
    # constant operands, with prefix association differing from the
    # sequential window only in the last ulp (inside ROUND-6).
    from osmflat_rs_spark.plans.indexing import sorted_prefix_scan

    inc = F.when(F.col("x") == 1, F.lit(w_pos)).otherwise(F.lit(w_neg))
    r = sorted_prefix_scan(
        base.withColumn("_one", F.lit(1)).withColumn("_inc", inc),
        ["o"],
        long_sums=[("_one", "i")],
        double_sums=[("_inc", "llr")],
    ).select("o", "x", "llr", F.col("i").cast("int").alias("i"))
    crossing = F.when(F.col("llr") >= hi, F.lit("accept_h1")).when(
        F.col("llr") <= lo, F.lit("accept_h0")
    )
    first = F.min(
        F.when(
            crossing.isNotNull(),
            F.struct(F.col("i").alias("i"), crossing.alias("d"), F.col("llr").alias("l")),
        )
    )
    a = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("long").alias("n_pos"),
        F.max(F.struct("i", "llr")).alias("_last"),
        first.alias("_first"),
    )
    return a.select(
        F.col("n").cast("long").alias("n"),
        "n_pos",
        F.round(F.col("_last.llr"), 6).alias("llr_final"),
        F.coalesce(F.col("_first.d"), F.lit("continue")).alias("decision"),
        F.col("_first.i").cast("long").alias("n_decided"),
        F.round(F.col("_first.l"), 6).alias("llr_at_decision"),
    )


def bh_fdr(
    df: DataFrame,
    test_col: str,
    p_num_col: str,
    p_den_col: str,
    q=(1, 20),
):
    """Benjamini–Hochberg step-up FDR control (1995) over a table of
    hypothesis tests → one row per test: (test, rank, m, p, rejected)
    — sort the m p-values ascending, find the LARGEST rank k with
    p_(k) ≤ (k/m)·q, reject every test ranked ≤ k. The multiple-
    comparisons gate every experimentation platform needs the moment
    it runs more than one metric: per-test α would inflate false
    discoveries m-fold; BH caps the expected FALSE-DISCOVERY RATE at q
    while keeping far more power than Bonferroni.

    Exactness: p-values arrive as rationals (p_num/p_den) and the
    step-up condition is the cross-multiplied int64 comparison
    p_num·m·q_den ≤ rank·q_num·p_den — no float enters the decision;
    the reported ``p`` double is display-only (ROUND 6). Scale shape:
    the input is one row per TEST (thousands, not billions — the
    per-test p-values are upstream reductions), so the single global
    rank window is driver-scale by construction; the cut rank k is a
    1-row broadcast joined back. q = (num, den) rational in (0, 1).
    """
    q_num, q_den = int(q[0]), int(q[1])
    if not (0 < q_num < q_den):
        raise ValueError(f"q must be a rational in (0, 1), got {q}")
    base = df.select(
        F.col(test_col).alias("_t"),
        F.col(p_num_col).cast("long").alias("_pn"),
        F.col(p_den_col).cast("long").alias("_pd"),
    )
    p = F.col("_pn").cast("double") / F.col("_pd").cast("double")
    # r6: rank via the distributed ordered scan on (p, test) and m via a
    # broadcast scalar — replaces the single-partition rank window and
    # the whole-table count window (VERDICT r05 #2); exact ints, same
    # (p, _t) total order, bit-identical ranks.
    from osmflat_rs_spark.plans.indexing import sorted_prefix_scan

    mrow = base.agg(F.count(F.lit(1)).alias("m"))
    ranked = sorted_prefix_scan(
        base.select("_t", "_pn", "_pd", p.alias("_p"), F.lit(1).alias("_one")),
        ["_p", "_t"],
        long_sums=[("_one", "rank")],
    ).drop("_one").crossJoin(F.broadcast(mrow))
    cond = (F.col("_pn") * F.col("m") * F.lit(q_den)) <= (
        F.col("rank") * F.lit(q_num) * F.col("_pd")
    )
    kcut = ranked.agg(
        F.coalesce(F.max(F.when(cond, F.col("rank"))), F.lit(0)).cast("long").alias("_k")
    )
    return ranked.crossJoin(F.broadcast(kcut)).select(
        F.col("_t").alias(test_col),
        F.col("rank").cast("long").alias("rank"),
        F.col("m").cast("long").alias("m"),
        F.round(F.col("_p"), 6).alias("p"),
        (F.col("rank") <= F.col("_k")).alias("rejected"),
    )


def jackknife_ratio(
    df: DataFrame,
    group_col: str,
    bucket_col: str,
    num_col: str,
    den_col: str,
    fp_scale: int = 10**9,
):
    """Delete-one-BUCKET jackknife for a ratio metric → one row per
    group: (group, n_buckets, n_used, ratio, se_jk, ci_lo, ci_hi) —
    the standard variance estimator for Σx/Σy metrics (revenue per
    session, CTR), whose per-unit deltas don't average: leave each
    bucket j out, recompute R_j = (Σx−x_j)/(Σy−y_j), and
    Var_jk = (J−1)/J · Σ(R_j − R̄)². Buckets (user-hash shards) are
    the unit, so the estimator respects within-user correlation and
    the whole thing is algebra over J partial sums — the reason every
    large experimentation system jackknifes over buckets instead of
    bootstrap-resampling rows.

    Determinism contract: per-bucket sums are exact int64; each R_j is
    ONE int÷int division (IEEE-exact), then snapped to the
    ``fp_scale`` fixed-point lattice and squared in DECIMAL(38,0) so
    the across-bucket Σ and Σ² are exact in any summation order — one
    float division at the end (ROUND 6). Buckets where the
    leave-one-out denominator is 0 are excluded (n_used < n_buckets
    reports it). CI is ratio ± 1.96·se. Scale shape: one shuffle to
    (group, bucket), a tiny per-group rollup broadcast back — J is
    bounded (64-1024 buckets) regardless of row count.
    """
    b = df.groupBy(
        F.col(group_col).alias("_g"), F.col(bucket_col).alias("_b")
    ).agg(
        F.sum(F.col(num_col).cast("long")).alias("_sx"),
        F.sum(F.col(den_col).cast("long")).alias("_sy"),
    )
    tot = b.groupBy("_g").agg(
        F.sum("_sx").alias("_tx"),
        F.sum("_sy").alias("_ty"),
        F.count(F.lit(1)).alias("_j"),
    )
    j = b.join(F.broadcast(tot), "_g")
    lx = F.col("_tx") - F.col("_sx")
    ly = F.col("_ty") - F.col("_sy")
    rj = F.when(ly != 0, lx.cast("double") / ly.cast("double"))
    rj_fp = F.floor(rj * F.lit(float(fp_scale)) + F.lit(0.5)).cast("long")
    agg = j.select("_g", "_j", "_ty", "_tx", rj_fp.alias("_rfp")).groupBy("_g").agg(
        F.first("_j").alias("n_buckets"),
        F.first("_tx").alias("_tx"),
        F.first("_ty").alias("_ty"),
        F.count("_rfp").alias("n_used"),
        F.sum("_rfp").alias("_s1"),
        F.sum(F.col("_rfp").cast("decimal(38,0)") * F.col("_rfp").cast("decimal(38,0)")).alias("_s2"),
    )
    jd = F.col("n_used").cast("double")
    s1 = F.col("_s1").cast("double")
    s2 = F.col("_s2").cast("double")
    fp2 = float(fp_scale) * float(fp_scale)
    var_jk = F.when(
        F.col("n_used") > 1,
        ((jd - 1) / jd) * (s2 / jd - (s1 / jd) * (s1 / jd)) / F.lit(fp2),
    )
    # greatest() skips NULLs, so guard explicitly: undefined variance
    # (n_used <= 1) must stay NULL, not collapse to se = 0
    se = F.when(var_jk.isNotNull(), F.sqrt(F.greatest(var_jk, F.lit(0.0))))
    ratio = F.when(
        F.col("_ty") != 0, F.col("_tx").cast("double") / F.col("_ty").cast("double")
    )
    return agg.select(
        F.col("_g").alias(group_col),
        F.col("n_buckets").cast("long").alias("n_buckets"),
        F.col("n_used").cast("long").alias("n_used"),
        F.round(ratio, 6).alias("ratio"),
        F.round(se, 6).alias("se_jk"),
        F.round(ratio - 1.96 * se, 6).alias("ci_lo"),
        F.round(ratio + 1.96 * se, 6).alias("ci_hi"),
    )


#: cumulative Poisson(1) CDF — P(W <= k) for k = 0..9; a hash-uniform
#: u in [0,1) maps to weight w = #{thresholds < u} (truncated at 10,
#: P(W > 10) ≈ 1e-8). Shared verbatim with the SQL oracle.
POISSON1_CDF = (
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712, 0.9999897508033253, 0.999998874797402,
    0.9999998885745216,
)


def poisson_bootstrap(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value_col: str,
    replicates: int = 200,
    lo_q=(25, 1000),
    hi_q=(975, 1000),
    seed: str = "pb",
):
    """Deterministic Poisson bootstrap CI for a per-group mean → one
    row per group: (group, n, mean_full, replicates, ci_lo, ci_hi).
    THE bootstrap that works on a cluster (Chamandy et al. 2012,
    "Estimating Uncertainty for Massive Data Streams", Google):
    classical bootstrap resampling needs n coordinated draws per
    replicate, but multinomial(n, 1/n) → Poisson(1) per row as n→∞,
    so each row independently gets weight w_{i,r} ~ Poisson(1) —
    map-only weight generation, no coordination, one shuffle per
    aggregate, and any replicate count R rides the same pass.

    Determinism: w is the inverse-CDF of the engine-wide 60-bit md5
    hash of (seed, replicate, id) against the shared POISSON1_CDF
    literals — re-runs, retries, and the SQL oracle agree bit-for-bit.
    Replicate means are exact int64 Σ(w·v)/Σw (one division); the CI
    bounds are exact order statistics over the R means at ranks
    ⌈R·lo_q⌉ / ⌈R·hi_q⌉ (rational, cross-multiplied). Scale: rows
    fan out ×R BEFORE the shuffle but carry only (group, r, w·v, w) —
    partial aggregation collapses them map-side, so shuffle bytes are
    groups×R, not rows×R. ROUND 6 on the three reported doubles.
    """
    if replicates < 2:
        raise ValueError(f"replicates must be >= 2, got {replicates}")
    lo_n, lo_d = int(lo_q[0]), int(lo_q[1])
    hi_n, hi_d = int(hi_q[0]), int(hi_q[1])
    if not (0 < lo_n < lo_d and 0 < hi_n < hi_d):
        raise ValueError(f"quantile specs must be rationals in (0,1): {lo_q}, {hi_q}")
    from .dedup import md5_int60

    base = df.select(
        F.col(group_col).alias("_g"),
        F.col(id_col).cast("string").alias("_id"),
        F.col(value_col).cast("long").alias("_v"),
    ).filter(F.col("_v").isNotNull())
    rep = base.select(
        "_g", "_id", "_v", F.explode(F.sequence(F.lit(0), F.lit(replicates - 1))).alias("_r")
    )
    u = (
        md5_int60(F.concat(F.lit(seed + ":"), F.col("_r").cast("string"), F.lit(":"), F.col("_id")))
        + F.lit(1)
    ).cast("double") / F.lit(2.0**60)
    w = sum(((u > F.lit(t)).cast("long") for t in POISSON1_CDF), F.lit(0).cast("long"))
    means = (
        rep.select("_g", "_r", w.alias("_w"), (w * F.col("_v")).alias("_wv"))
        .groupBy("_g", "_r")
        .agg(F.sum("_w").alias("_sw"), F.sum("_wv").alias("_swv"))
        .select(
            "_g", "_r",
            F.when(F.col("_sw") > 0, F.col("_swv").cast("double") / F.col("_sw").cast("double")).alias("_m"),
        )
        .filter(F.col("_m").isNotNull())
    )
    wrk = Window.partitionBy("_g").orderBy(F.col("_m").asc(), F.col("_r").asc())
    ranked = means.select(
        "_g", "_m",
        F.row_number().over(wrk).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy("_g")).alias("_R"),
    )
    # rank = ceil(R * q) cross-multiplied: smallest rn with rn*den >= R*num
    lo_rank = F.floor((F.col("_R") * lo_n + lo_d - 1) / lo_d).cast("long")
    hi_rank = F.floor((F.col("_R") * hi_n + hi_d - 1) / hi_d).cast("long")
    ci = ranked.groupBy("_g").agg(
        F.first("_R").cast("long").alias("replicates"),
        F.min(F.when(F.col("_rn") == lo_rank, F.col("_m"))).alias("_lo"),
        F.min(F.when(F.col("_rn") == hi_rank, F.col("_m"))).alias("_hi"),
    )
    full = base.groupBy("_g").agg(
        F.count(F.lit(1)).alias("n"), F.sum("_v").alias("_sv")
    )
    out = full.join(ci, "_g")
    return out.select(
        F.col("_g").alias(group_col),
        F.col("n").cast("long").alias("n"),
        F.round(F.col("_sv").cast("double") / F.col("n").cast("double"), 6).alias("mean_full"),
        "replicates",
        F.round(F.col("_lo"), 6).alias("ci_lo"),
        F.round(F.col("_hi"), 6).alias("ci_hi"),
    )


def welch_t(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
):
    """Welch's unequal-variance two-sample t-test (1947) → one row:
    (n_a, n_b, mean_a, mean_b, t, df) — the default A/B mean test
    (Student's equal-variance form is never safe on real metrics):
    t = (m̄_a − m̄_b)/√(s²_a/n_a + s²_b/n_b) with the Welch–
    Satterthwaite effective df. Complements the rank (MWU), CDF (KS)
    and sequential (SPRT) tests already in this module.

    One aggregate of exact int64 (n, Σx, Σx²) per arm — callers keep
    n·max² < 2^63 — then closed-form double arithmetic (SAMPLE
    variance, n−1) in a pinned op order, ROUND 6. NULL-valued rows
    are dropped BEFORE counting (a NULL skipped by Σ but counted in n
    would silently bias every statistic — r5c review). Degenerate arms
    (n < 2 or both variances 0) yield NULL t/df rather than ±inf.
    Scale shape: one map-side-combined groupBy of two rows; nothing
    else."""
    g = (
        df.filter(
            F.col(group_col).isin([group_a, group_b])
            & F.col(value_col).isNotNull()
        )
        .groupBy(F.col(group_col).alias("_g"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast("long")).alias("sx"),
            F.sum(F.col(value_col).cast("long") * F.col(value_col).cast("long")).alias("sxx"),
        )
    )
    a = g.filter(F.col("_g") == group_a).select(
        F.col("n").alias("n_a"), F.col("sx").alias("sx_a"), F.col("sxx").alias("sxx_a")
    )
    b = g.filter(F.col("_g") == group_b).select(
        F.col("n").alias("n_b"), F.col("sx").alias("sx_b"), F.col("sxx").alias("sxx_b")
    )
    j = a.crossJoin(F.broadcast(b))
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ma = F.col("sx_a").cast("double") / na
    mb = F.col("sx_b").cast("double") / nb
    # sample variance via (sxx - sx*m) / (n-1): one subtraction of like
    # magnitudes, same op order as the SQL oracle
    va = (F.col("sxx_a").cast("double") - F.col("sx_a").cast("double") * ma) / (na - 1)
    vb = (F.col("sxx_b").cast("double") - F.col("sx_b").cast("double") * mb) / (nb - 1)
    sea = va / na
    seb = vb / nb
    se2 = sea + seb
    t = F.when((F.col("n_a") > 1) & (F.col("n_b") > 1) & (se2 > 0), (ma - mb) / F.sqrt(se2))
    dof = F.when(
        (F.col("n_a") > 1) & (F.col("n_b") > 1) & (se2 > 0),
        (se2 * se2) / (sea * sea / (na - 1) + seb * seb / (nb - 1)),
    )
    return j.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.round(t, 6).alias("t"),
        F.round(dof, 6).alias("df"),
    )


def permutation_test(
    df: DataFrame,
    id_col: str,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    n_perm: int = 200,
    seed: str = "perm",
):
    """Monte-Carlo randomization test for a difference in means → one
    row: (n_a, n_b, diff_obs, n_perm, n_ge, p) — the assumption-free
    answer to "could this lift be label noise": re-label every unit at
    random B times, recompute the arm difference under each
    relabeling, and p = (1 + #{|diff_b| ≥ |diff_obs|}) / (B + 1)
    (the add-one form is the exact finite-sample-valid estimator,
    Phipson & Smyth 2010). Under H0 (exchangeable labels) the
    relabeled diffs ARE draws from the null.

    This is the hash-randomization variant every cluster uses:
    labels are reassigned Bernoulli(1/2) by the engine-wide md5 hash
    of (seed, replicate, id) rather than by a global shuffle — a
    global permutation needs a total order + coordinated swap
    (cluster-hostile), while hash relabeling is map-only and
    deterministic (re-runs, retries and the SQL oracle agree
    bit-for-bit). With unequal arm sizes the null it samples is
    "labels assigned independently at fair coin", the standard
    large-n approximation to the permutation null.

    Exactness: per-(replicate, pseudo-arm) sums are int64; each
    replicate diff is two int divisions and one subtraction (pinned
    order); the ≥ comparison is double-vs-double on identical float
    paths, so the count n_ge is integer-exact cross-engine. Scale
    shape: rows fan out ×B carrying (replicate, side, v) — partial
    aggregation collapses map-side; shuffle bytes are O(B), never
    O(rows×B)."""
    if n_perm < 1:
        raise ValueError(f"n_perm must be >= 1, got {n_perm}")
    from .dedup import md5_int60

    base = df.filter(F.col(group_col).isin([group_a, group_b])).select(
        F.col(id_col).cast("string").alias("_id"),
        (F.col(group_col) == group_a).cast("int").alias("_is_a"),
        F.col(value_col).cast("long").alias("_v"),
    ).filter(F.col("_v").isNotNull())
    obs = base.groupBy("_is_a").agg(
        F.count(F.lit(1)).alias("n"), F.sum("_v").alias("s")
    )
    oa = obs.filter(F.col("_is_a") == 1).select(
        F.col("n").alias("n_a"), F.col("s").alias("s_a")
    )
    ob = obs.filter(F.col("_is_a") == 0).select(
        F.col("n").alias("n_b"), F.col("s").alias("s_b")
    )
    o = oa.crossJoin(F.broadcast(ob)).select(
        "n_a", "n_b",
        (
            F.col("s_a").cast("double") / F.col("n_a").cast("double")
            - F.col("s_b").cast("double") / F.col("n_b").cast("double")
        ).alias("diff_obs"),
    )
    rep = base.select(
        "_id", "_v",
        F.explode(F.sequence(F.lit(1), F.lit(n_perm))).alias("_r"),
    )
    side = (
        F.pmod(
            md5_int60(
                F.concat(F.lit(seed + ":"), F.col("_r").cast("string"), F.lit(":"), F.col("_id"))
            ),
            F.lit(2),
        )
        == 1
    ).cast("int")
    perms = (
        rep.select("_r", side.alias("_pa"), F.col("_v"))
        .groupBy("_r")
        .agg(
            F.sum(F.when(F.col("_pa") == 1, F.col("_v"))).alias("sa"),
            F.count(F.when(F.col("_pa") == 1, F.lit(1))).alias("na"),
            F.sum(F.when(F.col("_pa") == 0, F.col("_v"))).alias("sb"),
            F.count(F.when(F.col("_pa") == 0, F.lit(1))).alias("nb"),
        )
        .filter((F.col("na") > 0) & (F.col("nb") > 0))
        .select(
            (
                F.col("sa").cast("double") / F.col("na").cast("double")
                - F.col("sb").cast("double") / F.col("nb").cast("double")
            ).alias("d")
        )
    )
    tail = perms.crossJoin(F.broadcast(o)).agg(
        F.count(F.lit(1)).alias("n_perm_used"),
        F.sum((F.abs(F.col("d")) >= F.abs(F.col("diff_obs"))).cast("long")).alias("n_ge"),
    )
    return o.crossJoin(F.broadcast(tail)).select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round("diff_obs", 6).alias("diff_obs"),
        F.col("n_perm_used").cast("long").alias("n_perm"),
        F.col("n_ge").cast("long").alias("n_ge"),
        F.round(
            (F.col("n_ge").cast("double") + 1) / (F.col("n_perm_used").cast("double") + 1), 6
        ).alias("p"),
    )


def _fpdiv(num, den, scale: int):
    """floor(num·scale / den) via exact SPLIT-SCALE integer long
    division: the remainder is scaled in two ~√scale steps so the
    largest intermediate is den·√scale, not den·scale — tolerates den
    up to 2^63/√scale (~9e15 at scale 1e6) where the naive two-step
    form overflows at den ≈ 9e12 (r5c review finding). Exact: the
    result is the true floor in every branch. num, den must be
    non-negative int64 expressions, den > 0; num itself must fit
    int64 (use :func:`_fpdiv_big` when it needs DECIMAL(38))."""
    s1 = 1
    while s1 * s1 < scale:
        s1 *= 10
    s2 = scale // s1
    assert s1 * s2 == scale, f"scale must be a power of 10: {scale}"
    return F.expr(
        f"(({num}) div ({den})) * {scale}L"
        f" + ((((({num}) % ({den})) * {s1}L) div ({den})) * {s2}L)"
        f" + ((((({num}) % ({den})) * {s1}L) % ({den})) * {s2}L) div ({den})"
    )


def _fpdiv_big(num, den, scale: int):
    """floor(num·scale / den) where the NUMERATOR needs DECIMAL(38)
    (e.g. the CMH variance's four-way count product): quotient and
    remainder come from decimal integer division, then the long
    remainder is split-scaled as in :func:`_fpdiv`. Exact for den ≤
    2^63/√scale and num < 10^38."""
    s1 = 1
    while s1 * s1 < scale:
        s1 *= 10
    s2 = scale // s1
    assert s1 * s2 == scale, f"scale must be a power of 10: {scale}"
    nd = f"CAST(({num}) AS DECIMAL(38,0))"
    dd = f"CAST(({den}) AS DECIMAL(38,0))"
    q = f"CAST(({nd}) div ({dd}) AS BIGINT)"
    r = f"CAST(({nd}) % ({dd}) AS BIGINT)"
    return F.expr(
        f"({q}) * {scale}L"
        f" + (((({r}) * {s1}L) div ({den})) * {s2}L)"
        f" + (((({r}) * {s1}L) % ({den})) * {s2}L) div ({den})"
    )


def cmh_odds(
    df: DataFrame,
    stratum_col: str,
    arm_col: str,
    outcome_col: str,
    arm_a,
    arm_b,
    scale: int = 10**6,
):
    """Cochran–Mantel–Haenszel stratified 2×2 analysis → one row:
    (n_strata, n, or_mh, chi2_cmh) — the pooled odds ratio and
    association test across confounder strata (country, platform,
    cohort day): OR_MH = Σ(aᵢdᵢ/nᵢ) / Σ(bᵢcᵢ/nᵢ), χ²_CMH =
    (Σaᵢ − Σ E[aᵢ])² / Σ Var[aᵢ] — THE guard against Simpson's
    paradox when a platform reads conversion across mixed segments
    (uncorrected marginals can show the OPPOSITE sign of every
    stratum, Simpson 1951; CMH weights each stratum's 2×2 by its
    information content, Mantel & Haenszel 1959).

    Determinism: every per-stratum term aᵢdᵢ/nᵢ, bᵢcᵢ/nᵢ,
    E[aᵢ] = r1ᵢc1ᵢ/nᵢ and Var[aᵢ] = r1ᵢr2ᵢc1ᵢc2ᵢ/(nᵢ²(nᵢ−1)) is
    snapped to the ``scale`` fixed-point lattice by EXACT integer
    long division (:func:`_fpdiv` split-scale form; the variance's
    four-way count product rides DECIMAL(38) via :func:`_fpdiv_big`),
    so the across-strata sums are exact integers in any order; two
    float divisions at the end (ROUND 6). Strata are bounded at
    200,000 rows each (the exactness envelope of the split-scale
    remainder: den·√scale < 2^63) — a larger stratum raises with
    instructions to sub-stratify rather than silently overflowing
    (r5c review finding; Spark ANSI mode would otherwise kill the
    job mid-flight at ~21k rows with the naive form). No
    continuity correction (the uncorrected χ² is the cross-engine-
    stable convention; document downstream if you need Yates).
    Single-cell-empty strata contribute 0 to the sums they can't
    inform, the standard MH behavior. Scale shape: one groupBy to the
    strata table (bounded by distinct strata), then a 1-row reduce.
    """
    s = (
        df.filter(F.col(arm_col).isin([arm_a, arm_b]))
        .groupBy(F.col(stratum_col).alias("_s"))
        .agg(
            F.sum(((F.col(arm_col) == arm_a) & (F.col(outcome_col).cast("int") > 0)).cast("long")).alias("a"),
            F.sum(((F.col(arm_col) == arm_a) & ~(F.col(outcome_col).cast("int") > 0)).cast("long")).alias("b"),
            F.sum(((F.col(arm_col) == arm_b) & (F.col(outcome_col).cast("int") > 0)).cast("long")).alias("c"),
            F.sum(((F.col(arm_col) == arm_b) & ~(F.col(outcome_col).cast("int") > 0)).cast("long")).alias("d"),
        )
        .withColumn("n", F.col("a") + F.col("b") + F.col("c") + F.col("d"))
        .filter(F.col("n") > 0)
    )
    too_big = s.filter(F.col("n") > 200_000).limit(1).count()
    if too_big:
        raise ValueError(
            "cmh_odds: a stratum exceeds 200,000 rows (the exact-arithmetic "
            "envelope); sub-stratify (e.g. add a hash bucket to the stratum key)"
        )
    sc = int(scale)
    agg = s.agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.sum("n").alias("n_total"),
        F.sum("a").alias("sum_a"),
        F.sum(F.when(F.col("n") > 0, _fpdiv("a * d", "n", sc)).otherwise(F.lit(0))).alias("or_num"),
        F.sum(F.when(F.col("n") > 0, _fpdiv("b * c", "n", sc)).otherwise(F.lit(0))).alias("or_den"),
        F.sum(F.when(F.col("n") > 0, _fpdiv("(a + b) * (a + c)", "n", sc)).otherwise(F.lit(0))).alias("e_fp"),
        F.sum(
            F.when(
                F.col("n") > 1,
                _fpdiv_big(
                    "CAST(a + b AS DECIMAL(38,0)) * (c + d) * (a + c) * (b + d)",
                    "n * n * (n - 1)",
                    sc,
                ),
            ).otherwise(F.lit(0))
        ).alias("var_fp"),
    )
    num = F.col("sum_a").cast("double") - F.col("e_fp").cast("double") / F.lit(float(sc))
    chi2 = F.when(
        F.col("var_fp") > 0,
        (num * num) / (F.col("var_fp").cast("double") / F.lit(float(sc))),
    )
    or_mh = F.when(
        F.col("or_den") > 0, F.col("or_num").cast("double") / F.col("or_den").cast("double")
    )
    return agg.select(
        F.col("n_strata").cast("long").alias("n_strata"),
        F.col("n_total").cast("long").alias("n"),
        F.round(or_mh, 6).alias("or_mh"),
        F.round(chi2, 6).alias("chi2_cmh"),
    )


def diff_in_diff(
    df: DataFrame,
    group_col: str,
    period_col: str,
    value_col: str,
    treat,
    control,
    pre,
    post,
):
    """Difference-in-differences → one row: (n_tpre, n_tpost, n_cpre,
    n_cpost, did, se, t) — the workhorse quasi-experimental estimator
    when randomization wasn't possible (feature shipped to one market,
    policy hit one region): DiD = (ȳ_treat,post − ȳ_treat,pre) −
    (ȳ_control,post − ȳ_control,pre) cancels both the group's level
    and the common shock, leaving the causal effect under the
    parallel-trends assumption (Card & Krueger 1994). The SE is the
    unpooled four-cell Welch form √Σ s²ᵢ/nᵢ — each cell mean is
    independent, so variances add.

    One map-side-combined aggregate of exact int64 (n, Σx, Σx²) per
    cell (callers keep n·max² < 2^63), then pinned-order closed-form
    doubles (SAMPLE variance), ROUND 6. Any cell with n < 2 yields
    NULL se/t but the point estimate still reports when all four
    means exist. Scale shape: a four-row reduce; nothing else."""
    cells = (
        df.filter(
            F.col(group_col).isin([treat, control])
            & F.col(period_col).isin([pre, post])
            & F.col(value_col).isNotNull()
        )
        .groupBy(
            (F.col(group_col) == treat).cast("int").alias("_t"),
            (F.col(period_col) == post).cast("int").alias("_p"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast("long")).alias("sx"),
            F.sum(F.col(value_col).cast("long") * F.col(value_col).cast("long")).alias("sxx"),
        )
    )
    def cell(t, p, tag):
        return cells.filter((F.col("_t") == t) & (F.col("_p") == p)).select(
            F.col("n").alias(f"n_{tag}"),
            F.col("sx").alias(f"sx_{tag}"),
            F.col("sxx").alias(f"sxx_{tag}"),
        )
    j = (
        cell(1, 0, "tpre")
        .crossJoin(F.broadcast(cell(1, 1, "tpost")))
        .crossJoin(F.broadcast(cell(0, 0, "cpre")))
        .crossJoin(F.broadcast(cell(0, 1, "cpost")))
    )
    def m(tag):
        return F.col(f"sx_{tag}").cast("double") / F.col(f"n_{tag}").cast("double")
    def sv(tag):
        n = F.col(f"n_{tag}").cast("double")
        return (
            (F.col(f"sxx_{tag}").cast("double") - F.col(f"sx_{tag}").cast("double") * m(tag))
            / (n - 1)
            / n
        )
    did = (m("tpost") - m("tpre")) - (m("cpost") - m("cpre"))
    all_n2 = (
        (F.col("n_tpre") > 1) & (F.col("n_tpost") > 1)
        & (F.col("n_cpre") > 1) & (F.col("n_cpost") > 1)
    )
    se2 = sv("tpre") + sv("tpost") + sv("cpre") + sv("cpost")
    se = F.when(all_n2 & (se2 > 0), F.sqrt(se2))
    return j.select(
        F.col("n_tpre").cast("long").alias("n_tpre"),
        F.col("n_tpost").cast("long").alias("n_tpost"),
        F.col("n_cpre").cast("long").alias("n_cpre"),
        F.col("n_cpost").cast("long").alias("n_cpost"),
        F.round(did, 6).alias("did"),
        F.round(se, 6).alias("se"),
        F.round(F.when(se.isNotNull(), did / se), 6).alias("t"),
    )


def markov_attribution(
    df: DataFrame,
    user_col: str,
    order_col: str,
    channel_col: str,
    conv_value,
):
    """Markov removal-effect attribution (Anderl et al. 2016 — the
    data-driven alternative to the last-touch/linear rules already in
    this module) → one row per channel: (channel, n_touches,
    removal_effect, attribution). Journeys become a first-order
    Markov chain START → touches → {CONV, NULL}; a channel's credit
    is how much the chain's START→CONV probability DROPS when that
    channel is removed (its transitions redirected to NULL), shares
    normalized to sum 1.

    Model contract (the standard simplification, stated not hidden):
    a user's journey is their ``conv_value``-excluded touch sequence
    in ``order_col`` order; the absorbing state is CONV iff the user
    has ≥1 conversion event, else NULL — conversion timing within the
    journey is not modeled.

    Scale shape: ONE window (lag over user order) + one
    map-side-combined groupBy produce the exact int64 transition
    counts; everything after runs on the DRIVER over the (channels+3)²
    count matrix — bounded by the channel vocabulary (dozens), the
    legitimate driver-side exception (IVF-init precedent), solved with
    numpy absorbing-chain algebra from the exact counts. ROUND 6.
    Returns an empty result if no journey converts (no credit to
    assign)."""
    from pyspark.sql import Window

    touches = df.filter(F.col(channel_col) != conv_value).select(
        F.col(user_col).alias("_u"),
        F.col(order_col).alias("_o"),
        F.col(channel_col).alias("_c"),
    )
    conv_users = (
        df.filter(F.col(channel_col) == conv_value)
        .select(F.col(user_col).alias("_u"))
        .distinct()
        .withColumn("_conv", F.lit(1))
    )
    w = Window.partitionBy("_u").orderBy("_o")
    seq = touches.withColumn("_prev", F.lag("_c").over(w)).withColumn(
        "_is_last", F.lead("_c").over(w).isNull()
    )
    j = seq.join(conv_users, "_u", "left").withColumn(
        "_end", F.when(F.col("_conv") == 1, F.lit("CONV")).otherwise(F.lit("NULL"))
    )
    trans = (
        j.select(F.coalesce("_prev", F.lit("START")).alias("src"), F.col("_c").alias("dst"))
        .unionByName(
            j.filter(F.col("_is_last")).select(
                F.col("_c").alias("src"), F.col("_end").alias("dst")
            )
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rows = trans.collect()  # bounded: (channels + 3)^2
    import numpy as np

    counts = {(r["src"], r["dst"]): r["n"] for r in rows}
    channels = sorted(
        {s for s, _ in counts if s not in ("START",)}
        | {d for _, d in counts if d not in ("CONV", "NULL")}
    )
    reserved = set(channels) & {"START", "CONV", "NULL"}
    if reserved or any(
        s in ("CONV", "NULL") for s, _ in counts
    ):
        raise ValueError(
            "markov_attribution: a channel value collides with a reserved "
            "state name (START/CONV/NULL) — rename it upstream (a literal "
            "'NULL' channel would silently score as lost traffic)"
        )
    if not channels:
        return df.sparkSession.createDataFrame(
            [], "channel string, n_touches long, removal_effect double, attribution double"
        )
    n_touch = {c: sum(n for (s, d), n in counts.items() if d == c) for c in channels}

    def conv_prob(removed=None):
        keep = [c for c in channels if c != removed]
        states = ["START"] + keep  # transient
        idx = {s: i for i, s in enumerate(states)}
        k = len(states)
        Q = np.zeros((k, k))
        r = np.zeros(k)
        for i, s in enumerate(states):
            out = {d: n for (ss, d), n in counts.items() if ss == s}
            tot = sum(out.values())
            if tot == 0:
                continue
            for d, n in out.items():
                p = n / tot
                if d == "CONV":
                    r[i] += p
                elif d == "NULL" or d == removed:
                    pass  # absorbed without conversion
                else:
                    Q[i, idx[d]] += p
        x = np.linalg.solve(np.eye(k) - Q, r)
        return float(x[0])

    p_full = conv_prob()
    if p_full <= 0:
        return df.sparkSession.createDataFrame(
            [], "channel string, n_touches long, removal_effect double, attribution double"
        )
    effects = {c: max(0.0, (p_full - conv_prob(c)) / p_full) for c in channels}
    tot_eff = sum(effects.values())
    out_rows = [
        (
            c,
            int(n_touch[c]),
            round(effects[c], 6),
            round(effects[c] / tot_eff, 6) if tot_eff > 0 else None,
        )
        for c in channels
    ]
    return df.sparkSession.createDataFrame(
        out_rows, "channel string, n_touches long, removal_effect double, attribution double"
    )


def eb_shrinkage(
    df: DataFrame,
    item_col: str,
    success_col: str,
    trials_col: str,
    min_trials: int = 1,
    fp_scale: int = 10**12,
):
    """Empirical-Bayes beta-binomial shrinkage of per-item rates →
    one row per item: (item, k, n, rate_raw, rate_eb, alpha, beta) —
    the fix for "a 1/1 item outranks a 950/1000 item": fit a Beta
    prior to the CORPUS of per-item rates by moment matching
    (Robbins 1956; the baseball-batting classic), then score each
    item by its posterior mean (k+α)/(n+α+β). Tiny-n items shrink
    hard toward the corpus rate; well-measured items barely move —
    exactly the ranking behavior a marketplace/CTR system needs.

    Moment matching: with μ, v the mean and variance of the per-item
    raw rates (items with n ≥ min_trials), ν = μ(1−μ)/v − 1,
    α = μν, β = (1−μ)ν. Degenerate corpora (v ≤ 0 or v ≥ μ(1−μ):
    fewer than 2 eligible items, all-identical or over-dispersed
    rates) emit NULL α/β and rate_eb = rate_raw — no silent fake
    prior.

    Determinism: each raw rate snaps to the ``fp_scale`` lattice by
    EXACT integer division ((k·scale) div n), so Σp and Σp² (the
    latter in DECIMAL(38)) are order-free exact integers; μ, v, α, β
    are a few pinned-order doubles from those ints, broadcast back as
    a 1-row table; each item's posterior mean is one more division.
    ROUND 6. One groupBy to the item table, one tiny reduce, one
    broadcast join — nothing row-scale after the first aggregate."""
    if min_trials < 1:
        raise ValueError(f"min_trials must be >= 1, got {min_trials}")
    sc = int(fp_scale)
    items = df.groupBy(F.col(item_col).alias("_i")).agg(
        F.sum(F.col(success_col).cast("long")).alias("k"),
        F.sum(F.col(trials_col).cast("long")).alias("n"),
    ).filter(F.col("n") > 0)
    pfp = F.expr(f"(k * {sc}L) div n")
    el = items.filter(F.col("n") >= min_trials).select(
        pfp.alias("_p"),
    )
    mom = el.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("_p").alias("s1"),
        F.sum(F.col("_p").cast("decimal(38,0)") * F.col("_p").cast("decimal(38,0)")).alias("s2"),
    )
    md = F.col("m").cast("double")
    # every division guarded: ANSI mode throws DIVIDE_BY_ZERO even for
    # doubles, so the degenerate m<=1 corpus must never reach one
    mu = F.when(
        F.col("m") > 0, F.col("s1").cast("double") / md / F.lit(float(sc))
    )
    # sample variance of the lattice rates
    v = F.when(
        F.col("m") > 1,
        (F.col("s2").cast("double") / F.lit(float(sc)) / F.lit(float(sc)) - md * mu * mu)
        / (md - 1),
    )
    nu = F.when(v > 0, mu * (1 - mu) / v - 1)
    ok = nu > 0
    prior = mom.select(
        F.when(ok, mu * nu).alias("_alpha"),
        F.when(ok, (1 - mu) * nu).alias("_beta"),
    )
    j = items.crossJoin(F.broadcast(prior))
    raw = F.col("k").cast("double") / F.col("n").cast("double")
    eb = F.when(
        F.col("_alpha").isNotNull(),
        (F.col("k").cast("double") + F.col("_alpha"))
        / (F.col("n").cast("double") + F.col("_alpha") + F.col("_beta")),
    ).otherwise(raw)
    return j.select(
        F.col("_i").alias(item_col),
        F.col("k").cast("long").alias("k"),
        F.col("n").cast("long").alias("n"),
        F.round(raw, 6).alias("rate_raw"),
        F.round(eb, 6).alias("rate_eb"),
        F.round(F.col("_alpha"), 6).alias("alpha"),
        F.round(F.col("_beta"), 6).alias("beta"),
    )


def sliding_distinct(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    id_col: str,
    window: int,
    step: int,
):
    """Exact distinct-entity counts per sliding window → one row per
    (group, window_start): (group, window_start, n_events,
    n_distinct) — "7-day active users, daily" and every other rolling
    reach metric, EXACT (the HLL sketch answers the same question
    approximately; this is the truth it is checked against).
    ``ts_col`` is an integer time (epoch units); windows are
    [window_start, window_start + window) at every multiple of
    ``step``; window must be a multiple of step (the tumbling
    decomposition below needs aligned edges — enforced).

    Scale shape — the standard explode-into-covering-windows
    decomposition: each event belongs to exactly window/step sliding
    windows, generated IN-ROW (one sequence, codegen) before ONE
    map-side-combined distinct + count aggregate keyed by (group,
    window_start). Row amplification is window/step — the price of
    exactness, stated (keep the ratio small: 7-day/1-day = ×7; for
    ×100s use the HLL partials instead). The count_distinct itself is
    Spark's two-phase partial-distinct aggregate — no per-window
    collection anywhere. All arithmetic integer-exact; the floor
    division is explicitly negative-safe (floordiv, not truncation),
    so pre-epoch timestamps bin correctly."""
    if window < 1 or step < 1 or window % step != 0:
        raise ValueError(f"window must be a positive multiple of step: {window}, {step}")
    k = window // step
    base = df.select(
        F.col(group_col).alias("_g"),
        F.col(ts_col).cast("long").alias("_t"),
        F.col(id_col).alias("_id"),
    ).filter(F.col("_t").isNotNull())
    # last window containing t starts at floor(t/step)*step; it is the
    # k-th of the k covering windows (earliest start = that - (k-1)*step)
    last_start = F.floor(F.col("_t") / F.lit(step)).cast("long") * F.lit(step)
    starts = F.sequence(
        last_start - F.lit((k - 1) * step), last_start, F.lit(step)
    )
    ex = base.select("_g", "_id", F.explode(starts).alias("window_start"))
    out = ex.groupBy("_g", "window_start").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("_id").alias("n_distinct"),
    )
    return out.select(
        F.col("_g").alias(group_col),
        F.col("window_start").cast("long").alias("window_start"),
        F.col("n_events").cast("long").alias("n_events"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
    )


def mde_readout(
    df: DataFrame,
    group_col: str,
    value_col: str,
    alpha_z: float = 1.959964,
    power_z: float = 0.841621,
):
    """Minimum-detectable-effect readout per arm-sizing question → one
    row per group: (group, n, mean, sd, mde_abs, mde_rel) — "how big
    a lift could this experiment even see": the classic two-sample
    formula MDE = (z_{α/2} + z_{power})·√(2σ²/n) evaluated at each
    group's OBSERVED n and variance (z defaults: two-sided 5%, 80%
    power — pass other quantiles for other designs; they are plain
    constants, so determinism is untouched). The pre-experiment
    sanity check every platform runs before burning two weeks of
    traffic on an undetectable effect.

    Exact int64 (n, Σx, Σx²) per group (NULL values dropped before
    counting), closed-form doubles in a pinned order, ROUND 6; NULL
    mde for degenerate groups (n < 2 or zero variance), NULL mde_rel
    additionally when the mean is 0. One map-side-combined groupBy;
    nothing else."""
    g = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(group_col).alias("_g"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast("long")).alias("sx"),
            F.sum(F.col(value_col).cast("long") * F.col(value_col).cast("long")).alias("sxx"),
        )
    )
    nd = F.col("n").cast("double")
    m = F.col("sx").cast("double") / nd
    var = F.when(
        F.col("n") > 1,
        (F.col("sxx").cast("double") - F.col("sx").cast("double") * m) / (nd - 1),
    )
    z = float(alpha_z) + float(power_z)
    mde = F.when(var > 0, F.lit(z) * F.sqrt(2 * var / nd))
    return g.select(
        F.col("_g").alias(group_col),
        F.col("n").cast("long").alias("n"),
        F.round(m, 6).alias("mean"),
        F.round(F.when(var.isNotNull(), F.sqrt(F.greatest(var, F.lit(0.0)))), 6).alias("sd"),
        F.round(mde, 6).alias("mde_abs"),
        F.round(F.when(mde.isNotNull() & (m != 0), mde / m), 6).alias("mde_rel"),
    )
