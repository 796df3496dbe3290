"""As-of (most-recent-match) temporal join.

For every left row, attach the single right row with the same key whose
timestamp is the latest one ``<=`` the left timestamp (``direction=
"backward"``; ``"forward"`` is the mirror). This is the temporal analog
of the reference's id→index dictionary resolution (osmflatc/src/
ids.rs:96-158 resolves each way's node ids against the *latest* id
table state) applied to an ordered axis, and the standard event-
sessionization primitive ("which view preceded this purchase").

Scale design — why NOT a range join:
    left ⋈ right ON key AND r.ts <= l.ts   →  windowed max per left row
is a cartesian blow-up per key in Spark (every left row matches ALL
earlier right rows before the aggregate prunes them). Instead both
sides are union-tagged and sorted ONCE per key:

    union(left tagged 1, right tagged 0)
      → window last(right_payload, ignorenulls=True)
          over (partition by key order by ts, tag rows unbounded preceding)
      → filter tag = 1

One shuffle (the window's partitionBy), zero row amplification, and the
running "latest right payload" is a single O(1)-state window — the same
shape Spark plans for a sort-merge join's stream side, minus the join.
At 10^12 rows the cost is exactly one repartition by key; skewed keys
are bounded by per-key data volume, not by candidate-pair counts.

The right row's columns travel as ONE struct so ``last(ignorenulls)``
can never mix fields from different right rows when a payload field is
legitimately NULL (the struct is non-null per right row even when its
fields are null).

``allow_exact_matches`` (default True, i.e. ``<=``) is implemented in
the sort order alone: ties on ts order the right row before the left
row when equal timestamps should match, after it when they should not —
no extra pass, no inequality predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tolerance_us: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """→ left columns + ``<right_ts><suffix>`` + each of ``right_cols``
    renamed ``<col><suffix>`` (NULL when no right row qualifies — LEFT
    semantics, row count == left row count, always).

    ``right_cols`` defaults to every right column except the keys and
    timestamp. ``tolerance_us``: microseconds; matches farther than this
    from the left timestamp are nulled out (pandas ``merge_asof``
    tolerance semantics), applied AFTER the match — it bounds staleness,
    it does not fall back to an older/newer row.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]
    for c in right_cols:
        out_name = c + suffix
        if out_name in left.columns:
            raise ValueError(f"output column {out_name!r} collides with a left column")

    # one struct = one coherent right row under last(ignorenulls)
    payload = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c).alias(c) for c in right_cols]
    )
    # ts-tie ordering encodes the <=/< boundary (see module docstring)
    right_tag, left_tag = (0, 1) if allow_exact_matches else (1, 0)
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__evt_ts"),
        F.lit(right_tag).alias("__tag"),
        payload.alias("__r"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left.columns if c not in keys],
    )
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__evt_ts"),
        F.lit(left_tag).alias("__tag"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        *[F.col(c) for c in left.columns if c not in keys],
    )
    u = r.unionByName(l)

    # only the timestamp flips for "forward"; the tag stays ascending so
    # the tie rule (right visible at equal ts iff exact matches allowed)
    # is the same in both directions
    ts_ord = F.col("__evt_ts").desc() if direction == "forward" else F.col("__evt_ts").asc()
    order = [ts_ord, F.col("__tag").asc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w)).filter(
        F.col("__tag") == left_tag
    )

    m = F.col("__m")
    if tolerance_us is not None:
        # .cast("timestamp"): unix_micros rejects TIMESTAMP_NTZ (parquet's
        # default); the session is pinned UTC so the cast is an identity
        gap = F.unix_micros(F.col("__evt_ts").cast("timestamp")) - F.unix_micros(
            m["__ts"].cast("timestamp")
        )
        if direction == "forward":
            gap = -gap
        matched = matched.withColumn(
            "__m", F.when(m.isNotNull() & (gap <= F.lit(tolerance_us)), m)
        )
        m = F.col("__m")

    out_cols = [F.col(k) for k in keys]
    out_cols += [F.col(c) for c in left.columns if c not in keys]
    out_cols.append(m["__ts"].alias(right_ts + suffix))
    out_cols += [m[c].alias(c + suffix) for c in right_cols]
    return matched.select(*out_cols)


def interp_join(
    queries: DataFrame,
    series: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_col: str = "v",
) -> DataFrame:
    """Linear-interpolation temporal join — for every query row, the
    series value linearly interpolated between the bracketing fixes of
    the same key → query columns + (t_lo, v_lo, t_hi, v_hi, v_interp).
    The continuous complement of :func:`asof_join` (asof = step/hold
    interpolation); pandas/kdb's ``interpolate at times`` with LEFT
    semantics: row count == query count, always.

    Boundary contract: exact-timestamp hits return that fix (both
    brackets collapse onto it); queries before the first / after the
    last fix take the nearest side's value (flat extrapolation); keys
    with no fixes yield NULLs. v_interp = v_lo + (v_hi−v_lo)·(t−t_lo)/
    (t_hi−t_lo) over exact int64 microseconds and int64 values — one
    double ratio, one multiply, one add: deterministic IEEE, no
    rounding contract.

    Scale shape: ONE exchange. Both sides union-tag once (the asof_join
    trade — never the range join's per-key cartesian); the backward
    bracket is ``last(payload, ignorenulls)`` over RANGE(-∞, 0] and the
    forward one ``first(payload, ignorenulls)`` over RANGE[0, +∞) on
    the SAME partitioning and µs ordering, so Catalyst hosts both
    frames in a single Window over a single sort — range frames (not
    row frames) make equal-timestamp fixes visible to BOTH directions
    regardless of union tag order.
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = F.struct(
        F.unix_micros(F.col(right_ts).cast("timestamp")).alias("t"),
        F.col(value_col).cast("long").alias("v"),
    )
    r = series.select(
        *[F.col(k) for k in keys],
        F.unix_micros(F.col(right_ts).cast("timestamp")).alias("__t"),
        F.lit(0).alias("__tag"),
        payload.alias("__p"),
        *[
            F.lit(None).cast(dict(queries.dtypes)[c]).alias(c)
            for c in queries.columns
            if c not in keys
        ],
    )
    l = queries.select(
        *[F.col(k) for k in keys],
        F.unix_micros(F.col(left_ts).cast("timestamp")).alias("__t"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        *[F.col(c) for c in queries.columns if c not in keys],
    )
    u = r.unionByName(l)
    back = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc())
        .rangeBetween(Window.currentRow, Window.unboundedFollowing)
    )
    m = u.withColumn("__lo", F.last("__p", ignorenulls=True).over(back)).withColumn(
        "__hi", F.first("__p", ignorenulls=True).over(fwd)
    ).filter(F.col("__tag") == 1)
    lo, hi = F.col("__lo"), F.col("__hi")
    t = F.col("__t")
    ratio = (t - lo["t"]).cast("double") / (hi["t"] - lo["t"]).cast("double")
    interp = F.when(lo.isNull() & hi.isNull(), F.lit(None).cast("double")).otherwise(
        F.when(lo.isNull(), hi["v"].cast("double"))
        .when(hi.isNull(), lo["v"].cast("double"))
        .when(hi["t"] == lo["t"], lo["v"].cast("double"))
        .otherwise(lo["v"].cast("double") + (hi["v"] - lo["v"]).cast("double") * ratio)
    )
    return m.select(
        *[F.col(k) for k in keys],
        *[F.col(c) for c in queries.columns if c not in keys],
        lo["t"].alias("t_lo"),
        lo["v"].alias("v_lo"),
        hi["t"].alias("t_hi"),
        hi["v"].alias("v_hi"),
        interp.alias("v_interp"),
    )
