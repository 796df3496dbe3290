"""Deterministic sampling operators for training-data pipelines.

Sampling at 100 TB has two non-negotiables this module encodes:

1. **Determinism** — sample membership must be a pure function of the
   data (re-runs, retried tasks, and different partition layouts must
   agree), so randomness comes from the engine-wide seeded 60-bit md5
   hash, never from an RNG. That also makes every sampler
   SQL-oracle-reproducible.
2. **Skew safety** — "top-n per group" is a window sort of each whole
   group on one reducer; a hot group (one language, one domain) becomes
   the job's tail. Both samplers therefore run TWO-PHASE: a salted
   window keeps n per (group, salt) bucket first, so the final
   per-group window sees at most salt_buckets·n rows regardless of
   group size. Exactness is preserved (the global top-n is a subset of
   every salted bucket's top-n) and the oracle stays the plain
   single-window form.

The reference has no sampling surface (absence verified: osmflat's
examples enumerate exhaustively); this is training-data-pipeline
surface per SURVEY §2.9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import md5_int60

#: hash-space size as an exactly-representable double (2^60)
_HSPACE = 2.0**60


def _two_phase_top_n(df: DataFrame, part_cols, order_cols, n: int, salt_buckets: int):
    """Exact top-n per partition group, skew-capped.

    Phase 1 (skipped when salt_buckets <= 1): row_number within
    (group, xxhash64-salt) keeps ≤ n per bucket — each reducer sorts at
    most |group|/salt_buckets rows. Phase 2 ranks the ≤ salt_buckets·n
    survivors. Identical output to the single-window form because any
    row in the true top-n is also in the top-n of whichever bucket it
    landed in."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if salt_buckets > 1:
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
        w1 = Window.partitionBy(*part_cols, salt).orderBy(*order_cols)
        df = df.withColumn("_rk1", F.row_number().over(w1)).filter(F.col("_rk1") <= n).drop("_rk1")
    w2 = Window.partitionBy(*part_cols).orderBy(*order_cols)
    return df.withColumn("rk", F.row_number().over(w2)).filter(F.col("rk") <= n)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    n_per_group: int,
    salt_buckets: int = 32,
) -> DataFrame:
    """Exactly ``n_per_group`` rows per stratum (fewer if the stratum is
    smaller), chosen by hash order → (group, id, rk).

    Membership = the n smallest md5_int60('strat:' || id) per group: a
    uniform deterministic draw, invariant to row order and partitioning.
    """
    h = md5_int60(F.concat(F.lit("strat:"), F.col(id_col).cast("string")))
    slim = df.select(F.col(group_col), F.col(id_col)).withColumn("_h", h)
    out = _two_phase_top_n(
        slim,
        [group_col],
        [F.col("_h").asc(), F.col(id_col).asc()],
        n_per_group,
        salt_buckets,
    )
    return out.select(group_col, id_col, "rk")


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col,
    n: int,
    group_col: str | None = None,
    salt_buckets: int = 32,
) -> DataFrame:
    """Weighted sample WITHOUT replacement of size ``n`` (per group when
    ``group_col`` is given) → (group?, id, rk).

    Efraimidis–Spirakis A-ES (2006): each row draws u ∈ (0, 1] and is
    ranked by u^(1/w) descending; the top n are EXACTLY a weighted
    draw without replacement. u is deterministic —
    (md5_int60('ws:' || id) + 1) / 2^60 — and the rank key is the
    monotone-equivalent ln(u)/w (avoids pow's extra rounding). Rows
    with NULL or non-positive weight are excluded (never sampled), the
    standard contract. ``weight_col`` may be a column name or Column
    expression."""
    wcol = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = (md5_int60(F.concat(F.lit("ws:"), F.col(id_col).cast("string"))) + 1) / F.lit(_HSPACE)
    key = F.log(u) / wcol.cast("double")
    part = [group_col] if group_col is not None else [F.lit(1)]
    cols = ([F.col(group_col)] if group_col is not None else []) + [F.col(id_col)]
    slim = df.filter(wcol.isNotNull() & (wcol > 0)).select(*cols, key.alias("_key"))
    out = _two_phase_top_n(
        slim, part, [F.col("_key").desc(), F.col(id_col).asc()], n, salt_buckets
    )
    keep = ([group_col] if group_col is not None else []) + [id_col, "rk"]
    return out.select(*keep)


def temperature_mix(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    total: int,
    alpha: float = 0.5,
    quant: int = 1_000_000,
) -> DataFrame:
    """Temperature-scaled domain mixing — the multi-corpus rebalancing
    step of LLM data pipelines (GPT-3/PaLM style): domain d's share of a
    ``total``-doc budget is n_d^alpha / SUM_e n_e^alpha (alpha < 1
    flattens the mixture toward small domains; alpha = 1 is natural
    sampling), realized by DETERMINISTIC hash acceptance so the whole
    decision is a pure column expression.

    -> (id, domain, n_domain, budget, keep): every doc, its domain size,
    the domain's doc budget, and the keep decision. Realized keep counts
    are within O(sqrt(budget)) of budget (Bernoulli by deterministic
    hash u — the standard trade of rate-based sampling; exact-budget
    selection per domain is ``weighted_sample``'s top-n machinery).

    Exactness: n_d^alpha is quantized to the 1/``quant`` int64 lattice
    (w_d = floor(n_d^alpha * quant + 0.5); for alpha = 0.5 the power is
    the IEEE correctly-rounded sqrt, so w_d is engine-portable —
    arbitrary alpha uses libm pow, documented as potentially last-ulp
    divergent cross-engine), the normalizer W = SUM(w_d) is an EXACT
    integer sum, budgets come from one int->double division chain
    (exact while total * w_d < 2^53), and acceptance compares the
    shared-contract md5 u against budget/n_d — every engine computing
    the same integers computes the same keeps, no rounding cliff
    anywhere.

    Scale shape: ONE map-side-combined count per domain (|domains|
    rows), a broadcast of the |domains|-row rate table back onto the
    corpus, and a codegen filter expression — the corpus itself never
    shuffles and nothing is corpus-wide on the driver.
    """
    if total < 0:
        raise ValueError(f"total must be >= 0, got {total}")
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    from osmflat_rs_spark.operators.dedup import md5_int60

    nd = F.col("n_domain").cast("double")
    powed = F.sqrt(nd) if alpha == 0.5 else F.pow(nd, F.lit(float(alpha)))
    counts = (
        df.groupBy(domain_col)
        .agg(F.count(F.lit(1)).alias("n_domain"))
        .withColumn("_w", F.floor(powed * quant + F.lit(0.5)).cast("long"))
    )
    # The normalizer derives from `counts` itself; alias both sides so the
    # self-lineage crossJoin doesn't leave `_w` ambiguous to the analyzer.
    tot = counts.agg(F.sum("_w").alias("_W")).alias("t")
    rates = counts.alias("c").crossJoin(F.broadcast(tot)).select(
        F.col(f"c.{domain_col}").alias(domain_col),
        F.col("c.n_domain").alias("n_domain"),
        F.floor(
            F.lit(float(total))
            * F.col("c._w").cast("double")
            / F.col("t._W").cast("double")
            + F.lit(0.5)
        )
        .cast("long")
        .alias("budget"),
    )
    u = (md5_int60(F.concat(F.lit("tm:"), F.col(id_col).cast("string"))) + 1) / F.lit(
        _HSPACE
    )
    return df.select(id_col, domain_col).join(F.broadcast(rates), domain_col).select(
        F.col(id_col),
        F.col(domain_col),
        "n_domain",
        "budget",
        (u < F.col("budget").cast("double") / F.col("n_domain").cast("double")).alias(
            "keep"
        ),
    )


def hrw_shard(df: DataFrame, id_col: str, n_shards: int) -> DataFrame:
    """Rendezvous (highest-random-weight) sharding — the consistent
    assignment a distributed writer/cache layer wants: each key goes to
    argmax_s hash(key, s) over the shard set, so REMOVING a shard remaps
    ONLY the keys that lived on it (every other key's argmax is
    untouched) and ADDING one steals ~1/(n+1) of each shard — no global
    reshuffle, unlike ``pmod(hash, n)`` where changing n remaps almost
    everything. → (id, shard, weight).

    Scale shape: ZERO shuffle, pure whole-stage-codegen — the per-shard
    weights are an in-row literal struct array, the winner is ONE
    ``array_max`` (Spark orders structs lexicographically: weight first,
    shard as the deterministic tie-break). n_shards is bounded by the
    in-row array (fine through thousands; a 10^6-shard ring wants a
    different algorithm). The weight is the shared 60-bit md5 integer
    contract (``dedup.md5_int60``), so any ANSI engine reproduces the
    assignment bit-for-bit."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    key = F.col(id_col).cast("string")
    arr = F.array(
        *[
            F.struct(
                md5_int60(F.concat(key, F.lit(f":{s}"))).alias("weight"),
                F.lit(s).cast("long").alias("shard"),
            )
            for s in range(int(n_shards))
        ]
    )
    best = F.array_max(arr)
    return df.select(F.col(id_col), best["shard"].alias("shard"), best["weight"].alias("weight"))
