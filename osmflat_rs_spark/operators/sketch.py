"""Mergeable frequency sketches as RELATIONAL state.

A count-min sketch (Cormode & Muthukrishnan 2005 — public algorithm) is
a depth×width counter matrix; here it is represented as a DataFrame of
(r, c, cnt) rows, which makes every sketch property a relational one:

- BUILD is one groupBy on (r, c) — map-side partial aggregation means
  each executor emits at most depth·width rows regardless of input size,
  so the exchange is O(partitions · depth · width), not O(rows): the
  textbook mergeable-summary shape, expressed as a plan Catalyst already
  knows how to run at 100 TB.
- MERGE of two sketches is union + re-aggregate (tested identical to
  building over the concatenated input).
- QUERY joins candidate keys' (r, c) probes against the sketch (the
  sketch side is depth·width rows — broadcast) and takes min(cnt) per
  key: the classic CM estimate, never an undercount.

Hashes are the engine-wide 60-bit md5 slice (seeded by the row index),
so a SQL oracle reproduces the sketch bit-for-bit — the driver gate
hash-checks ESTIMATES, not just bounds.

The reference has no sketch operators (absence verified — its
aggregations are exact folds, osmflat/examples/road-length.rs); this is
north-rule surface: approximate heavy hitters over unbounded key
domains where an exact groupBy's state would not fit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import md5_int60


def _probe(key_col, depth: int, width: int):
    """array<struct<r, c>> of the key's sketch coordinates (in-row)."""
    return F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                F.pmod(
                    md5_int60(F.concat(F.lit(f"{r}:"), F.col(key_col).cast("string"))),
                    F.lit(width),
                ).alias("c"),
            )
            for r in range(depth)
        ]
    )


def cms_build(df: DataFrame, key_col: str, depth: int = 4, width: int = 1024) -> DataFrame:
    """Count-min sketch of ``key_col`` frequencies → (r, c, cnt).

    One exchange, bounded at depth·width rows per map task by partial
    aggregation. depth rows per input row are generated IN-ROW (explode
    of a literal-indexed array — whole-stage codegen)."""
    if depth < 1 or width < 1:
        raise ValueError(f"depth and width must be >= 1, got {depth}x{width}")
    return (
        df.select(F.explode(_probe(key_col, depth, width)).alias("p"))
        .select(F.col("p.r").alias("r"), F.col("p.c").alias("c"))
        .groupBy("r", "c")
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge CM sketches built with the SAME (depth, width, hash family):
    union + re-sum. Counter-wise addition, the defining mergeability
    property of the summary."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("r", "c").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """CM point estimates for ``keys`` → (key_col, est).

    est = min over rows of the key's counters: ≥ true count always,
    ≤ true + ε·N with prob 1−δ (ε = e/width, δ = e^−depth). The sketch
    side is ≤ depth·width rows — broadcast; the probe side explodes
    depth rows per key in-row. Keys whose probes all land on untouched
    counters (cnt absent) estimate 0."""
    probes = keys.select(
        F.col(key_col), F.explode(_probe(key_col, depth, width)).alias("p")
    ).select(key_col, F.col("p.r").alias("r"), F.col("p.c").alias("c"))
    return (
        probes.join(F.broadcast(sketch), ["r", "c"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    min_fraction: float = 0.01,
) -> DataFrame:
    """Keys whose CM-estimated frequency is ≥ ``min_fraction`` of the
    stream length → (key_col, est). Candidates are the stream's distinct
    keys (exact candidate enumeration, sketched counting): the split
    matters at scale — the DISTINCT is one dedup shuffle of keys only,
    while the counting state stays depth·width. No false negatives
    (estimates never undercount); false positives bounded by ε·N."""
    sketch = cms_build(df, key_col, depth, width)
    n = df.select(F.count("*").alias("_n"))
    cand = df.select(key_col).distinct()
    est = cms_estimate(sketch, cand, key_col, depth, width)
    return (
        est.crossJoin(F.broadcast(n))
        .filter(F.col("est") >= F.col("_n") * F.lit(min_fraction))
        .select(key_col, "est")
    )


def approx_distinct(
    df: DataFrame, key_col: str, group_col: str | None = None, rsd: float = 0.02
) -> DataFrame:
    """HyperLogLog++ distinct-count (Spark's built-in JVM sketch agg;
    mergeable across partitions by construction). Thin, deliberately:
    the built-in IS the scale path. ``rsd`` is the target relative
    standard deviation (state grows as 1/rsd² — 2% ≈ 2.7k registers per
    group). Property-tested against exact counts; no SQL gate (HLL
    binaries are engine-specific by nature)."""
    agg = F.approx_count_distinct(key_col, rsd).alias("approx_n")
    if group_col is None:
        return df.agg(agg)
    return df.groupBy(group_col).agg(agg)


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — Bar-Yossef et al. 2002, the
# bottom-k estimator. Unlike HLL (whose register binary is engine-
# specific), KMV state is PORTABLE: the k smallest distinct hashes of
# the key domain — so a SQL oracle reproduces both the sketch and the
# estimate bit-for-bit.


def kmv_build(df: DataFrame, key_col: str, k: int = 64) -> DataFrame:
    """KMV distinct sketch of ``key_col`` → ≤ k rows of (h).

    Semantics: the k smallest DISTINCT 60-bit md5 hashes of the key
    domain (order- and partition-invariant). Scale shape: the hash is
    computed JVM-side (codegen md5), then ONE Arrow pass keeps the k
    smallest distinct per partition with O(k) state per task — the
    exchange that follows carries ≤ k rows per partition, NOT the
    distinct key domain (the whole point of a bottom-k summary; a
    groupBy-distinct here would cost the same shuffle as an exact
    COUNT DISTINCT). The final k-of-(k·P) cut is a TakeOrdered over a
    tiny set."""
    import numpy as np
    import pandas as pd

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")

    def _kmin_per_partition(batches):
        best = np.empty(0, dtype=np.int64)
        for pdf in batches:
            arr = pdf["h"].to_numpy(dtype=np.int64, copy=True)
            best = np.unique(np.concatenate([best, arr]))
            if best.size > k:
                best = best[:k]  # np.unique output is ascending
        yield pd.DataFrame({"h": best})

    hashes = df.select(md5_int60(F.col(key_col).cast("string")).alias("h"))
    local = hashes.mapInPandas(_kmin_per_partition, schema="h long")
    return local.distinct().orderBy("h").limit(k)


def kmv_merge(k: int, *sketches: DataFrame) -> DataFrame:
    """Merge KMV sketches built with the same hash family: union,
    dedup, keep the k smallest — exactly kmv_build over the
    concatenated inputs (tested)."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.distinct().orderBy("h").limit(k)


def kmv_estimate(sketch: DataFrame, k: int) -> DataFrame:
    """One row (n_h, est_distinct) from a KMV sketch.

    Fewer than k hashes means the domain was smaller than k — the count
    is exact. Otherwise est = (k−1)·2^60 / h_k (h_k = the largest kept
    hash), the classic unbiased bottom-k estimate with relative error
    ~1/√(k−2). All constants are exactly representable doubles and the
    expression is two IEEE ops, so DuckDB reproduces the rounded value
    bit-for-bit."""
    return sketch.agg(
        F.count("*").alias("n_h"), F.max("h").alias("_hmax")
    ).select(
        "n_h",
        F.round(
            F.when(F.col("n_h") < k, F.col("n_h").cast("double")).otherwise(
                F.lit(float(k - 1)) * F.lit(2.0**60) / F.col("_hmax").cast("double")
            ),
            3,
        ).alias("est_distinct"),
    )


# ---------------------------------------------------------------------------
# Equi-width histogram — the third mergeable RELATIONAL sketch (after CM
# and KMV): state is (bin, cnt) rows, so build is one bounded groupBy,
# merge is union + re-aggregate, and quantile estimation is plain
# windowed arithmetic a SQL oracle reproduces bit-for-bit (unlike
# t-digest/KLL register binaries).


def hist_build(
    df: DataFrame, value_col: str, lo: float, hi: float, bins: int = 256
) -> DataFrame:
    """Equi-width histogram of ``value_col`` over [lo, hi] → (bin, cnt).

    Bin = floor((v − lo)/w) with w = (hi − lo)/bins, clamped so v == hi
    lands in the last bin; values outside [lo, hi] and NULLs are dropped
    (the caller picks bounds — typically a first min/max pass). Map-side
    partial aggregation bounds the exchange at ``bins`` rows per task
    regardless of input size — the mergeable-summary shape."""
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    v = F.col(value_col).cast("double")
    w = (hi - lo) / bins
    b = F.least(F.lit(bins - 1), F.floor((v - F.lit(float(lo))) / F.lit(w)).cast("long"))
    return (
        df.filter(v.isNotNull() & (v >= lo) & (v <= hi))
        .select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("cnt"))
    )


def hist_merge(*hists: DataFrame) -> DataFrame:
    """Union + re-aggregate: identical to building over the
    concatenated inputs (same-bounds histograms only)."""
    if not hists:
        raise ValueError("need at least one histogram")
    out = hists[0]
    for h in hists[1:]:
        out = out.unionByName(h)
    return out.groupBy("bin").agg(F.sum("cnt").alias("cnt"))


def hist_quantiles(
    hist: DataFrame, quantiles: list[float], lo: float, hi: float, bins: int = 256
) -> DataFrame:
    """Estimated quantiles from an equi-width histogram → (q, est).

    For rank r = q·n: find the bin where the cumulative count first
    reaches r, then interpolate linearly inside it —
    est = lo + w·(bin + (r − cum_before)/cnt). Error is bounded by the
    bin width (exact if values are uniform within the bin). Every
    operation is IEEE double arithmetic on exactly-agreed inputs, so
    DuckDB reproduces the rounded estimates bit-for-bit. ``quantiles``
    must lie in (0, 1]."""
    from pyspark.sql import Window

    if not quantiles or not all(0.0 < q <= 1.0 for q in quantiles):
        raise ValueError(f"quantiles must be in (0, 1], got {quantiles}")
    w = (hi - lo) / bins
    win = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = hist.select(
        "bin",
        "cnt",
        F.sum("cnt").over(win).alias("cum"),
        (F.sum("cnt").over(win) - F.col("cnt")).alias("cum_before"),
    )
    total = hist.agg(F.sum("cnt").alias("n"))
    qs = F.explode(F.array(*[F.lit(float(q)) for q in quantiles])).alias("q")
    # the target bin: first with cum >= r (r = q·n); ties on exact bin
    # edges resolve to the earlier bin, matching the oracle's argmin
    scored = (
        cum.crossJoin(F.broadcast(total))
        .select("bin", "cnt", "cum", "cum_before", "n", qs)
        .filter(F.col("cum") >= F.col("q") * F.col("n"))
    )
    first = scored.groupBy("q").agg(F.min("bin").alias("bin"))
    est = (
        first.join(cum, "bin")
        .join(F.broadcast(total))
        .select(
            "q",
            F.round(
                F.lit(float(lo))
                + F.lit(w)
                * (
                    F.col("bin")
                    + (F.col("q") * F.col("n") - F.col("cum_before")) / F.col("cnt")
                ),
                6,
            ).alias("est"),
        )
    )
    return est


# ---------------------------------------------------------------------------
# Bloom filter — the fourth relational mergeable sketch: membership.
# State is the DISTINCT set-bit rows (≤ m_bits of them), so build is one
# bounded groupBy-distinct, merge is union+distinct (the bitwise OR),
# and probing is a broadcast join — all bit-reproducible in SQL, unlike
# an engine's packed bitmap. No false negatives by construction; the
# false-positive rate is the classic (1 − e^(−kn/m))^k.


def bloom_bits(key_col, m_bits: int, k: int):
    """array<long> of the key's k bit positions (in-row, codegen md5)."""
    return F.array(
        *[
            F.pmod(
                md5_int60(F.concat(F.lit(f"bf{i}:"), F.col(key_col).cast("string"))),
                F.lit(m_bits),
            )
            for i in range(k)
        ]
    )


def bloom_build(df: DataFrame, key_col: str, m_bits: int = 8192, k: int = 4) -> DataFrame:
    """Bloom filter of ``key_col`` → (bit,) distinct set-bit rows."""
    if m_bits < 2 or k < 1:
        raise ValueError(f"need m_bits >= 2 and k >= 1, got {m_bits}, {k}")
    return (
        df.select(F.explode(bloom_bits(key_col, m_bits, k)).alias("bit")).distinct()
    )


def bloom_merge(*sketches: DataFrame) -> DataFrame:
    """Union of set bits == the bitwise OR == build over concat (tested)."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.distinct()


def bloom_probe(
    sketch: DataFrame, keys: DataFrame, key_col: str, m_bits: int = 8192, k: int = 4
) -> DataFrame:
    """(key, maybe_present): true iff ALL k of the key's bits are set.

    The sketch side is ≤ m_bits rows — broadcast; the probe explode is
    in-row. Never a false negative (membership implies all bits set);
    semi-join pruning is the intended use: probe the big side against a
    small side's filter BEFORE the real join ships its payload."""
    probes = keys.select(
        F.col(key_col), F.explode(bloom_bits(key_col, m_bits, k)).alias("bit")
    )
    hit = probes.join(F.broadcast(sketch), "bit").groupBy(key_col).agg(
        F.count("*").alias("_hits")
    )
    return (
        keys.select(key_col)
        .distinct()
        .join(hit, key_col, "left")
        .select(
            key_col,
            (F.coalesce(F.col("_hits"), F.lit(0)) == k).alias("maybe_present"),
        )
    )


# ---------------------------------------------------------------------------
# Portable HyperLogLog (Flajolet et al. 2007) — the fifth relational
# mergeable sketch. `approx_distinct` above wraps Spark's JVM HLL++,
# whose register binary is engine-specific (stated there as the reason
# it has no SQL gate); THIS form keeps the registers as (bucket,
# rho_max) ROWS over the engine-wide md5 hash family, so build, merge,
# and even the harmonic-mean ESTIMATE are bit-reproducible in ANSI SQL.
#
# Integrality trick for the estimate: Σ 2^(−rho) is a float sum whose
# order Spark does not define — instead compute S = Σ 2^(RHO_CAP − rho)
# with rho clamped to RHO_CAP = 40: every term is an exact int64
# (≤ 2^40, m·2^40 ≪ 2^63), the per-group SUM is order-invariant integer
# arithmetic, and the final estimate α·m²·2^RHO_CAP / S is ONE exact-int
# division performed in IEEE double — bit-identical cross-engine. The
# clamp biases nothing below ~2^38 distinct keys (rho > 40 needs a
# 40-leading-zero hash; its unclamped term differs from the clamped one
# by < 1 in S, i.e. a relative error < 2^-40·m).

HLL_RHO_CAP = 40
# alpha_m for m = 256 (Flajolet's constant for m >= 128); exactly
# representable as the double literal both engines parse
HLL_ALPHA_256 = 0.7123045810054689


def hll_build(df: DataFrame, key_col: str, m: int = 256) -> DataFrame:
    """HLL registers of ``key_col`` → (bucket, rho) rows, rho = clamped
    position of the leading 1-bit in the 52-bit hash window (0-empty
    buckets simply absent — merge/estimate treat absence as rho 0).
    One map-side-combined groupBy bounded at m rows per task."""
    if m != 256:
        raise ValueError(f"this portable form pins m=256 (alpha constant), got {m}")
    h = md5_int60(F.col(key_col).cast("string"))
    bucket = h.bitwiseAND(F.lit(m - 1))
    w = F.shiftright(h, 8)  # high 52 bits (h is non-negative)
    # rho = 53 - bit_length(w) for w > 0 (bin() strips leading zeros in
    # BOTH engines); w == 0 means 52 leading zeros -> rho 53, clamped
    rho = F.when(w == 0, F.lit(HLL_RHO_CAP)).otherwise(
        F.least(F.lit(HLL_RHO_CAP), F.lit(53) - F.length(F.bin(w)))
    )
    return (
        df.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").cast("long").alias("rho"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Register-wise MAX == build over the concatenated inputs (tested)."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bucket").agg(F.max("rho").cast("long").alias("rho"))


def hll_estimate(sketch: DataFrame, m: int = 256) -> DataFrame:
    """One row (n_buckets, s_scaled, est) from HLL registers.

    S = Σ_buckets 2^(CAP − rho) with absent buckets contributing 2^CAP —
    exact int64, order-invariant. est = α·m²·2^CAP / S (raw Flajolet
    estimate), with the paper's SMALL-RANGE correction: when raw est
    ≤ 2.5·m and some bucket is empty, linear counting
    m·ln(m/(m−n_buckets)) replaces it (ln of a ratio of exact ints —
    one libm call, deterministic cross-engine at the 3-decimal round).
    No large-range correction (the 60-bit hash space makes collisions
    irrelevant below ~2^50 distinct). Rounded to 3 decimals."""
    if m != 256:
        raise ValueError(f"this portable form pins m=256, got {m}")
    agg = sketch.agg(
        F.count("*").cast("long").alias("n_buckets"),
        # shiftleft's Column-API bit count must be a Python int — the
        # variable shift goes through the SQL expression form
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), cast({HLL_RHO_CAP} - rho as int))"))
        .cast("long")
        .alias("_s_present"),
    )
    empty_term = F.shiftleft(F.lit(1).cast("long"), HLL_RHO_CAP)
    s_scaled = (F.col("_s_present") + (F.lit(m) - F.col("n_buckets")) * empty_term).cast("long")
    # numerator folded to ONE Python-computed double literal so the raw
    # estimate is a single IEEE division cross-engine
    raw = F.lit(HLL_ALPHA_256 * m * m * 2.0**HLL_RHO_CAP) / s_scaled.cast("double")
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / (F.lit(m) - F.col("n_buckets")).cast("double"))
    est = F.when((F.col("n_buckets") < m) & (raw <= 2.5 * m), lc).otherwise(raw)
    return agg.select(
        "n_buckets",
        s_scaled.alias("s_scaled"),
        F.round(est, 3).alias("est"),
    )


def kmv_set_ops(sk_a: DataFrame, sk_b: DataFrame, k: int) -> DataFrame:
    """One row (n_h, n_both, est_union, jaccard_est, est_intersection)
    from two KMV sketches built with the same hash family — the Beyer
    et al. 2007 (SIGMOD) bottom-k set-operation estimators: the merged
    bottom-k of A ∪ B estimates the union like any KMV sketch, the
    fraction ρ of those k hashes present in BOTH input sketches
    estimates Jaccard, and ρ·Û estimates the intersection. This is
    the point of sketch algebra at 100 TB: set sizes of arbitrary
    table combinations from k-row summaries, no rescan.

    Everything is determined by the ≤ k-row inputs: two broadcast
    semi-joins mark common hashes, one aggregate builds the counts,
    and the estimates are short IEEE trees (ROUND 3, the
    kmv_estimate contract). When the union kept fewer than k hashes
    the domain was smaller than k and ALL outputs are exact.
    """
    m = kmv_merge(k, sk_a.select("h"), sk_b.select("h"))
    both = (
        m.join(F.broadcast(sk_a.select("h")), "h", "semi")
        .join(F.broadcast(sk_b.select("h")), "h", "semi")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    a = m.agg(F.count(F.lit(1)).alias("n_h"), F.max("h").alias("_hmax"))
    j = a.crossJoin(F.broadcast(both))
    est_u = F.when(F.col("n_h") < k, F.col("n_h").cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(2.0**60) / F.col("_hmax").cast("double")
    )
    rho = F.col("n_both").cast("double") / F.col("n_h")
    return j.select(
        "n_h",
        "n_both",
        F.round(est_u, 3).alias("est_union"),
        F.round(rho, 6).alias("jaccard_est"),
        F.round(rho * est_u, 3).alias("est_intersection"),
    )


def bloom_pruned_join(
    big: DataFrame,
    small: DataFrame,
    key_col: str,
    m_bits: int = 8192,
    k: int = 4,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with a Bloom pre-filter on the BIG side — the classic
    shuffle-reduction pattern (Spark 3.2's runtime row-group filter /
    "bloom join", here as an explicit, engine-portable operator): the
    small side's keys compress into an m_bits bitmap that rides into a
    pure IN-ROW membership predicate on the big side, so non-matching
    rows drop AT THE SCAN (predicate is codegen bit arithmetic — no
    Python, no extra exchange) BEFORE the join ships any payload.
    Bloom filters have NO false negatives, so the result is
    bit-identical to the plain join — false positives only cost the
    real join a few extra probe rows.

    Scale shape: the bitmap is ≤ m_bits/64 int64 words collected once
    (driver-bounded by construction, independent of either table's
    size) and embedded as a LITERAL array — cheaper and
    pushdown-friendlier than bloom_probe's per-key explode+join, which
    exists for sketch algebra, not pruning. The join itself broadcasts
    the small side (that's what makes it small). With a selective
    small side the big table's shuffle/probe volume drops by the miss
    rate; size m_bits ≈ 10·|small keys| for ~1% false positives.
    """
    if m_bits % 64 != 0:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    # The Bloom pre-filter drops big-side rows with no small-side match
    # BEFORE the join, which is only sound when the big side is not the
    # preserved (or anti) side: 'left'/'full' would silently lose the
    # null-extended big rows and 'left_anti' would remove exactly the
    # rows it should keep (ADVICE r05). Reject instead of corrupting.
    safe = {"inner", "semi", "left_semi", "leftsemi", "right", "right_outer", "rightouter", "cross"}
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in safe}:
        raise ValueError(
            f"bloom_pruned_join: how={how!r} preserves unmatched big-side rows, "
            f"which the Bloom pre-filter on the big side would drop — use a plain "
            f"join for {how!r} (safe: inner/semi/left_semi/right)"
        )
    bits = [
        r["bit"]
        for r in bloom_build(small.select(key_col), key_col, m_bits, k).collect()
    ]
    words = [0] * (m_bits // 64)
    for b in bits:
        words[b // 64] |= 1 << (b % 64)
    as_i64 = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    wcol = F.array(*[F.lit(w).cast("long") for w in as_i64])
    pow2 = F.array(
        *[F.lit((1 << i) if i < 63 else -(1 << 63)).cast("long") for i in range(64)]
    )
    barr = bloom_bits(key_col, m_bits, k)
    member = F.forall(
        barr,
        lambda b: F.get(wcol, F.floor(b / 64).cast("int")).bitwiseAND(
            F.get(pow2, F.pmod(b, F.lit(64)).cast("int"))
        )
        != 0,
    )
    return big.filter(member).join(F.broadcast(small), key_col, how)


#: quarter-step decay table: floor(2^(-j/4) * 2^20) for j = 0..3 — the
#: fractional part of the bucketed exponential decay, shared verbatim
#: with the SQL oracle (all-integer, so no cross-engine pow()).
DECAY_T4 = (1048576, 881743, 741455, 623487)
_DECAY_SHIFT = 20


def trending_topk(
    df: DataFrame,
    group_col: str,
    item_col: str,
    age_col: str,
    n: int = 10,
    half_life: int = 1000,
    fp: int = 10**12,
    salt_buckets: int = 32,
) -> DataFrame:
    """Time-decayed top-n items per group → (group, item, n_events,
    score, rk) — "what's trending", the recency-weighted heavy-hitters
    readout (a plain count window forgets nothing; exponential decay
    demotes yesterday's spike automatically): each event contributes
    weight 2^(−age/half_life), summed per (group, item), top-n by
    decayed score.

    Determinism without pow(): the decay is BUCKETED exponential on
    quarter-half-life steps — k = (age·4) div half_life, weight_fp =
    (fp · DECAY_T4[k mod 4]) >> (k div 4) — pure int64 arithmetic
    (max relative step error 2^(1/4)−1 ≈ 19%, the declared
    granularity; raise the table size if you need finer). Every
    per-event weight is an exact integer, so the per-item sums are
    order-free and the SQL oracle reproduces them bit-for-bit.
    Ages must be ≥ 0 (negative ages raise via the domain guard);
    shifts past 62 decay to exactly 0.

    Scale shape: ONE map-side-combined groupBy to (group, item), then
    the skew-capped two-phase top-n (sampling._two_phase_top_n — a
    hot group is bounded at salt_buckets·n rows on the final
    reducer). score = score_fp / fp, ROUND 6."""
    from .sampling import _two_phase_top_n

    if n < 1 or half_life < 1 or fp < 10**6:
        raise ValueError(f"bad n/half_life/fp: {n}, {half_life}, {fp}")
    base = df.select(
        F.col(group_col).alias("_g"),
        F.col(item_col).alias("_it"),
        F.col(age_col).cast("long").alias("_age"),
    ).filter(F.col("_age").isNotNull())
    base = base.withColumn("_w", _decay_weight_expr(half_life, fp))
    neg = base.filter(F.col("_w").isNull()).limit(1).count()
    if neg:
        raise ValueError("trending_topk requires non-negative ages")
    g = base.groupBy("_g", "_it").agg(
        F.count(F.lit(1)).alias("n_events"), F.sum("_w").alias("_sfp")
    )
    top = _two_phase_top_n(
        g, ["_g"], [F.col("_sfp").desc(), F.col("_it").asc()], n, salt_buckets
    )
    return top.select(
        F.col("_g").alias(group_col),
        F.col("_it").alias(item_col),
        F.col("n_events").cast("long").alias("n_events"),
        F.round(F.col("_sfp").cast("double") / F.lit(float(fp)), 6).alias("score"),
        F.col("rk").cast("long").alias("rk"),
    )


def _decay_weight_expr(half_life: int, fp: int):
    """The all-integer bucketed-decay weight of column ``_age``:
    (fp · DECAY_T4[k mod 4]) div 2^(k div 4 + 20), k = (age·4) div
    half_life — NULL on negative age, exactly 0 past shift 62.
    Shared by the batch operator and the streaming partial builder
    (single source of truth, the cusum_kernel discipline)."""
    return F.expr(
        f"CASE WHEN _age < 0 THEN NULL "
        f"WHEN ((_age * 4) div {int(half_life)}L) div 4 > 42 THEN 0L "
        f"ELSE ({int(fp)}L * element_at(array({', '.join(str(t) for t in DECAY_T4)}), "
        f"CAST(pmod((_age * 4) div {int(half_life)}L, 4) AS INT) + 1)) "
        f"div shiftleft(1L, CAST(((_age * 4) div {int(half_life)}L) div 4 AS INT) + {_DECAY_SHIFT}) END"
    )


def decayed_count_partial(
    df: DataFrame,
    group_col: str,
    item_col: str,
    age_col: str,
    half_life: int = 1000,
    fp: int = 10**12,
) -> DataFrame:
    """One micro-batch's decayed-count partial → (group, item,
    n_events, score_fp) — the mergeable form of :func:`trending_topk`'s
    state: per-event weights are exact integers, so a partial is just
    their per-(group, item) sum and MERGE IS ADDITION. Feed this as
    ``build_fn`` to ``streaming.incremental.stream_sketch_partials``
    and the trending readout becomes an incrementally-maintained
    summary (exactly-once by per-batch-directory idempotence, no state
    store); read back with :func:`trending_topk_from_partials`.
    Negative ages yield NULL weights and raise at merge time via the
    batch operator's guard semantics (a streaming micro-batch cannot
    raise usefully — the partial keeps the NULL row so the reader
    fails loudly rather than undercounting silently)."""
    base = df.select(
        F.col(group_col).alias("_g"),
        F.col(item_col).alias("_it"),
        F.col(age_col).cast("long").alias("_age"),
    ).filter(F.col("_age").isNotNull())
    w = _decay_weight_expr(int(half_life), int(fp))
    return (
        base.withColumn("_w", w)
        .groupBy(F.col("_g").alias(group_col), F.col("_it").alias(item_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.coalesce(F.col("_w"), F.lit(0))).alias("score_fp"),
            F.sum(F.col("_w").isNull().cast("long")).alias("n_invalid"),
        )
    )


def trending_topk_from_partials(
    partials: DataFrame,
    group_col: str,
    item_col: str,
    n: int = 10,
    fp: int = 10**12,
    salt_buckets: int = 32,
) -> DataFrame:
    """Merge-on-read for :func:`decayed_count_partial` outputs →
    identical schema/semantics to :func:`trending_topk` (same
    tie-break, same ROUND): Σ the exact integer partials, two-phase
    top-n. Any ``n_invalid`` > 0 (negative-age rows upstream) fails
    loudly here — the batch operator's guard, deferred to read
    time."""
    from .sampling import _two_phase_top_n

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    bad = partials.filter(F.col("n_invalid") > 0).limit(1).count()
    if bad:
        raise ValueError("partials contain negative-age rows (n_invalid > 0)")
    g = partials.groupBy(
        F.col(group_col).alias("_g"), F.col(item_col).alias("_it")
    ).agg(F.sum("n_events").alias("n_events"), F.sum("score_fp").alias("_sfp"))
    top = _two_phase_top_n(
        g, ["_g"], [F.col("_sfp").desc(), F.col("_it").asc()], n, salt_buckets
    )
    return top.select(
        F.col("_g").alias(group_col),
        F.col("_it").alias(item_col),
        F.col("n_events").cast("long").alias("n_events"),
        F.round(F.col("_sfp").cast("double") / F.lit(float(fp)), 6).alias("score"),
        F.col("rk").cast("long").alias("rk"),
    )
