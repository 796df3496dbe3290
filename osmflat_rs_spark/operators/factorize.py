"""Distributed matrix-factorization half-step (ALS item solve).

The recommender-system trainer pattern, expressed the way kriging and
the IVF trainer already are in this engine: REDUCE THE CORPUS TO EXACT
SUFFICIENT STATISTICS, THEN BATCH THE SMALL DENSE SOLVES through one
Arrow pass. One alternating-least-squares half-step solves, for every
item i with ratings r_ui,

    (Uᵢᵀ Uᵢ + λ n_i I) · x_i = Uᵢᵀ r_i

where Uᵢ stacks the factors of the users who rated i. The engine-side
insight is that Uᵢᵀ Uᵢ (k×k) and Uᵢᵀ r_i (k) are SUMS over rating
rows — so the 10^12-row ratings table collapses in ONE map-side-combined
groupBy(item) to k(k+1)/2 + k + 1 integer columns per item, and the
dense k×k solves run over the items×45-column reduced table (k = 8) in
a single vectorized NumPy batch. No per-item shuffle, no iterative
driver loop per item, nothing row-scale leaves the first aggregate.

Determinism: user factors are a PURE FUNCTION of the user id (the
engine-wide md5 hash mapped onto a ±1 fixed-point lattice) — no user
table exists, no join materializes them, retried tasks regenerate
identical values. All sufficient statistics are exact int64 sums of
lattice products (contract: n_ratings_per_item · fp² < 2^63 — shrink
``fp`` for extreme item popularity), so the float solve consumes
bit-identical inputs in any partition order. The solve itself is
LAPACK float64 (platform-deterministic; parity pinned against a direct
NumPy model in tests — a SQL oracle cannot restate a dense solve, so
the driver gate is rows-only, same status as kriging).

Reference anchor: no reference analog (osmflat has no trainer
surface); training-data-pipeline operator per SURVEY §2.9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import md5_int60


def user_factor_exprs(user_col: str, k: int, seed: str, fp: int) -> list:
    """The k deterministic lattice factor components of a user id:
    a_d = (md5_60(seed:d:uid) mod (2·fp+1)) − fp ∈ [−fp, fp] (exact
    ints; the float factor is a_d / fp). Pure codegen — 8 md5 calls
    per row at k = 8; precompute into a bucketed table if the same
    factors feed many steps."""
    span = 2 * fp + 1
    return [
        (
            F.pmod(
                md5_int60(
                    F.concat(
                        F.lit(f"{seed}:{d}:"), F.col(user_col).cast("string")
                    )
                ),
                F.lit(span),
            )
            - F.lit(fp)
        ).alias(f"_a{d}")
        for d in range(k)
    ]


def als_item_step(
    ratings: DataFrame,
    user_col: str,
    item_col: str,
    rating_col: str,
    k: int = 8,
    reg: float = 0.1,
    seed: str = "als",
    fp: int = 10**6,
) -> DataFrame:
    """One ALS item half-step → (item, n_ratings, factors:array<double>)
    — solves the per-item ridge normal equations against the
    hash-seeded user factors (module docstring). ``reg`` is the
    standard per-observation λ (weighted-λ ALS, Zhou et al. 2008:
    the ridge term scales with n_i so popular items aren't
    under-regularized). Factor values ROUND 6.
    """
    if k < 1 or k > 32:
        raise ValueError(f"k must be in [1, 32], got {k}")
    if fp < 10 or reg <= 0:
        # reg = 0 makes A = U^T U exactly singular for items with fewer
        # than k ratings, and np.linalg.solve then kills the whole Arrow
        # batch (r5c review finding) — the ridge floor is mandatory
        raise ValueError(f"fp must be >= 10 and reg > 0: {fp}, {reg}")
    base = ratings.select(
        F.col(item_col).alias("_i"),
        F.col(rating_col).cast("long").alias("_r"),
        *user_factor_exprs(user_col, k, seed, fp),
    ).filter(F.col("_r").isNotNull())
    aggs = [F.count(F.lit(1)).alias("n")]
    for a in range(k):
        for b in range(a, k):
            aggs.append(F.sum(F.col(f"_a{a}") * F.col(f"_a{b}")).alias(f"s_{a}_{b}"))
        aggs.append(F.sum(F.col(f"_a{a}") * F.col("_r")).alias(f"b_{a}"))
    g = base.groupBy("_i").agg(*aggs)

    fp2 = float(fp) * float(fp)
    fpf = float(fp)
    reg_f = float(reg)
    kk = k
    out_schema = f"item {ratings.schema[item_col].dataType.simpleString()}, n_ratings long, factors array<double>"

    def solve(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            m = len(pdf)
            if m == 0:
                continue
            A = np.zeros((m, kk, kk))
            bv = np.zeros((m, kk))
            for a in range(kk):
                for b in range(a, kk):
                    col = pdf[f"s_{a}_{b}"].to_numpy(dtype=np.float64) / fp2
                    A[:, a, b] = col
                    A[:, b, a] = col
                bv[:, a] = pdf[f"b_{a}"].to_numpy(dtype=np.float64) / fpf
            n = pdf["n"].to_numpy(dtype=np.float64)
            A += (reg_f * n)[:, None, None] * np.eye(kk)[None, :, :]
            x = np.linalg.solve(A, bv)
            yield pd.DataFrame(
                {
                    "item": pdf["_i"],
                    "n_ratings": pdf["n"].astype("int64"),
                    "factors": [list(np.round(row, 6)) for row in x],
                }
            )

    return g.mapInPandas(solve, schema=out_schema)
