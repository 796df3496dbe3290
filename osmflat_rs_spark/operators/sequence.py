"""Sequence operators: delta decode (running sum), consecutive pairs,
gcd reduce — the W1/W3/A5 family of SURVEY §2.

The reference delta-decodes id/lat/lon streams per PBF block with a
running += (osmflatc/src/main.rs:188-207) and folds a gcd over block
granularities (main.rs:579-616). Delta coding is block-local there, so
the scalable Spark form is partition-local cumulative sums via a
vectorized Arrow batch op (np.cumsum), with a cross-partition offset fix
— the same two-pass composition as dense index assignment. A window
variant is provided for the general keyed case.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def delta_decode_keyed(
    df: DataFrame, key_cols: list[str], order_col: str, delta_cols: list[str]
) -> DataFrame:
    """Running sum of ``delta_cols`` within each key group in order —
    ``sum() OVER (PARTITION BY key ORDER BY order ROWS UNBOUNDED
    PRECEDING)`` (SURVEY W1). Shuffles once on the key."""
    w = Window.partitionBy(*key_cols).orderBy(order_col).rowsBetween(Window.unboundedPreceding, 0)
    out = df
    for c in delta_cols:
        out = out.withColumn(c, F.sum(c).over(w))
    return out


def delta_decode_blocks(
    df: DataFrame, block_col: str, order_cols: list[str], delta_cols: list[str]
) -> DataFrame:
    """Block-local VECTORIZED delta decode — the reference's actual shape:
    osmflatc decodes id/lat/lon delta streams per PBF block with a running
    ``+=`` (osmflatc/src/main.rs:188-207). Here: ``groupBy(block)`` +
    ``applyInPandas`` with ``np.cumsum`` per block — ONE shuffle on the
    block key, one Arrow batch + one vectorized cumsum per block (no
    per-row window machinery; SURVEY §2.5 W1's promised form, the
    ``delta_decode_keyed`` window variant remains for the general case).

    Ordering inside a block follows ``order_cols`` (stable sort), so
    results are deterministic and equal to the keyed-window form."""
    schema = df.schema

    def decode(pdf):
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        for c in delta_cols:
            pdf[c] = pdf[c].cumsum()
        return pdf

    return df.groupBy(block_col).applyInPandas(decode, schema=schema)


def consecutive_pairs(df: DataFrame, key_cols: list[str], order_col: str, cols: list[str]) -> DataFrame:
    """zip(xs, xs.skip(1)) — lead() per column, last row dropped (W3,
    road-length.rs:80 tuple_windows)."""
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    out = df
    for c in cols:
        out = out.withColumn(f"{c}_next", F.lead(c).over(w))
    return out.filter(F.col(f"{cols[0]}_next").isNotNull())


def gcd_reduce(df: DataFrame, col: str) -> int:
    """gcd fold over a column (A5/F6, main.rs:579-616). Distinct values
    first (distributed agg) — the fold itself runs driver-side over the
    (tiny) distinct set, like the reference's fold over per-block
    granularities."""
    vals = [r[0] for r in df.select(col).distinct().collect()]
    g = 0
    for v in vals:
        if v is not None:
            g = math.gcd(g, int(v))
    return g
