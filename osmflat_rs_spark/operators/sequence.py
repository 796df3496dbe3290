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
    results are deterministic and equal to the keyed-window form — the
    result types match the window ``SUM`` per input dtype: INTEGRAL delta
    columns widen to LONG with an exact int64 cumsum (an int32 delta
    stream whose running sum exceeds int32 used to crash the Arrow
    conversion while the keyed form returned the long sum), FLOAT/DOUBLE
    columns keep a DOUBLE float64 cumsum (ADVICE r03: the blanket int64
    widen silently truncated float deltas toward zero), and any other
    dtype raises — a decimal/string delta stream has no defined running
    sum here. NULL deltas contribute 0 so the running value carries
    forward at the null row, matching ``SUM OVER``'s null-skipping (the
    pandas cumsum default would poison the rest of the block with NaN)."""
    from pyspark.sql import types as T

    _INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    by_name = {f.name: f for f in df.schema.fields}
    for c in delta_cols:
        if not isinstance(by_name[c].dataType, _INTEGRAL + (T.FloatType, T.DoubleType)):
            raise TypeError(
                f"delta_decode_blocks: delta column {c!r} has type "
                f"{by_name[c].dataType.simpleString()}; only integral (→ exact int64 "
                f"running sum) and float/double (→ float64 running sum) are supported"
            )
    is_float = {c for c in delta_cols if isinstance(by_name[c].dataType, (T.FloatType, T.DoubleType))}
    schema = T.StructType(
        [
            T.StructField(
                f.name,
                (T.DoubleType() if f.name in is_float else T.LongType())
                if f.name in delta_cols
                else f.dataType,
                f.nullable,
            )
            for f in df.schema.fields
        ]
    )

    def decode(pdf):
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        for c in delta_cols:
            dt = "float64" if c in is_float else "int64"
            pdf[c] = pdf[c].fillna(0).astype(dt).cumsum()
        return pdf

    return df.groupBy(block_col).applyInPandas(decode, schema=schema)


def consecutive_pairs(df: DataFrame, key_cols: list[str], order_col: str, cols: list[str]) -> DataFrame:
    """zip(xs, xs.skip(1)) — lead() per column, last row dropped (W3,
    road-length.rs:80 tuple_windows). Next-row existence is tested on
    the (non-null by contract) ORDER column, not a value column — a
    NULL value in the next row is a legitimate pair member, not a
    sequence end (filtering on lead(value) silently dropped such
    pairs)."""
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    out = df.withColumn("_has_next", F.lead(order_col).over(w).isNotNull())
    for c in cols:
        out = out.withColumn(f"{c}_next", F.lead(c).over(w))
    return out.filter(F.col("_has_next")).drop("_has_next")


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
