"""Driver-mimic: run every __spark_entry__.queries() entry on Spark and its
oracle_sql() twin on DuckDB at the given SF, compare row count + schema +
order-insensitive values. Usage: python scripts/check_oracle.py [sf_dir] [names...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_val(v):
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return v
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return v


def rows_of(recs, cols):
    out = [tuple(norm_val(r[c]) for c in cols) for r in recs]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from osmflat_rs_spark.session import get_spark

    spark = get_spark("check_oracle", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entry.queries()
    osql = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srecs = [r.asDict() for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL-spark] {name}: {str(e)[:300]}")
            continue
        if name not in osql:
            print(f"[rows-only] {name}: {len(srecs)} rows")
            continue
        try:
            ores = con.sql(osql[name])
            ocols = ores.columns
            # Driver-hash faithfulness probe (r2 postmortem): the driver's
            # value hash is type-sensitive, and DuckDB silently widens —
            # window SUM(BIGINT) -> HUGEINT, AVG/decimal math -> DECIMAL —
            # where Spark stays BIGINT/DOUBLE. Python fetch masks this
            # (both arrive as int), so flag it at the DuckDB type level.
            widened = [
                (c, str(t)) for c, t in zip(ores.columns, ores.types)
                if any(k in str(t).upper() for k in ("HUGEINT", "INT128", "DECIMAL"))
            ]
            if widened:
                failures.append((name, f"oracle type widened (driver hash risk): {widened}"))
                print(f"[FAIL-oracle-type] {name}: {widened} — add CAST(... AS BIGINT/DOUBLE)")
                continue
            orecs = [dict(zip(ocols, row)) for row in ores.fetchall()]
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"[FAIL-duckdb] {name}: {str(e)[:300]}")
            continue
        if sorted(scols) != sorted(ocols):
            failures.append((name, f"schema: {sorted(scols)} vs {sorted(ocols)}"))
            print(f"[FAIL-schema] {name}: {sorted(scols)} vs {sorted(ocols)}")
            continue
        cols = sorted(scols)
        s_rows = rows_of(srecs, cols)
        o_rows = rows_of(orecs, cols)
        if len(s_rows) != len(o_rows):
            failures.append((name, f"count: {len(s_rows)} vs {len(o_rows)}"))
            print(f"[FAIL-count] {name}: spark {len(s_rows)} vs duckdb {len(o_rows)}")
            continue
        bad = [(a, b) for a, b in zip(s_rows, o_rows) if a != b]
        if bad:
            failures.append((name, f"{len(bad)} value mismatches; first: {bad[:2]}"))
            print(f"[FAIL-values] {name}: {len(bad)}/{len(s_rows)} rows differ; first: {bad[:2]}")
        else:
            print(f"[OK] {name}: {len(s_rows)} rows match")
    print(f"\n{len(failures)} failures")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
