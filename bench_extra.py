"""Round-6 optimization harness (bench.py is FROZEN — this file holds the
extra instrumentation the optimization round needs):

- ``--plans [query ...]``: dump ``.explain("formatted")`` for headline
  queries to plans/r06/<query>_<tag>.txt (tag via --tag, default "before").
- ``--time [query ...]``: noop-sink isolated timing (guide §1.4), N trials
  each (--trials), warmup at sf0.001 first, per-query seconds to stdout.

Methodology identical to bench.py's run_suite (same session factory, same
warmup protocol) so numbers are comparable; this file is never used by the
driver's measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

from bench import HEADLINE, _force  # noqa: E402


def main() -> None:
    import __spark_entry__ as entry
    from osmflat_rs_spark.session import get_spark

    args = sys.argv[1:]
    tag = "before"
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        del args[i : i + 2]
    trials = 2
    if "--trials" in args:
        i = args.index("--trials")
        trials = int(args[i + 1])
        del args[i : i + 2]
    mode = args[0] if args else "--time"
    names = [a for a in args[1:] if not a.startswith("--")] or HEADLINE

    spark = get_spark("bench_extra", master=f"local[{CPUS}]", shuffle_partitions=max(8, CPUS))
    qs = entry.queries()

    if mode == "--plans":
        os.makedirs("plans/r06", exist_ok=True)
        for name in names:
            df = qs[name](spark, SF_DIR)
            p = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
            with open(f"plans/r06/{name}_{tag}.txt", "w") as f:
                f.write(p)
            print(f"wrote plans/r06/{name}_{tag}.txt ({len(p)} bytes)")
        spark.stop()
        return

    # --time: warmup (codegen/Python-fork) at sf0.001, then best/all-of-N
    for name in names:
        spark.sparkContext.setJobDescription(f"warmup {name}")
        _force(qs[name](spark, "/root/testdata/sf0.001"))
    out: dict[str, list[float]] = {}
    for _ in range(trials):
        for name in names:
            spark.sparkContext.setJobDescription(f"timed {name}")
            t0 = time.time()
            _force(qs[name](spark, SF_DIR))
            out.setdefault(name, []).append(round(time.time() - t0, 3))
    spark.stop()
    print(json.dumps({n: {"best": min(v), "samples": v} for n, v in out.items()}))


if __name__ == "__main__":
    main()
