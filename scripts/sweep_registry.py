"""Round-6 sweep: time EVERY __spark_entry__.queries() entry at a given SF
with the noop sink, one trial each, printing per-query seconds as they
finish so a hung/slow query is visible immediately.

Usage: python scripts/sweep_registry.py [sf_dir] [start_idx] [end_idx]
Writes results incrementally to /tmp/sweep_<sf>_<start>_<end>.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
START = int(sys.argv[2]) if len(sys.argv) > 2 else 0
END = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    import __spark_entry__ as entry
    from osmflat_rs_spark.session import get_spark

    spark = get_spark("sweep", master=f"local[{CPUS}]", shuffle_partitions=max(8, CPUS))
    qs = entry.queries()
    names = list(qs)[START:END]
    sf_tag = os.path.basename(SF_DIR.rstrip("/"))
    out_path = f"/tmp/sweep_{sf_tag}_{START}_{END}.jsonl"
    with open(out_path, "w") as f:
        for name in names:
            spark.sparkContext.setJobDescription(f"sweep {name}")
            t0 = time.time()
            err = None
            try:
                df = qs[name](spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
            except Exception as e:  # noqa: BLE001
                err = f"{type(e).__name__}: {e}"[:300]
            dt = round(time.time() - t0, 2)
            rec = {"name": name, "sec": dt, "err": err}
            f.write(json.dumps(rec) + "\n")
            f.flush()
            print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
