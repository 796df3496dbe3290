"""One parallelism level of the STANDALONE-CLUSTER scaling experiment
(VERDICT r02 #10) at the 4-CORE executor shape — the configuration used
for the 8->32-core shared-DRAM ceiling measurement in BENCH/BASELINE.md.
Thin wrapper over ``bench.run_cluster_worker`` (which defaults to the
1-core shape used for the bandwidth-fair 2->8 pair); the session config,
job selection, and JSON protocol live there, once.

Usage: python scripts/cluster_scaling_worker.py <master-url> <cores_max>
       [n_nodes]
Executor shape here: 4 cores / 3g heap / 4g off-heap; executor count =
cores_max / 4. Prints one JSON line (same shape as bench.run_spatial_job).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    master, cores_max = sys.argv[1], int(sys.argv[2])
    if len(sys.argv) > 3:
        os.environ["SPARK_GRAFT_SCALE_NODES"] = sys.argv[3]
    else:
        os.environ.setdefault("SPARK_GRAFT_SCALE_NODES", "32000000")
    from bench import run_cluster_worker

    out = run_cluster_worker(
        master, cores_max, "spatial", executor_cores=4, executor_memory="3g", offheap="4g"
    )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
