"""One parallelism level of the STANDALONE-CLUSTER scaling experiment
(VERDICT r02 #10): run the primary spatial job against a real
multi-executor Spark standalone cluster (separate master/worker/executor
JVMs, real network-less shuffle) with small per-executor heaps +
off-heap, so executor count — not thread count inside one JVM — is the
parallelism axis.

Usage: python scripts/cluster_scaling_worker.py <master-url> <cores_max>
       [n_nodes]
Executor shape is fixed at 4 cores / 3g heap / 4g off-heap; executor
count = cores_max / 4. Prints one JSON line (same shape as
bench.run_spatial_job)."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    master, cores_max = sys.argv[1], int(sys.argv[2])
    n_nodes = int(sys.argv[3]) if len(sys.argv) > 3 else 32_000_000
    from osmflat_rs_spark.session import get_spark

    spark = get_spark(
        "cluster-scaling",
        master=master,
        shuffle_partitions=max(8, 2 * cores_max),
        extra_conf={
            "spark.cores.max": str(cores_max),
            "spark.executor.cores": "4",
            "spark.executor.memory": "3g",
            "spark.memory.offHeap.enabled": "true",
            "spark.memory.offHeap.size": "4g",
            "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
        },
    )
    from bench import run_spatial_job

    out = run_spatial_job(spark, cores_max, n_nodes)
    out["executors"] = cores_max // 4
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
