"""Two-parallelism scaling worker for the r5-continuation inference
family (Poisson bootstrap + permutation test + jackknife + Welch) over
a deterministic synthetic metrics table. Run at two cpu counts on the
SAME input; the BASELINE.json criterion is throughput efficiency >= 0.8
at N -> 4N. Checksums printed so both legs prove identical answers.

Usage: python scripts/inference_scaling_worker.py <cpus> <rows>
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from osmflat_rs_spark import get_spark
from osmflat_rs_spark.operators.sessions import (
    jackknife_ratio,
    permutation_test,
    poisson_bootstrap,
    welch_t,
)

cpus = int(sys.argv[1])
n = int(sys.argv[2])
spark = get_spark(
    "inference_scaling", master=f"local[{cpus}]", shuffle_partitions=max(8, cpus * 4)
)
# deterministic synthetic A/B metrics: id, arm (hash split), int value
df = spark.range(n).select(
    F.col("id"),
    F.when(F.pmod(F.xxhash64(F.col("id") * 7 + 1), F.lit(2)) == 0, F.lit("a"))
    .otherwise(F.lit("b"))
    .alias("arm"),
    F.pmod(F.xxhash64(F.col("id") * 13 + 5), F.lit(1000)).alias("v"),
    F.pmod(F.col("id"), F.lit(256)).alias("bucket"),
).persist()
df.count()
t0 = time.time()
w = welch_t(df, "arm", "v", "a", "b").collect()[0]
j = jackknife_ratio(df, "arm", "bucket", "v", "v").agg(F.sum("n_used")).collect()[0][0]
b = poisson_bootstrap(df, "arm", "id", "v", replicates=50).agg(
    F.sum("replicates")
).collect()[0][0]
p = permutation_test(df, "id", "arm", "v", "a", "b", n_perm=50).collect()[0]
dt = time.time() - t0
chk = f"{w['n_a']}_{w['n_b']}_{j}_{b}_{p['n_ge']}"
print(f"RESULT cpus={cpus} n={n} sec={dt:.2f} rows_per_sec={n/dt:.0f} chk={chk}")
