import sys, time
sys.path.insert(0, "/root/repo")
from osmflat_rs_spark import get_spark
from pyspark.sql import functions as F
from osmflat_rs_spark.operators.textops import lexical_diversity, zipf_slope, dsir_importance

cpus = int(sys.argv[1]); n = int(sys.argv[2])
spark = get_spark("corpus_scaling", master=f"local[{cpus}]", shuffle_partitions=max(8, cpus * 4))
# deterministic synthetic corpus: ~30 hash-drawn tokens per doc, 3 langs
toks = F.transform(
    F.sequence(F.lit(1), F.lit(30)),
    lambda i: F.concat(F.lit("w"), F.pmod(F.xxhash64(F.col("id") * 31 + i), F.lit(5000)).cast("string")),
)
docs = spark.range(n).select(
    F.col("id").alias("doc_id"),
    F.concat(F.lit("l"), F.pmod(F.col("id"), F.lit(3)).cast("string")).alias("lang"),
    F.array_join(toks, " ").alias("text"),
).persist()
docs.count()
t0 = time.time()
a = lexical_diversity(docs, "doc_id", "text").agg(F.sum("n_types")).collect()[0][0]
b = zipf_slope(docs, "text", "lang", top_r=128).count()
c = dsir_importance(docs, "doc_id", "text", F.col("lang") == "l0", dim=4096).agg(F.sum("n_feats")).collect()[0][0]
dt = time.time() - t0
print(f"RESULT cpus={cpus} n={n} sec={dt:.2f} docs_per_sec={n/dt:.0f} chk={a}_{b}_{c}")
