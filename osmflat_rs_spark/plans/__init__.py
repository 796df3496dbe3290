from osmflat_rs_spark.plans.indexing import assign_dense_index  # noqa: F401
