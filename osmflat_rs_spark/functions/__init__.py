from osmflat_rs_spark.functions import cells, geo, pip  # noqa: F401
