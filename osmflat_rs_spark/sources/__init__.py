from osmflat_rs_spark.sources.catalog import SnapshotCatalog  # noqa: F401
