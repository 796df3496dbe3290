"""osmflat_rs_spark — a PySpark-native spatial-join + tiling engine.

A brand-new engine (NOT a port) with the query and data-processing
capabilities of the reference ``boxdot/osmflat-rs`` (see ``/root/reference``):
an OSM-style data model (nodes/ways/relations/tags) carried as interleaved
text+media documents, ingested into columnar tables, indexed with
hierarchical quadtree cell IDs (H3/S2-style), and queried with DataFrame
pipelines: tag predicates, FK joins, road-length aggregation, bounding
boxes, feature classification, raster/vector tiling — plus the north-rule
extensions: two-phase cell-cover point-in-polygon joins, kNN, web-mercator
tile assignment, dedup / text-analysis / ANN operators for training-data
pipelines.

Everything is expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst, vectorized Arrow/pandas UDFs only where built-ins genuinely
cannot express the semantics (never per-row Python).
"""

__version__ = "0.1.0"

from osmflat_rs_spark.session import get_spark  # noqa: F401
