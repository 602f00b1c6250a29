"""etl_sentinel_imagery_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ETL pipeline (solo2307/etl-sentinel-imagery), re-expressed
Spark-first: DataFrame / Spark SQL for the relational layer (Catalyst does
pushdown, pruning, join selection), Arrow-vectorized pandas UDFs for the
geometry and raster kernels, and Structured Streaming for event analytics.

Layout:
    session     SparkSession factory tuned for deterministic oracle parity
    sources     table loaders, catalog/AOI fixture generators, geo readers
    functions   scalar function layer (product parsing, attrs, geometry,
                text, vectors)
    operators   dataflow operators (selection, dedup, similarity, text
                stats, raster kernels)
    plans       composed pipelines (flagship query, acquisition plan)
    streaming   Structured Streaming event analytics
    queries     the named query battery exposed through __spark_entry__
"""

__version__ = "0.1.0"

from etl_sentinel_imagery_spark.session import get_spark  # noqa: F401
