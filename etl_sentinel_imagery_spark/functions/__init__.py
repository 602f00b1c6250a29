from etl_sentinel_imagery_spark.functions.exact import dec, dsum, money  # noqa: F401
