from etl_sentinel_imagery_spark.plans.flagship import top_supplier_per_region  # noqa: F401
