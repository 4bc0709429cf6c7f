from nexus_processor_spark.plans.layout import spread  # noqa: F401
