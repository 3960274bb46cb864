from dataflowjavasdk_spark.streaming import core, triggers  # noqa: F401
