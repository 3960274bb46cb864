from dataflowjavasdk_spark.functions import similarity, text  # noqa: F401
