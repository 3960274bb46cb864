from dataflowjavasdk_spark.queries.registry import all_oracles, all_queries, get, query

__all__ = ["all_oracles", "all_queries", "get", "query"]
