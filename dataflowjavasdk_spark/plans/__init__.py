from dataflowjavasdk_spark.plans.audit import PlanAudit, audit  # noqa: F401
