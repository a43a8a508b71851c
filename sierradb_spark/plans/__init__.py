from sierradb_spark.plans.inspect import assert_plan, plan_features

__all__ = ["plan_features", "assert_plan"]
