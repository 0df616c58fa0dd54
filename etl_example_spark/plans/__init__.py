from etl_example_spark.plans.registry import QUERIES, Query, register

__all__ = ["QUERIES", "Query", "register"]
