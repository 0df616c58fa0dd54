from etl_example_spark.sources.loaders import load_tables, load_table

__all__ = ["load_tables", "load_table"]
