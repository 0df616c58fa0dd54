"""etl_example_spark — a PySpark-native analytics engine.

A from-scratch reimplementation of the *capabilities* of the reference ETL
job ``LuisDGJ/etl-example`` (see /root/reference, SURVEY.md) on Apache Spark:

- declarative DataFrame/SQL query layer (Catalyst-optimized),
- curation operators (schema repair, quality filtering, backup-then-remove),
- SQL-script sources and parquet sinks,
- plus large-scale training-data-pipeline extensions: deduplication
  (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
  similarity search, text analysis, multimodal column plumbing, and
  structured streaming.

Everything is designed for a multi-executor cluster at 100 TB scale
(broadcast dims, partial aggregation, partition pruning, AQE) while being
tested locally on small scale factors.
"""

from etl_example_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
