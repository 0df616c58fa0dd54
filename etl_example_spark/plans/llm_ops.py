"""LLM-training-data pipeline operators as registered queries.

Deduplication, similarity search, and text analysis over the synthetic
``documents`` / ``embeddings`` tables (TESTDATA.md). Implementations live
in etl_example_spark.operators.{dedup,similarity,text}; this module
registers the oracle-checked query surface.
"""

from __future__ import annotations
