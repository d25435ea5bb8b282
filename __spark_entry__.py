"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship BM25 top-k over the sf0.001 documents
table; ``queries()``/``oracle_sql()`` expose one entry per implemented
operator family from SURVEY.md §2 with DuckDB-SQL twins (see
``modern_search_engines_spark/contract.py`` for the implementations and
the cross-engine hash-equality rules).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from modern_search_engines_spark import contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: BM25 top-k retrieval."""
    return contract.q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(contract.QUERIES)


def oracle_sql() -> dict[str, str]:
    return contract.oracle_sql()
