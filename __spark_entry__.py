"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship main-content-extraction query on
sf0.001; ``queries()`` / ``oracle_sql()`` expose the operator battery
from SURVEY.md §2 (relational dataflow ops, text analysis, dedup,
similarity search, and the tl-parity extraction kernel). DuckDB-checked
where ANSI-SQL can express the op; rows-only otherwise (the extraction
kernel's real correctness gate is tests/test_goldens.py — byte-parity
with the compiled reference on 774 documents).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import tl_spark.queries as _Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: HTML-wrap sf0.001 documents, run the Arrow-batch
    extraction kernel (boilerplate strip + spans), return the result."""
    return _Q.extract_documents(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _Q.queries()


def oracle_sql() -> dict[str, str]:
    return _Q.oracle_sql()
