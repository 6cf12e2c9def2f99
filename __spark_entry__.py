"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship main-content extraction on the sf0.001
synthetic words table; ``queries()``/``oracle_sql()`` expose every
implemented SURVEY.md §2 operator with DuckDB-checkable oracles (see
pdf_plumber_util_spark/contract.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end main-content extraction (words -> lines ->
    blocks -> boundaries -> body text per url) on sf0.001."""
    from pdf_plumber_util_spark.contract import q_body_text

    return q_body_text(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pdf_plumber_util_spark.contract import QUERIES
    from pdf_plumber_util_spark.contract_extra import EXTRA_QUERIES

    return {**QUERIES, **EXTRA_QUERIES}


def oracle_sql() -> dict[str, str]:
    from pdf_plumber_util_spark.contract import ORACLES
    from pdf_plumber_util_spark.contract_extra import EXTRA_ORACLES

    return {**ORACLES, **EXTRA_ORACLES}
