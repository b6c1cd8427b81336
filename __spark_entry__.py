"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The actual query library lives in ``dataset_crawler_spark/plans/queries.py``
(one entry per operator family from SURVEY.md §2 plus the training-data
pipeline ops); this module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dataset_crawler_spark.plans import queries as _QL  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H Q1-shaped pricing summary — full-scan + hash aggregate, the
    engine's bread-and-butter plan shape.
    """
    return _QL.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _QL.queries()


def oracle_sql() -> dict[str, str]:
    return _QL.oracle_sql()
