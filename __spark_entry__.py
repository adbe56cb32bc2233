"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the full rollup cascade (raw → 1m → 1h) over the
events stream at sf0.001, returning the 1h tier.

``queries()`` / ``oracle_sql()`` — the operator registry lives in
tods_spark/queries.py; every SQL-expressible operator has a DuckDB twin with
identically-aliased columns and 4-decimal rounding on float aggregates.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from tods_spark.queries import QUERIES

    return QUERIES["rollup_1h_cascade"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from tods_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from tods_spark.queries import ORACLES

    return dict(ORACLES)
