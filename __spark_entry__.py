"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship frontier-schedule query on sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the training-data pack (dedup / similarity / text
analysis / multimodal), each with a DuckDB oracle where the semantics
are SQL-expressible.  Implementation lives in ``crawler_spark/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crawler_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: retention filter -> seen anti-join -> politeness top-k."""
    return Q.q_frontier_schedule_sim(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLES)
