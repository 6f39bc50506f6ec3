"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query; ``queries()`` /``oracle_sql()``
expose every implemented operator plan from SURVEY.md §2 (plus the
training-data-pipeline extensions) for the DuckDB differential check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from audios_to_dataset_spark.plans import all_oracles, all_queries
from audios_to_dataset_spark.plans.relational import q_join_inner

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: revenue per nation
    (customer ⋈ orders ⋈ broadcast(nation) → groupBy → agg)."""
    return q_join_inner(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator plan (SURVEY.md §2)."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted entries get
    the driver's weaker rows-only check)."""
    return all_oracles()
