"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship frontier-install pipeline at sf0.001;
``queries``/``oracle_sql`` expose every SQL-expressible operator from
SURVEY.md §2 plus the training-data pipeline family (dedup, similarity,
text analysis) as (Spark DataFrame, DuckDB SQL) pairs — see
the genesis_spark/queries/ package for the implementations.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from genesis_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    """
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each key in ``queries()``."""
    return dict(Q.ORACLES)
