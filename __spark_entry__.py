"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query smoke check at sf0.001.
queries()      — one entry per implemented operator (SURVEY.md §2 + the
                 training-data-pipeline extensions), (spark, sf_dir) → DataFrame.
oracle_sql()   — DuckDB-equivalent SQL per query (same column aliases; the
                 driver hash-compares values order-insensitively). Queries
                 whose semantics aren't SQL-expressible (xxhash64 sketches,
                 approximate ANN) are intentionally absent → rows-only check.

Query implementations live in storm_data_etl_spark/plans/ — this module is
just the registry façade.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Importing the plans modules populates the registry.
from storm_data_etl_spark.plans import queries as _q
from storm_data_etl_spark.plans import enrich_queries as _eq  # noqa: F401
from storm_data_etl_spark.plans import ml_queries as _mq  # noqa: F401
from storm_data_etl_spark.plans import window_queries as _wq  # noqa: F401
from storm_data_etl_spark.plans import lake_queries as _lq  # noqa: F401
from storm_data_etl_spark.plans import corpus_queries as _cq  # noqa: F401
from storm_data_etl_spark.plans import geo_queries as _gq  # noqa: F401

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the TPC-H-Q1-style pricing summary at sf0.001."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return _q.REGISTRY["pricing_summary"].runner(spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.runner for name, qd in _q.REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: qd.oracle for name, qd in _q.REGISTRY.items() if qd.oracle is not None
    }
