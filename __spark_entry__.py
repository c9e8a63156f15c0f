"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` exposes
every implemented operator from SURVEY.md §2 (plus the training-data-pipeline
operators); ``oracle_sql()`` gives the DuckDB-equivalent SQL for each.
Implementations live in ``spark_on_hbase_spark/inventory.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_on_hbase_spark.inventory import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return QUERIES["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.sql for name, spec in QUERIES.items() if spec.sql is not None}


def env_info() -> dict[str, str]:
    """Engine fingerprint for divergence forensics (VERDICT r9 item 6): if
    a grading run's hashes ever disagree with the local mirror again, this
    sidecar pins WHICH duckdb/pyspark/python evaluated each side. The
    driver contract does not require it; check_oracle.py logs the same
    fields as an ENVINFO line per run."""
    import platform

    import duckdb
    import pyspark

    return {
        "duckdb": duckdb.__version__,
        "pyspark": pyspark.__version__,
        "python": platform.python_version(),
    }
