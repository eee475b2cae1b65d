"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship FK-closure dump scenario on sf0.001;
``queries``/``oracle_sql`` expose every implemented operator from
SURVEY.md §2 with DuckDB oracles (see xdump_spark/queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import xdump_spark.queries as Q
from xdump_spark.catalog import load_sf_dir
from xdump_spark.planner.closure import compute_closure


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: partial-dump closure seeded with the 2 most recent orders
    on /root/testdata/sf0.001 — the reference's EMPLOYEES_SQL scenario
    (reference: tests/conftest.py:14-29) on TPC-H-shaped data. Returns the
    per-table selection summary."""
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    cat = load_sf_dir(spark, "/root/testdata/sf0.001")
    seed = cat.tables["orders"].orderBy(F.desc("o_orderkey")).limit(2)
    out = compute_closure(cat, (), {"orders": seed})
    rows = [(name, out[name].count()) for name in sorted(out)]
    return spark.createDataFrame(rows, "table_name string, n_rows long")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
