"""JDBC source: snapshot staging + FK introspection for live databases.

The reference holds one REPEATABLE READ connection so every table export
sees a single MVCC snapshot (xdump/postgresql.py:75-83). Spark-over-JDBC
opens a connection per partition per query, so a shared snapshot is
impossible mid-stream; the idiomatic equivalent implemented here is
STAGE-THEN-PLAN: materialize every source table once at t0 (to parquet or
cache) and run the closure from the staged snapshot (SURVEY.md §1.4).

Requires a reachable database plus its JDBC driver jar on the Spark
classpath — neither exists in this container, so this module is exercised
only up to option assembly in tests; the read/write calls are standard
``spark.read.jdbc`` / ``DataFrameWriter.jdbc``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from xdump_spark.catalog import Catalog, ForeignKey

# The reference's one-shot FK-catalog query (xdump/postgresql.py:19-62),
# reusable through JDBC's query pushdown.
PG_FOREIGN_KEYS_QUERY = """
SELECT tc.constraint_name AS name,
       tc.table_name      AS table,
       kcu.column_name    AS column,
       ccu.table_name     AS foreign_table,
       ccu.column_name    AS foreign_column
FROM information_schema.table_constraints tc
JOIN information_schema.key_column_usage kcu
  ON tc.constraint_name = kcu.constraint_name
JOIN information_schema.constraint_column_usage ccu
  ON ccu.constraint_name = tc.constraint_name
WHERE tc.constraint_type = 'FOREIGN KEY'
"""


def jdbc_options(url: str, user: str | None = None, password: str | None = None,
                 driver: str | None = None) -> dict[str, str]:
    """Connection properties; password falls back to $PGPASSWORD like the
    reference's PostgreSQL backend (xdump/postgresql.py:85-89)."""
    props = {"url": url}
    if user:
        props["user"] = user
    pw = password or os.environ.get("PGPASSWORD")
    if pw:
        props["password"] = pw
    if driver:
        props["driver"] = driver
    return props


def read_table(spark: SparkSession, options: dict[str, str], table: str,
               partition_column: str | None = None, num_partitions: int = 16,
               lower_bound: int | None = None, upper_bound: int | None = None) -> DataFrame:
    """Read one table; with ``partition_column`` the scan is split into
    ``num_partitions`` key ranges read in parallel. Spark requires explicit
    bounds for a partitioned JDBC read — when not given, they are probed
    with one tiny min/max query first (the probe is O(1) with an index on
    the key, which a referenced/PK column has)."""
    reader = spark.read.format("jdbc").options(**options).option("dbtable", table)
    if partition_column:
        if lower_bound is None or upper_bound is None:
            probe = (
                spark.read.format("jdbc")
                .options(**options)
                .option(
                    "query",
                    f"SELECT min({partition_column}) AS mn, "
                    f"max({partition_column}) AS mx FROM {table}",
                )
                .load()
                .first()
            )
            lower_bound = probe["mn"] if lower_bound is None else lower_bound
            upper_bound = probe["mx"] if upper_bound is None else upper_bound
        if lower_bound is None or upper_bound is None:   # empty table
            return reader.load()
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def introspect_foreign_keys(spark: SparkSession, options: dict[str, str]) -> list[ForeignKey]:
    df = (
        spark.read.format("jdbc")
        .options(**options)
        .option("query", PG_FOREIGN_KEYS_QUERY)
        .load()
    )
    return [
        ForeignKey(r["table"], r["column"], r["foreign_table"], r["foreign_column"], r["name"])
        for r in df.collect()
    ]


def stage_catalog(catalog: Catalog, stage_dir: str) -> Catalog:
    """Materialize every table of a catalog to parquet at t0 and return a
    new Catalog over the staged (immutable) copies — the snapshot-
    consistency answer for ANY mutable source (the reference pins one
    REPEATABLE READ / BEGIN IMMEDIATE transaction instead,
    xdump/postgresql.py:75-83, xdump/sqlite.py:63-65; proven by its
    mid-dump-insert test, tests/test_backend.py:111-127). Mutations to
    the original source after staging are invisible to the dump."""
    dfs: dict[str, DataFrame] = {}
    for t, df in catalog.tables.items():
        df.write.mode("overwrite").parquet(os.path.join(stage_dir, t))
        dfs[t] = df.sparkSession.read.parquet(os.path.join(stage_dir, t))
    return Catalog(dfs, catalog.foreign_keys, primary_keys=catalog.primary_keys)


def stage_snapshot(
    spark: SparkSession,
    options: dict[str, str],
    tables: list[str],
    stage_dir: str,
    fks: list[ForeignKey] | None = None,
) -> Catalog:
    """JDBC form of ``stage_catalog``: read all tables at t0 and stage."""
    dfs = {t: read_table(spark, options, t) for t in tables}
    return stage_catalog(Catalog(dfs, fks or []), stage_dir)
