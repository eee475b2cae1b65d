"""Bucketed tables: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a repeated equi-join (fact-to-fact, or
load-order FK validation) is re-shuffling both sides on every run. Spark's
bucketing writes each table pre-hash-partitioned on the join key
(``bucketBy`` + ``saveAsTable``): two tables bucketed on the same key with
the same bucket count join WITHOUT any Exchange — each task zips bucket i
with bucket i straight off storage. This module wraps that pattern for the
engine's catalogs.

The reference delegates physical layout entirely to the host database
(indexes, heap order — xdump has no layout control at all); bucketing is
the Spark-native analog of "the DBA indexed the FK columns".

Notes that matter at scale:
* bucket count is fixed at write time — size it so one bucket of the
  LARGER table fits an executor core's working memory (rule of thumb:
  total_bytes / bucket_count ≈ 100-500 MB).
* both sides must be bucketed on the same column set and count; a
  mismatch silently falls back to a shuffle (assert with
  ``is_shuffle_free_join`` in tests).
* ``spark.sql.sources.bucketing.enabled`` is on by default; AQE leaves
  bucketed joins alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str] | str,
    n_buckets: int = 32,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed managed table (parquet).

    ``sort_cols`` additionally sorts within buckets (turns merge joins into
    linear zips and helps min/max skipping)."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *cols)
    if sort_cols is not None:
        s = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*s)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata comes from the
    catalog, so this MUST go through ``spark.table``, not ``read.parquet``
    — a raw path read loses the bucket spec and re-shuffles)."""
    return spark.table(table_name)


def is_shuffle_free_join(joined: DataFrame) -> bool:
    """True when the physical plan of ``joined`` contains no SHUFFLE
    exchange — the property bucketing is supposed to buy. A
    BroadcastExchange does not count (broadcasting moves no partitioned
    data and is how Catalyst handles a small side regardless of layout).
    Meant for tests/assertions after composing a bucketed join."""
    import re

    plan = joined._jdf.queryExecution().executedPlan().toString()
    # ReusedExchange re-prints a broadcast subtree; neither it nor
    # BroadcastExchange moves partitioned data.
    return not re.search(r"(?<!Broadcast)(?<!Reused)Exchange", plan)
