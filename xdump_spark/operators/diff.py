"""Corpus snapshot diff: what changed between two versions of a table.

A 100 TB corpus is rebuilt, re-filtered, and re-deduped across releases;
before shipping v(N+1) the owner needs the delta against vN — which
documents were added, which removed, which rewrote in place — without
ever shuffling the text itself. This is the dataset-release analog of
the reference's dump/load diffing workflow (the reference compares
relational snapshots by re-dumping; here the snapshots are too big to
re-read twice, so we compare fingerprints).

Scale design: each side reduces to (id, h1, h2) — two independently
seeded 64-bit xxhash64 fingerprints over the compare columns (a
128-bit pair; collisions are ~zero at any real scale, same contract as
``cleaning.dedup_lines``). The text never shuffles. The join is a
full-outer on the id — the natural hash partitioning, AQE-skew-safe,
and co-located for free when both snapshots are bucketed stores.

Output keeps only the delta (added / removed / changed); unchanged rows
— the overwhelming majority at scale — are filtered out before anything
leaves the join stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fingerprint(df: DataFrame, id_col: str, compare_cols: list[str]) -> DataFrame:
    """(id, h1, h2): two independently seeded 64-bit fingerprints over
    the compare columns. Each column is hashed under its own pair of
    seeds and the per-column hashes are combined, so NULL in one column
    cannot alias a value in a neighbor (multi-arg xxhash64 skips NULL
    args — hashing columns jointly would make (NULL, 'a') collide with
    ('a', NULL))."""
    h1_parts = [
        F.xxhash64(F.lit(2 * i + 1), F.col(c)) for i, c in enumerate(compare_cols)
    ]
    h2_parts = [
        F.xxhash64(F.lit(-2 * i - 2), F.col(c)) for i, c in enumerate(compare_cols)
    ]
    return df.select(
        F.col(id_col).alias("_id"),
        F.xxhash64(*h1_parts).alias("_h1"),
        F.xxhash64(*h2_parts).alias("_h2"),
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Delta between two snapshots keyed by ``id_col``.

    Returns (id_col, status) with status ∈ {'added', 'removed',
    'changed'}; ids present in both snapshots with equal compare-column
    fingerprints (the bulk of any release) are dropped inside the join
    stage. ``compare_cols`` defaults to every shared non-id column.

    Ids are assumed unique per snapshot (a corpus primary key); if a
    side carries duplicates the full-outer join fans out exactly like
    the underlying SQL would.
    """
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns) and c != id_col]
        compare_cols = shared
    o = _fingerprint(old, id_col, compare_cols)
    n = _fingerprint(new, id_col, compare_cols)
    joined = o.alias("o").join(
        n.alias("n"), F.col("o._id") == F.col("n._id"), "full_outer"
    )
    status = (
        F.when(F.col("n._id").isNull(), F.lit("removed"))
        .when(F.col("o._id").isNull(), F.lit("added"))
        .when(
            (F.col("o._h1") != F.col("n._h1")) | (F.col("o._h2") != F.col("n._h2")),
            F.lit("changed"),
        )
    )
    return (
        joined.select(
            F.coalesce(F.col("o._id"), F.col("n._id")).alias(id_col),
            status.alias("status"),
        )
        .filter(F.col("status").isNotNull())
    )


def diff_summary(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """(status, n) counts of the delta — the release-notes number."""
    return (
        corpus_diff(old, new, id_col=id_col, compare_cols=compare_cols)
        .groupBy("status")
        .agg(F.count("*").alias("n"))
    )
