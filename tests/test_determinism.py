"""Partition-count invariance: gate entries must produce IDENTICAL
values under different shuffle-partition settings — the local stand-in
for "same answer on 4 cores and 1000 executors". This is the property
the decimal money-sum policy (queries._msum) exists to guarantee; a
plain double sum rounded to cents fails it at scale (round-4 soak
finding)."""

import pytest

from xdump_spark import queries as Q

SF_DIR = "/root/testdata/sf0.01"

# Entries with float aggregates (the hazard class) + one exact-integer
# entry as a control. Kept small: each runs twice.
ENTRIES = [
    "tpch_q1",
    "tpch_q7_volume",
    "events_hourly",
    "corpus_mixture",
    "curation_doc_signals",
    "xd_table_counts",
]


def rows_set(df):
    return frozenset(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", ENTRIES)
def test_same_values_under_different_partitioning(spark, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = rows_set(Q.queries()[name](spark, SF_DIR))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = rows_set(Q.queries()[name](spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b, f"{name}: values depend on shuffle partitioning"
    assert len(a) > 0
