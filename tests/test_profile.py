"""profile_table tests: cross-checked against DuckDB recomputation over
the same driver-testdata parquet (the pytest-level analog of the
registry's oracle gate — the registry's 50-entry window is full)."""

import math
import os

import duckdb
import pytest

from xdump_spark.operators.profile import profile_table

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def _spark_profile(spark, table, columns):
    df = spark.read.parquet(f"{SF_DIR}/{table}.parquet")
    out = profile_table(df, columns=columns, exact_distinct=True)
    return {(r.column, r.metric): r.value for r in out.collect()}


def test_orders_profile_matches_duckdb(spark):
    got = _spark_profile(spark, "orders", ["o_orderkey", "o_totalprice", "o_orderstatus"])
    con = duckdb.connect()
    want = con.execute(
        f"""
        SELECT count(o_orderkey), count(DISTINCT o_orderkey),
               min(o_orderkey), max(o_orderkey), avg(o_totalprice),
               stddev_samp(o_totalprice),
               count(*) - count(o_orderstatus), count(DISTINCT o_orderstatus)
        FROM read_parquet('{SF_DIR}/orders.parquet')
        """
    ).fetchone()
    assert got[("o_orderkey", "count")] == want[0]
    assert got[("o_orderkey", "distinct")] == want[1]
    assert got[("o_orderkey", "min")] == want[2]
    assert got[("o_orderkey", "max")] == want[3]
    assert got[("o_totalprice", "mean")] == pytest.approx(want[4], rel=1e-9)
    assert got[("o_totalprice", "stddev")] == pytest.approx(want[5], rel=1e-9)
    assert got[("o_orderstatus", "nulls")] == want[6]
    assert got[("o_orderstatus", "distinct")] == want[7]
    # non-numeric columns carry no min/max rows
    assert ("o_orderstatus", "min") not in got


def test_profile_nulls_and_approx(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 4.0), (None, 9.0)], "a int, b double"
    )
    got = {(r.column, r.metric): r.value for r in profile_table(df).collect()}
    assert got[("a", "count")] == 3 and got[("a", "nulls")] == 1
    assert got[("b", "count")] == 3 and got[("b", "nulls")] == 1
    assert got[("b", "min")] == 1.0 and got[("b", "max")] == 9.0
    # HLL on 3 values is exact in practice
    assert got[("a", "distinct")] == 3
    assert not math.isnan(got[("b", "stddev")])


def test_profile_single_agg_job(spark):
    """The whole profile must be ONE aggregation over ONE scan —
    per-column jobs would read the table N times."""
    df = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    plan = (
        profile_table(df, ["o_orderkey", "o_totalprice"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1


def test_profile_unknown_column(spark):
    df = spark.range(3)
    with pytest.raises(ValueError, match="unknown columns"):
        profile_table(df, ["nope"])
