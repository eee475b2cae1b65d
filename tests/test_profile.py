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


def test_profile_quantiles_match_duckdb(spark):
    """Requested quantiles appear per numeric column and, at sketch
    accuracy 10000 over 500 rows, equal DuckDB's exact lower-rank
    quantile (percentile_approx returns an actual data value at rank
    error <= 1/accuracy, i.e. exact here)."""
    import duckdb

    from xdump_spark.operators.profile import profile_table

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    prof = profile_table(docs, columns=["n_chars"], quantiles=(0.25, 0.5, 0.75))
    got = {r.metric: r.value for r in prof.collect() if r.metric.startswith("p")}
    assert set(got) == {"p25", "p50", "p75"}
    con = duckdb.connect()
    for pct, m in [(0.25, "p25"), (0.5, "p50"), (0.75, "p75")]:
        want = con.execute(
            f"SELECT quantile_disc(n_chars, {pct}) FROM read_parquet('{sf}/documents.parquet')"
        ).fetchone()[0]
        assert got[m] == float(want), (m, got[m], want)


def test_profile_single_job_with_quantiles(spark):
    """Quantiles must not add extra scan passes: still one aggregation."""
    from xdump_spark.operators.profile import profile_table

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        profile_table(docs, quantiles=(0.5,))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan parquet") == 1
