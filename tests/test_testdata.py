"""Smoke tests against the REAL driver testdata (/root/testdata).

Round-3 regression net: every other fixture in this suite is synthetic, so
a driver-side testdata schema drift (events.ts int64-ns → timestamp[us])
reached the correctness gate unseen and zeroed all 50 entries. These tests
read the actual parquet the driver grades against.
"""

import os

import pytest
from pyspark.sql import functions as F

from xdump_spark.catalog import (
    TPCH_TABLES,
    Catalog,
    LazyTables,
    load_sf_dir,
    read_events,
)

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


# Columns the engine's queries/oracles actually reference, per table: a
# driver-side rename/retype of any of these must fail HERE with a named
# table, not as dozens of opaque oracle errors (round-3 lesson, where the
# events.ts drift surfaced as 50 unrelated failures).
EXPECTED_COLUMNS = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_regionkey", "n_name"},
    "customer": {"c_custkey", "c_nationkey"},
    "supplier": {"s_suppkey", "s_nationkey"},
    "part": {"p_partkey", "p_type", "p_brand", "p_size"},
    "orders": {"o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"},
    "lineitem": {
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_shipdate", "l_returnflag",
    },
    "events": {"event_id", "ts", "user_id", "event_type", "value", "ts_ns"},
    "documents": {"doc_id", "text", "lang", "source", "n_chars"},
    "embeddings": {"vec_id", "embedding"},
}


def test_every_table_loads_and_has_rows(spark):
    cat = load_sf_dir(spark, SF_DIR)
    assert set(TPCH_TABLES) <= set(cat.tables)
    for name in TPCH_TABLES:
        # .first() touches real data (schema resolution + one row decoded).
        assert cat.tables[name].first() is not None, name
        missing = EXPECTED_COLUMNS[name] - set(cat.tables[name].columns)
        assert not missing, f"{name}: driver testdata dropped/renamed {sorted(missing)}"


def test_events_ts_contract(spark):
    """read_events must expose ts TIMESTAMP + ts_ns LONG on the real data;
    ts must equal ts_ns truncated to microseconds."""
    ev = read_events(spark, SF_DIR)
    dtypes = dict(ev.dtypes)
    assert dtypes["ts"] == "timestamp"
    assert dtypes["ts_ns"] == "bigint"
    bad = ev.filter(F.unix_micros("ts") != F.expr("ts_ns div 1000")).count()
    assert bad == 0
    # Sanity: timestamps land in the generator's range, not 1970.
    years = ev.select(F.year("ts").alias("y")).agg(F.min("y"), F.max("y")).first()
    assert years[0] >= 2000, years


def test_broken_table_does_not_poison_catalog(spark, tmp_path):
    """Lazy catalog isolation: a broken events source fails only queries
    that read events (round-3 blast-radius fix)."""
    # A directory with a valid region but a garbage events.parquet.
    d = str(tmp_path / "sf")
    os.makedirs(d)
    spark.read.parquet(f"{SF_DIR}/region.parquet").write.parquet(f"{d}/region.parquet")
    with open(f"{d}/events.parquet", "wb") as f:
        f.write(b"not a parquet file")
    cat = load_sf_dir(spark, d, tables=["region", "events"])
    # region works even though events is broken...
    assert cat.tables["region"].count() == 5
    # ...and events fails loudly on its own access.
    with pytest.raises(Exception):
        cat.tables["events"].first()


def test_unsupported_ts_dtype_fails_at_reader(spark, tmp_path):
    """The ts contract is enforced at read_events with a clear message,
    not as cryptic downstream analysis errors."""
    d = str(tmp_path / "sf2")
    os.makedirs(d)
    spark.range(3).select(
        F.col("id").alias("event_id"), F.lit("x").cast("string").alias("ts")
    ).write.parquet(f"{d}/events.parquet")
    with pytest.raises(ValueError, match="unsupported ts dtype"):
        read_events(spark, d)


def test_int64_ns_layout_still_supported(spark, tmp_path):
    """Older int64-nanosecond layout (tools/make_soak_sf1.py output) keeps
    working through the same reader."""
    d = str(tmp_path / "sf3")
    os.makedirs(d)
    src = read_events(spark, SF_DIR).limit(100)
    src.select(
        "event_id", F.col("ts_ns").alias("ts"), "user_id", "event_type", "value", "props"
    ).write.parquet(f"{d}/events.parquet")
    ev = read_events(spark, d)
    dtypes = dict(ev.dtypes)
    assert dtypes["ts"] == "timestamp"
    assert dtypes["ts_ns"] == "bigint"
    assert ev.filter(F.unix_micros("ts") != F.expr("ts_ns div 1000")).count() == 0


def test_lazy_tables_mapping_semantics():
    calls = []

    def mk(name):
        def load():
            calls.append(name)
            return name  # stand-in; LazyTables doesn't care about the type

        return load

    lt = LazyTables({"a": mk("a"), "b": mk("b")})
    assert set(lt) == {"a", "b"} and len(lt) == 2 and calls == []
    assert "a" in lt and calls == []  # membership never materializes
    assert lt["a"] == "a" and calls == ["a"]
    assert lt["a"] == "a" and calls == ["a"]  # cached
    cp = lt.copy()
    assert cp["b"] == "b" and calls == ["a", "b"]
    assert lt.peek("b") is None  # copy materialized its own, not the original
    lt["c"] = "c"
    assert set(lt) == {"a", "b", "c"}
    del lt["c"]
    with pytest.raises(KeyError):
        lt["c"]


def test_dtype_manifest_matches_real_testdata(spark):
    """validate_sf_dir pins the dtype of every engine-referenced column in
    ALL ten tables (r5, extending the r4 events-only net): a driver-side
    retype in any table fails here with the table and column named."""
    from xdump_spark.catalog import validate_sf_dir

    for sf in ("sf0.001", "sf0.01"):
        d = f"/root/testdata/{sf}"
        if os.path.isdir(d):
            validate_sf_dir(spark, d)  # must not raise


def test_dtype_manifest_flags_mutated_table(spark, tmp_path):
    """A deliberately-retyped column produces ONE clear reader-level error
    naming table.column — not downstream oracle noise."""
    from xdump_spark.catalog import validate_sf_dir

    d = str(tmp_path / "sf")
    os.makedirs(d)
    # region with r_regionkey retyped int → string
    spark.read.parquet(f"{SF_DIR}/region.parquet").withColumn(
        "r_regionkey", F.col("r_regionkey").cast("string")
    ).write.parquet(f"{d}/region.parquet")
    with pytest.raises(ValueError, match=r"region\.r_regionkey.*expected int.*got string"):
        validate_sf_dir(spark, d, tables=["region"])
    # a missing column is reported as <missing>
    spark.read.parquet(f"{SF_DIR}/documents.parquet").drop("n_chars").write.parquet(
        f"{d}/documents.parquet"
    )
    with pytest.raises(ValueError, match=r"documents\.n_chars.*<missing>"):
        validate_sf_dir(spark, d, tables=["documents"])
    # an unreadable table is reported per-table, not as a crash
    os.makedirs(f"{d}/embeddings.parquet")
    with open(f"{d}/embeddings.parquet/part-0.parquet", "w") as fh:
        fh.write("not parquet")
    with pytest.raises(ValueError, match=r"embeddings: unreadable"):
        validate_sf_dir(spark, d, tables=["embeddings"])
