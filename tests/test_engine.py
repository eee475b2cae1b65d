"""Dump/load round-trip tests — the reference's end-to-end golden style
(reference: tests/test_backend.py:129-207, tests/conftest.py:125-152):
dump a known fixture, assert archive members and row sets, load back,
compare contents and sequence state."""

import zipfile

import pytest

from xdump_spark.archive import (
    DumpArchive,
    format_csv_value,
    parse_csv_bytes,
    rows_to_csv,
)
from xdump_spark.engine import SparkDumpEngine, toposort_tables
from xdump_spark.catalog import ForeignKey

from .conftest import ids


@pytest.fixture()
def engine(spark, employees_catalog):
    return SparkDumpEngine(spark, employees_catalog)


def test_dump_archive_members(tmp_path, engine, employees_catalog):
    out = str(tmp_path / "dump.zip")
    engine.dump(
        out,
        full_tables=["groups"],
        partial_tables={"employees": "SELECT * FROM employees ORDER BY id DESC LIMIT 2"},
    )
    names = set(DumpArchive(out).namelist())
    # layout mirrors the reference zip (base.py:14-16; conftest.py:174-180)
    assert names == {
        "dump/schema.json",
        "dump/sequences.json",
        "dump/data/groups.csv",
        "dump/data/employees.csv",
    }


def test_dump_flags(tmp_path, engine):
    # reference: tests/test_backend.py:142-162 (schema/data toggles)
    no_schema = str(tmp_path / "ns.zip")
    engine.dump(no_schema, full_tables=["groups"], dump_schema=False)
    assert set(DumpArchive(no_schema).namelist()) == {"dump/data/groups.csv"}

    no_data = str(tmp_path / "nd.zip")
    engine.dump(no_data, full_tables=["groups"], dump_data=False)
    assert set(DumpArchive(no_data).namelist()) == {"dump/schema.json", "dump/sequences.json"}


def test_dump_compression_choices(tmp_path, engine):
    # reference CLI compression map (cli/dump.py:32-38)
    for comp, const in [("stored", zipfile.ZIP_STORED), ("lzma", zipfile.ZIP_LZMA)]:
        out = str(tmp_path / f"{comp}.zip")
        engine.dump(out, full_tables=["groups"], compression=comp)
        with zipfile.ZipFile(out) as zf:
            assert zf.infolist()[0].compress_type == const


def test_roundtrip_flagship(tmp_path, spark, engine):
    """F11: 2 most-recent employees + manager closure, groups full — dump,
    load, compare row sets and sequence state."""
    out = str(tmp_path / "dump.zip")
    counts = engine.dump(
        out,
        full_tables=["groups"],
        partial_tables={"employees": "SELECT * FROM employees ORDER BY id DESC LIMIT 2"},
    )
    assert counts == {"employees": 4, "groups": 2}

    loaded = SparkDumpEngine(spark, engine.catalog).load(out)
    assert ids(loaded.frames["employees"]) == {1, 3, 4, 5}
    assert ids(loaded.frames["groups"]) == {1, 2}
    # types survive the round trip
    assert dict(loaded.frames["employees"].dtypes)["manager_id"] == "int"
    # sequence state: max ids (reference: currval checks, test_backend.py:138-140)
    assert loaded.sequences == {"employees": 5, "groups": 2}
    # NULL survives: employee 1 has manager_id NULL
    row = [r for r in loaded.frames["employees"].collect() if r.id == 1][0]
    assert row.manager_id is None


def test_roundtrip_into_parquet_db(tmp_path, spark, engine):
    from xdump_spark.sources.parquet_db import ParquetDatabase

    out = str(tmp_path / "dump.zip")
    # closure runs for full tables too (F5): tickets pull their authors
    engine.dump(out, full_tables=["groups", "tickets"])
    loaded = SparkDumpEngine(spark, engine.catalog).load(out)
    db_dir = str(tmp_path / "db")
    order = loaded.write_parquet_db(db_dir)
    assert order == ["groups", "employees", "tickets"]  # FK topological
    db = ParquetDatabase(spark, db_dir)
    assert set(db.tables()) == {"groups", "employees", "tickets"}
    assert db.catalog().tables["tickets"].count() == 5
    assert ids(db.catalog().tables["employees"]) == {1, 2, 3}  # authors only
    db.truncate(["tickets"])
    assert set(db.tables()) == {"groups", "employees"}
    db.recreate()
    assert db.tables() == []


def test_load_without_schema_member(tmp_path, spark, engine):
    # reference changelog #39: load must tolerate a schema-less archive
    out = str(tmp_path / "nos.zip")
    engine.dump(out, full_tables=["groups"], dump_schema=False)
    loaded = SparkDumpEngine(spark, engine.catalog).load(out)
    assert loaded.frames["groups"].count() == 2
    assert dict(loaded.frames["groups"].dtypes)["id"] == "string"  # untyped fallback


def test_toposort():
    fks = [
        ForeignKey("tickets", "author_id", "employees", "id"),
        ForeignKey("employees", "group_id", "groups", "id"),
        ForeignKey("employees", "manager_id", "employees", "id"),  # self: ignored
    ]
    order = toposort_tables(["tickets", "employees", "groups"], fks)
    assert order.index("groups") < order.index("employees") < order.index("tickets")


def test_csv_copy_semantics():
    # NULL → empty unquoted; empty string → '""'; quotes doubled
    assert format_csv_value(None) == ""
    assert format_csv_value("") == '""'
    assert format_csv_value('say "hi"') == '"say ""hi"""'
    assert format_csv_value("a,b") == '"a,b"'
    data = rows_to_csv(["a", "b"], [(None, ""), ("x,y", 'q"t')])
    header, rows = parse_csv_bytes(data)
    assert header == ["a", "b"]
    assert rows == [[None, ""], ["x,y", 'q"t']]


def test_input_check_via_engine(tmp_path, engine):
    with pytest.raises(ValueError, match="must not overlap"):
        engine.dump(str(tmp_path / "x.zip"), ["employees"], {"employees": "SELECT 1"})


def test_cli_parse_partial():
    from xdump_spark.cli import parse_partial
    import argparse

    assert parse_partial("emp:SELECT * FROM emp") == ("emp", "SELECT * FROM emp")
    with pytest.raises(argparse.ArgumentTypeError):
        parse_partial("nocolon")


def test_distributed_dump_load_roundtrip(tmp_path, spark, engine, employees_catalog):
    out_dir = str(tmp_path / "dist")
    seed = employees_catalog.tables["employees"].filter("id = 2")
    tables = engine.dump_distributed(
        out_dir, full_tables=["groups"], partial_tables={"employees": seed}
    )
    assert set(tables) == {"employees", "groups"}
    loaded = engine.load_distributed(out_dir)
    # manager chain 2→1, groups full; schema round-trips typed
    emp = loaded.frames["employees"]
    assert {r.id for r in emp.collect()} == {1, 2}
    assert dict(emp.dtypes)["id"] == "int"
    assert loaded.frames["groups"].count() == 2
    assert loaded.load_order().index("groups") < loaded.load_order().index("employees")


def test_distributed_csv_roundtrip(tmp_path, spark, engine, employees_catalog):
    out_dir = str(tmp_path / "dist_csv")
    seed = employees_catalog.tables["employees"].filter("id = 1")
    engine.dump_distributed(out_dir, partial_tables={"employees": seed}, fmt="csv")
    loaded = engine.load_distributed(out_dir)
    emp = loaded.frames["employees"]
    rows = {r.id: r for r in emp.collect()}
    assert set(rows) == {1}
    assert rows[1].manager_id is None   # NULL survives CSV round-trip
