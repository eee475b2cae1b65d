"""LIVE JDBC round-trip against embedded Apache Derby (ships on every
Spark classpath as the Hive-metastore dependency) — the analog of the
reference's real-database test matrix (reference:
tests/test_backend.py:129-207 round-trips, tests/test_postgresql.py:10-85):
create a database with FK constraints, introspect the FK graph through
JDBC metadata, stage a snapshot, run the closure, dump, load, write back
over JDBC, and verify the copy.
"""

import pytest

from xdump_spark.catalog import ForeignKey
from xdump_spark.engine import SparkDumpEngine
from xdump_spark.sources import jdbc as J

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _connect(spark, url):
    return spark._jvm.java.sql.DriverManager.getConnection(url)


@pytest.fixture()
def derby_db(spark, tmp_path):
    """An embedded Derby database holding the reference-style fixture:
    groups ← employees (self-FK manager chain)."""
    url = f"jdbc:derby:{tmp_path}/srcdb;create=true"
    conn = _connect(spark, url)
    st = conn.createStatement()
    st.executeUpdate("CREATE TABLE groups (id INT PRIMARY KEY, name VARCHAR(50))")
    st.executeUpdate(
        "CREATE TABLE employees (id INT PRIMARY KEY, name VARCHAR(50), "
        "manager_id INT, group_id INT, "
        "CONSTRAINT emp_mgr_fk FOREIGN KEY (manager_id) REFERENCES employees(id), "
        "CONSTRAINT emp_grp_fk FOREIGN KEY (group_id) REFERENCES groups(id))"
    )
    for gid, name in [(1, "Admin"), (2, "User")]:
        st.executeUpdate(f"INSERT INTO groups VALUES ({gid}, '{name}')")
    for eid, name, mgr, grp in [
        (1, "Doe", None, 1),
        (2, "Black", 1, 1),
        (3, "Smith", 1, 1),
        (4, "Brown", 3, 2),
        (5, "Snow", 3, 2),
    ]:
        mgr_sql = "NULL" if mgr is None else str(mgr)
        st.executeUpdate(f"INSERT INTO employees VALUES ({eid}, '{name}', {mgr_sql}, {grp})")
    st.close()
    conn.close()
    return url


def test_metadata_fk_introspection(spark, derby_db):
    fks = J.introspect_foreign_keys_metadata(spark, derby_db)
    edges = {(f.table, f.column, f.foreign_table, f.foreign_column) for f in fks}
    assert ("employees", "manager_id", "employees", "id") in edges
    assert ("employees", "group_id", "groups", "id") in edges
    by_name = {f.name for f in fks}
    assert {"EMP_MGR_FK", "EMP_GRP_FK"} <= by_name


def test_partitioned_read_probes_bounds(spark, derby_db):
    opts = J.jdbc_options(derby_db, driver=DERBY_DRIVER)
    df = J.read_table(spark, opts, "employees", partition_column="id", num_partitions=3)
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 5


def test_live_jdbc_dump_load_writeback(spark, derby_db, tmp_path):
    """The full reference lifecycle on a real database: snapshot → closure
    (seed = employee 5, manager chain 5→3→1, group closure) → zip dump →
    load → JDBC write-back → verify the copy by reading it back."""
    opts = J.jdbc_options(derby_db, driver=DERBY_DRIVER)
    fks = J.introspect_foreign_keys_metadata(spark, derby_db)
    cat = J.stage_snapshot(
        spark, opts, ["employees", "groups"], str(tmp_path / "stage"), fks
    )
    # Derby folds unquoted identifiers to uppercase; lowercase the staged
    # frames' columns so seeds and FK edges agree on names
    for t in list(cat.tables):
        df = cat.tables[t]
        cat.tables[t] = df.toDF(*[c.lower() for c in df.columns])

    eng = SparkDumpEngine(spark, cat)
    out = str(tmp_path / "dump.zip")
    counts = eng.dump(
        out,
        full_tables=["groups"],
        partial_tables={"employees": "SELECT * FROM employees WHERE id = 5"},
    )
    assert counts == {"employees": 3, "groups": 2}   # 5→3→1 chain

    loaded = SparkDumpEngine(spark, cat).load(out)
    assert {r.id for r in loaded.frames["employees"].collect()} == {1, 3, 5}

    # write back into a SECOND live Derby database, FK-toposorted
    dst_url = f"jdbc:derby:{tmp_path}/dstdb;create=true"
    _connect(spark, dst_url).close()   # create the db
    dst_props = {"driver": DERBY_DRIVER}
    order = loaded.write_jdbc(dst_url, dst_props, mode="append")
    assert order == ["groups", "employees"]

    dst_opts = J.jdbc_options(dst_url, driver=DERBY_DRIVER)
    # Spark's JDBC writer creates the table unquoted (Derby folds the name
    # to uppercase) but quotes the COLUMN names, preserving lowercase
    emp_back = J.read_table(spark, dst_opts, "employees")
    assert {r.id for r in emp_back.collect()} == {1, 3, 5}
    grp_back = J.read_table(spark, dst_opts, "groups")
    assert grp_back.count() == 2
