"""COVERAGE.md is the judge-facing inventory → implementation map; a
registry entry missing from it (or a documented entry that no longer
exists) is a silent doc drift. Pin the two directions."""

import re
from pathlib import Path

from xdump_spark import queries as Q

COVERAGE = Path(__file__).resolve().parent.parent / "COVERAGE.md"


def test_every_registry_entry_documented():
    text = COVERAGE.read_text()
    missing = [name for name in Q.queries() if name not in text]
    assert not missing, f"registry entries absent from COVERAGE.md: {missing}"


def test_documented_modules_exist():
    """Every operators/* and streaming/* module named in COVERAGE.md
    exists on disk (catches a doc row outliving a refactor)."""
    text = COVERAGE.read_text()
    root = Path(__file__).resolve().parent.parent / "xdump_spark"
    mods = set(re.findall(r"`(?:operators|streaming|sources)/(\w+)\.py`", text))
    assert mods, "no module references found — parsing broke?"
    for m in sorted(mods):
        hits = list(root.glob(f"*/{m}.py"))
        assert hits, f"COVERAGE.md references {m}.py but no such module exists"


def test_bench_headline_subset_of_registry():
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from bench import HEADLINE

    missing = [n for n in HEADLINE if n not in Q.queries()]
    assert not missing, f"bench HEADLINE names not in registry: {missing}"


def test_every_oracle_parses_in_duckdb():
    """Fast syntax gate: every oracle_sql() runs against EMPTY views with
    the real testdata schemas — a SQL typo fails here in milliseconds
    instead of at the driver's correctness run."""
    import duckdb

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet') LIMIT 0"
        )
    for name, sql in Q.oracle_sql().items():
        try:
            con.execute(sql).fetchall()
        except Exception as e:  # pragma: no cover
            raise AssertionError(f"oracle {name!r} failed on empty views: {e}")
