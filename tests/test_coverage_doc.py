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
