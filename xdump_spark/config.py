"""Config-file-driven dump/load — the analog of the reference's Django
integration, where table sets live in settings (``XDUMP = {FULL_TABLES,
PARTIAL_TABLES, BACKEND}``, reference: extra/django/xdump/management/
core.py:7-74) and a management command runs the dump without CLI flags.

Config is JSON (no extra dependencies):

    {
      "db": "/path/to/parquet_db",
      "output": "dump.zip",
      "full_tables": ["groups"],
      "partial_tables": {"employees": "SELECT * FROM employees WHERE id = 1"},
      "compression": "deflated",
      "dump_schema": true,
      "dump_data": true
    }
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession


def load_config(path: str) -> dict:
    with open(path) as f:
        cfg = json.load(f)
    for key in ("db", "output"):
        if key not in cfg:
            raise ValueError(f"config missing required key {key!r}")
    unknown = set(cfg) - {
        "db", "output", "full_tables", "partial_tables",
        "compression", "dump_schema", "dump_data", "since",
    }
    if unknown:
        raise ValueError(f"unknown config keys: {sorted(unknown)}")
    return cfg


def dump_from_config(spark: SparkSession, path: str) -> dict[str, int]:
    """Run a dump as described by a JSON config file; returns per-table
    row counts (same as ``SparkDumpEngine.dump``)."""
    from xdump_spark.engine import SparkDumpEngine
    from xdump_spark.sources.parquet_db import ParquetDatabase

    cfg = load_config(path)
    engine = SparkDumpEngine(spark, ParquetDatabase(spark, cfg["db"]).catalog())
    kwargs = dict(
        full_tables=cfg.get("full_tables", []),
        partial_tables=cfg.get("partial_tables", {}),
        dump_schema=cfg.get("dump_schema", True),
        dump_data=cfg.get("dump_data", True),
        compression=cfg.get("compression", "deflated"),
    )
    if cfg.get("since"):
        # incremental: export only rows newer than the prior archive
        return engine.dump_incremental(cfg["output"], since=cfg["since"], **kwargs)
    return engine.dump(cfg["output"], **kwargs)
