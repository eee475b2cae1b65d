"""CLI mirroring the reference's ``xdump`` / ``xload`` commands
(xdump/cli/dump.py:41-74, xdump/cli/load.py:13-22) over the parquet-db
source.

    python -m xdump_spark.cli dump -i DBDIR -o dump.zip \
        -f groups -p "employees:SELECT * FROM employees WHERE id = 1" \
        --compression deflated [--no-schema] [--no-data]
    python -m xdump_spark.cli load -i dump.zip -o DBDIR \
        [--cleanup-method {recreate,truncate}]
"""

from __future__ import annotations

import argparse
import sys

from xdump_spark.archive import COMPRESSION


# The reference resolves backends from importable strings
# (xdump/cli/utils.py:12-22); same extensibility surface here. A backend
# class takes (spark, path) and provides catalog() plus the maintenance
# hooks truncate()/recreate()/write_fk_config() (see
# sources/parquet_db.py:23-80, the default).
DEFAULT_BACKEND = "xdump_spark.sources.parquet_db:ParquetDatabase"


def resolve_backend(spec: str):
    """'pkg.module:Class' (or 'pkg.module.Class') → the class object."""
    import importlib

    mod_name, sep, cls_name = spec.partition(":")
    if not sep:
        mod_name, _, cls_name = spec.rpartition(".")
    if not mod_name or not cls_name:
        raise argparse.ArgumentTypeError(
            f"backend must look like 'pkg.module:Class', got {spec!r}"
        )
    try:
        mod = importlib.import_module(mod_name)
    except ImportError as e:
        raise argparse.ArgumentTypeError(f"cannot import backend module {mod_name!r}: {e}")
    try:
        return getattr(mod, cls_name)
    except AttributeError:
        raise argparse.ArgumentTypeError(f"module {mod_name!r} has no attribute {cls_name!r}")


def parse_partial(value: str) -> tuple[str, str]:
    """'table:SELECT ...' → (table, sql); bad format is a usage error
    (reference: xdump/cli/dump.py:16-29, tests/cli/test_dump.py:52-58)."""
    table, sep, sql = value.partition(":")
    if not sep or not table.strip() or not sql.strip():
        raise argparse.ArgumentTypeError(
            f"partial table spec must look like 'table:SELECT ...', got {value!r}"
        )
    return table.strip(), sql.strip()


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="xdump-spark")
    p.add_argument(
        "-v", "--verbosity", action="count", default=0,
        help="-v: info (queries), -vv: debug (per-table timings) — the "
        "reference's verbosity surface (xdump/cli/dump.py, xdump/logging.py)",
    )
    sub = p.add_subparsers(dest="command", required=True)

    d = sub.add_parser("dump", help="make a consistent partial dump")
    d.add_argument("-i", "--input-db", required=True, help="parquet database directory")
    d.add_argument("-o", "--output", required=True, help="output zip path")
    d.add_argument("-f", "--full-table", action="append", default=[], dest="full_tables")
    d.add_argument(
        "-p", "--partial", action="append", default=[], type=parse_partial,
        help="'table:SELECT ...' seed (repeatable)",
    )
    d.add_argument("--compression", choices=sorted(COMPRESSION), default="deflated")
    d.add_argument("--no-schema", action="store_true", dest="no_schema")
    d.add_argument("--no-data", action="store_true", dest="no_data")
    d.add_argument(
        "--backend", type=resolve_backend, default=None,
        help=f"source class as 'pkg.module:Class' (default {DEFAULT_BACKEND})",
    )

    ld = sub.add_parser("load", help="load a dump into a parquet database")
    ld.add_argument("-i", "--input", required=True, help="dump zip path")
    ld.add_argument("-o", "--output-db", required=True, help="target parquet db dir")
    ld.add_argument(
        "--cleanup-method", choices=["recreate", "truncate"], default=None,
        help="clean the target before loading (reference: xdump/cli/load.py:25-37)",
    )
    ld.add_argument(
        "--backend", type=resolve_backend, default=None,
        help=f"target class as 'pkg.module:Class' (default {DEFAULT_BACKEND})",
    )
    return p


def run(args, spark) -> int:
    """Execute a parsed CLI command against an existing session (split from
    ``main`` so tests can drive the CLI without owning session lifecycle)."""
    from xdump_spark.catalog import Catalog
    from xdump_spark.engine import SparkDumpEngine
    from xdump_spark.timing import configure

    configure(getattr(args, "verbosity", 0))
    backend_cls = getattr(args, "backend", None) or resolve_backend(DEFAULT_BACKEND)
    if args.command == "dump":
        db = backend_cls(spark, args.input_db)
        engine = SparkDumpEngine(spark, db.catalog())
        counts = engine.dump(
            args.output,
            full_tables=args.full_tables,
            partial_tables=dict(args.partial),
            dump_schema=not args.no_schema,
            dump_data=not args.no_data,
            compression=args.compression,
        )
        for table in sorted(counts):
            print(f"{table}: {counts[table]} rows")
        print(f"wrote {args.output}")
    else:
        db = backend_cls(spark, args.output_db)
        if args.cleanup_method == "recreate":
            db.recreate()
        elif args.cleanup_method == "truncate":
            db.truncate()
        engine = SparkDumpEngine(spark, Catalog({}))   # load needs no source catalog
        loaded = engine.load(args.input)
        order = loaded.load_order()
        db.load_tables(loaded.frames, order, mode="overwrite")
        db.write_fk_config(loaded.foreign_keys)
        print(f"loaded tables (FK order): {', '.join(order)}")
    return 0


def main(argv: list[str] | None = None) -> int:
    from xdump_spark.session import get_spark

    args = build_parser().parse_args(argv)
    spark = get_spark("xdump_spark_cli")
    try:
        return run(args, spark)
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
