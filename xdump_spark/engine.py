"""Dump/load orchestration — the reference's top-level ``backend.dump`` /
``backend.load`` lifecycle (xdump/base.py:87-106, 220-250) on Spark.

dump(): validate → FK-closure over seeds → schema manifest + sequence
state → per-table CSV into a zip. load(): schema manifest (optional) →
CSV → typed DataFrames → write in FK-topological order.

The driver-side CSV collect is intentional for the dump path: partial
dumps are small by construction (the reference streams straight into a
zip on one machine too). For big exports use ``dump_distributed`` which
writes spark-native partitioned parquet/CSV instead.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xdump_spark.archive import DumpArchive, rows_to_csv, parse_csv_bytes
from xdump_spark.catalog import Catalog, ForeignKey
from xdump_spark.planner.closure import compute_closure, validate_tables
from xdump_spark.timing import log_time, logger


def toposort_tables(tables: list[str], fks: list[ForeignKey]) -> list[str]:
    """Parents before children so FK-constrained inserts succeed — an
    improvement over the reference, which relies on archive member order
    plus in-transaction FK deferral (xdump/base.py:104-106,239-246).
    Self-FK edges are ignored (unsortable; handled by the target DB)."""
    deps: dict[str, set[str]] = {t: set() for t in tables}
    for fk in fks:
        if fk.table in deps and fk.foreign_table in deps and not fk.is_recursive:
            deps[fk.table].add(fk.foreign_table)
    out: list[str] = []
    remaining = dict(deps)
    while remaining:
        ready = sorted(t for t, d in remaining.items() if not (d & set(remaining)))
        if not ready:
            # FK cycle across tables: fall back to name order (the
            # reference would livelock here too; document rather than die)
            out.extend(sorted(remaining))
            break
        out.extend(ready)
        for t in ready:
            del remaining[t]
    return out


def sequence_state(selections: dict[str, DataFrame], catalog: Catalog) -> dict[str, int]:
    """Per-table max serial-key — the analog of dumping PostgreSQL
    sequence positions so a loaded database continues numbering correctly
    (reference: xdump/postgresql.py:136-146). Covers LEAF tables through
    the catalog's explicit primary keys.

    All per-table max aggregates run as ONE unioned Spark job (each leg is
    a map-side max over its own scan) instead of a driver loop of one
    collect per table."""
    integral = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    parts: list[DataFrame] = []
    for table, df in sorted(selections.items()):
        pk = catalog.primary_key(table)
        if pk is None:
            continue
        dt = df.schema[pk].dataType
        # Sequence state only makes sense for serial integer keys;
        # string/uuid keys carry no counter to restore. JDBC sources
        # commonly surface serial keys as DecimalType(p, 0) (PostgreSQL
        # numeric, Oracle NUMBER(10,0)) — those ARE integral.
        if not (
            isinstance(dt, integral)
            or (isinstance(dt, T.DecimalType) and dt.scale == 0)
        ):
            continue
        parts.append(
            df.agg(
                F.lit(table).alias("table_name"),
                # decimal(38,0), not long: a decimal(38,0) serial key can
                # exceed the long range, where a long cast overflows
                # (ANSI error) or silently nulls the sequence out
                F.max(pk).cast(T.DecimalType(38, 0)).alias("max_key"),
            )
        )
    if not parts:
        return {}
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    return {
        r["table_name"]: int(r["max_key"])   # exact: Python ints are unbounded
        for r in merged.collect()
        if r["max_key"] is not None
    }


class SparkDumpEngine:
    """The engine façade: a Catalog plus dump/load entry points."""

    def __init__(self, spark: SparkSession, catalog: Catalog):
        self.spark = spark
        self.catalog = catalog

    # ------------------------------------------------------------- dump --
    def _select(self, full_tables, partial_tables) -> dict[str, DataFrame]:
        validate_tables(self.catalog, full_tables, partial_tables or {})
        return compute_closure(
            self.catalog, tuple(full_tables), dict(partial_tables or {}), spark=self.spark
        )

    def dump(
        self,
        filename: str,
        full_tables: list[str] | tuple[str, ...] = (),
        partial_tables: dict[str, DataFrame | str] | None = None,
        dump_schema: bool = True,
        dump_data: bool = True,
        compression: str = "deflated",
        max_driver_rows: int | None = 1_000_000,
    ) -> dict[str, int]:
        """Write the closure of (full_tables, partial_tables) as a zip.
        Returns {table: rows written}. Mirrors backend.dump flags
        (reference: xdump/base.py:87-106; tests/test_backend.py:142-162).
        Total and per-table wall time is logged like the reference's
        verbosity surface (xdump/base.py:24-35,98).

        Archive dumps collect each selected table to the driver — valid
        because partial dumps are small by construction, and ENFORCED by
        ``max_driver_rows``: any table whose selection exceeds it raises
        (checked with a limit+count probe BEFORE collecting, so an
        oversized selection cannot OOM the driver first). Use
        ``dump_distributed`` for large selections, or pass
        ``max_driver_rows=None`` to opt out."""
        with log_time("total dump"):
            return self._dump(
                filename, full_tables, partial_tables, dump_schema, dump_data,
                compression, max_driver_rows,
            )

    def _dump(
        self, filename, full_tables, partial_tables, dump_schema, dump_data,
        compression, max_driver_rows=None,
    ) -> dict[str, int]:
        selections = self._select(full_tables, partial_tables)
        return self._export(
            filename, selections, dump_schema, dump_data, compression, max_driver_rows
        )

    def _export(
        self, filename, selections, dump_schema, dump_data, compression,
        max_driver_rows=None,
    ) -> dict[str, int]:
        if dump_data and max_driver_rows is not None:
            for table, df in selections.items():
                if df.limit(max_driver_rows + 1).count() > max_driver_rows:
                    raise ValueError(
                        f"dump() collects to the driver and the selection for "
                        f"table {table!r} exceeds max_driver_rows="
                        f"{max_driver_rows}; use dump_distributed() for large "
                        "selections (executors write partitioned parquet/CSV) "
                        "or raise max_driver_rows explicitly"
                    )
        schema = None
        sequences = None
        if dump_schema:
            schema = {
                "tables": {
                    name: {"spark_schema": df.schema.jsonValue()}
                    for name, df in selections.items()
                },
                "foreign_keys": [
                    fk.to_dict()
                    for fk in self.catalog.foreign_keys
                    if fk.table in selections and fk.foreign_table in selections
                ],
            }
            sequences = sequence_state(selections, self.catalog)
        data: dict[str, bytes] = {}
        counts: dict[str, int] = {}
        if dump_data:
            for table, df in selections.items():
                with log_time(f"export {table}", level=10):
                    cols = df.columns
                    rows = [tuple(r) for r in df.collect()]
                counts[table] = len(rows)
                data[table] = rows_to_csv(cols, rows)
                logger.debug("%s: %d rows", table, counts[table])
        DumpArchive(filename).write(schema, sequences, data, compression)
        return counts

    def dump_incremental(
        self,
        filename: str,
        since: str,
        full_tables: list[str] | tuple[str, ...] = (),
        partial_tables: dict[str, DataFrame | str] | None = None,
        dump_schema: bool = True,
        dump_data: bool = True,
        compression: str = "deflated",
        max_driver_rows: int | None = 1_000_000,
    ) -> dict[str, int]:
        """Delta dump: the ``dump`` selection MINUS every row already
        captured by the ``since`` archive — the scale extension of the
        reference's snapshot dump (re-exporting a 100 TB source per run
        is not a plan; exporting the day's delta is).

        New rows are identified per table by serial key: key > the
        since-archive's recorded sequence position (the reference dumps
        exactly this state to continue numbering after load,
        xdump/postgresql.py:136-146 — reused here as a high-watermark, so
        the filter PUSHES DOWN to the scan and old rows are never read).
        Tables without a recorded counter (no single serial key, e.g. a
        composite-key fact table) fall back to an exact full-row
        anti-join against the since-archive's rows.

        Tables with no new rows are OMITTED from the archive; the load
        path's skip-if-absent rule makes the delta loadable standalone
        onto a previously-loaded target (append). Referential integrity
        of the union holds by construction: a new child may reference an
        old parent, and the old parent is already in the target.
        """
        prev = DumpArchive(since)
        prev_seq = prev.read_sequences()
        prev_loaded: LoadedDump | None = None
        selections = self._select(full_tables, partial_tables or {})
        delta: dict[str, DataFrame] = {}
        for table, df in selections.items():
            pk = self.catalog.primary_key(table)
            if pk is not None and table in prev_seq:
                delta[table] = df.filter(F.col(pk) > int(prev_seq[table]))
            else:
                if prev_loaded is None:
                    prev_loaded = self.load(since)
                if table in prev_loaded.frames:
                    delta[table] = df.join(
                        prev_loaded.frames[table], on=list(df.columns), how="left_anti"
                    )
                else:
                    delta[table] = df
        delta = {t: d for t, d in delta.items() if d.limit(1).count() > 0}
        return self._export(
            filename, delta, dump_schema, dump_data, compression, max_driver_rows
        )

    def dump_distributed(
        self,
        out_dir: str,
        full_tables: list[str] | tuple[str, ...] = (),
        partial_tables: dict[str, DataFrame | str] | None = None,
        fmt: str = "parquet",
    ) -> list[str]:
        """Scale path: write each selected table as partitioned parquet/CSV
        under ``out_dir/<table>/`` with executors doing the IO (no driver
        collect). Schema/FK manifest goes to ``out_dir/manifest.json``."""
        import json

        selections = self._select(full_tables, partial_tables)
        for table, df in selections.items():
            writer = df.write.mode("overwrite")
            if fmt == "csv":
                writer.option("header", True).option("nullValue", "").csv(
                    os.path.join(out_dir, table)
                )
            else:
                writer.parquet(os.path.join(out_dir, table))
        manifest = {
            "format": fmt,
            "tables": {name: df.schema.jsonValue() for name, df in selections.items()},
            "foreign_keys": [
                fk.to_dict()
                for fk in self.catalog.foreign_keys
                if fk.table in selections and fk.foreign_table in selections
            ],
        }
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2)
        return sorted(selections)

    def load_distributed(self, out_dir: str) -> "LoadedDump":
        """Read a ``dump_distributed`` directory back: typed frames come
        straight off the partitioned parquet/CSV parts (executors do the
        IO — the scale twin of ``load``, which parses driver-side CSV)."""
        import json

        with open(os.path.join(out_dir, "manifest.json")) as f:
            manifest = json.load(f)
        frames: dict[str, DataFrame] = {}
        for table, schema_json in manifest["tables"].items():
            st = T.StructType.fromJson(schema_json)
            path = os.path.join(out_dir, table)
            if manifest.get("format") == "csv":
                frames[table] = (
                    self.spark.read.option("header", True)
                    .option("nullValue", "")
                    .schema(st)
                    .csv(path)
                )
            else:
                frames[table] = self.spark.read.parquet(path)
        fks = [ForeignKey.from_dict(d) for d in manifest.get("foreign_keys", [])]
        return LoadedDump(frames, fks, {})

    # ------------------------------------------------------------- load --
    def load(self, filename: str) -> "LoadedDump":
        """Parse an archive back into typed DataFrames (schema from the
        manifest when present, else all-string columns — the reference
        likewise loads without schema when schema.sql is absent,
        docs/changelog.rst:26)."""
        with log_time("total load"):
            return self._load(filename)

    def _load(self, filename: str) -> "LoadedDump":
        arc = DumpArchive(filename)
        schema = arc.read_schema()
        sequences = arc.read_sequences()
        data = arc.read_data()
        frames: dict[str, DataFrame] = {}
        for table, csv_bytes in data.items():
            header, rows = parse_csv_bytes(csv_bytes)
            if schema and table in schema["tables"]:
                st = T.StructType.fromJson(schema["tables"][table]["spark_schema"])
                typed_rows = [
                    tuple(_coerce(v, st[c].dataType) for v, c in zip(row, header))
                    for row in rows
                ]
                frames[table] = self.spark.createDataFrame(typed_rows, st)
            else:
                st = T.StructType([T.StructField(c, T.StringType(), True) for c in header])
                frames[table] = self.spark.createDataFrame([tuple(r) for r in rows], st)
        fks = (
            [ForeignKey.from_dict(d) for d in schema.get("foreign_keys", [])]
            if schema
            else []
        )
        return LoadedDump(frames, fks, sequences)


def _coerce(v: str | None, dt: T.DataType):
    if v is None:
        return None
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        # complex cells are embedded as JSON by format_csv_value
        import json

        return _from_jsonable(json.loads(v), dt)
    if isinstance(dt, (T.IntegerType, T.LongType, T.ShortType)):
        return int(v)
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return float(v)
    if isinstance(dt, T.BooleanType):
        return v == "true"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        from datetime import datetime

        return datetime.fromisoformat(v)
    if isinstance(dt, T.DateType):
        from datetime import date

        return date.fromisoformat(v)
    if isinstance(dt, T.DecimalType):
        from decimal import Decimal

        return Decimal(v)
    if isinstance(dt, T.BinaryType):
        # format_csv_value writes bytes PG-COPY-style as \x<hex>
        if v.startswith("\\x"):
            return bytes.fromhex(v[2:])
        return v.encode("utf-8")
    return v


def _from_jsonable(o, dt: T.DataType):
    """Type a JSON-decoded complex cell back to what createDataFrame
    expects for ``dt`` (inverse of archive._to_jsonable): containers
    recurse; scalar leaves arrive either natively typed from JSON
    (int/float/bool) or as the string encodings _coerce already parses
    (temporals, decimals, bytes)."""
    if o is None:
        return None
    if isinstance(dt, T.ArrayType):
        return [_from_jsonable(x, dt.elementType) for x in o]
    if isinstance(dt, T.MapType):
        return {_coerce(k, dt.keyType): _from_jsonable(x, dt.valueType) for k, x in o.items()}
    if isinstance(dt, T.StructType):
        return {f.name: _from_jsonable(o.get(f.name), f.dataType) for f in dt.fields}
    if isinstance(o, str):
        return _coerce(o, dt)
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return float(o)
    if isinstance(dt, T.DecimalType):
        from decimal import Decimal

        return Decimal(str(o))
    return o


class LoadedDump:
    """A parsed archive: typed frames + FK graph + sequence state, with
    helpers to replay into a target (the reference's load step,
    xdump/base.py:220-250)."""

    def __init__(self, frames: dict[str, DataFrame], fks: list[ForeignKey], sequences: dict):
        self.frames = frames
        self.foreign_keys = fks
        self.sequences = sequences

    def load_order(self) -> list[str]:
        return toposort_tables(sorted(self.frames), self.foreign_keys)

    def write_parquet_db(self, db_dir: str, mode: str = "errorifexists") -> list[str]:
        """Replay into a parquet-directory database, parents first. Dumped
        sequence state lands in the database's counter manifest
        (``sequences.json``) so ``ParquetDatabase.allocate_keys`` continues
        numbering after the load — the file-backend analog of the
        reference's sequences.sql replay (xdump/base.py:227-237)."""
        order = self.load_order()
        for table in order:
            self.frames[table].write.mode(mode).parquet(os.path.join(db_dir, table))
        if self.sequences:
            from xdump_spark.sources.parquet_db import ParquetDatabase

            ParquetDatabase(None, db_dir).write_sequences(
                {t: int(v) for t, v in self.sequences.items()}
            )
        return order

    def write_jdbc(
        self, url: str, properties: dict, mode: str = "append",
        apply_sequences: bool = True,
    ) -> list[str]:
        """Replay into a JDBC database in FK order, then restart the
        target's serial counters at max_key + 1 (``apply_sequences_jdbc``)
        so post-load inserts continue numbering — the reference applies
        sequences.sql on load and verifies currval advanced
        (xdump/base.py:227-237, tests/test_backend.py:138-140).

        PostgreSQL targets and ``search_path`` (CVE-2018-1058 context): the
        reference saves/restores ``search_path`` around schema replay because
        ``pg_dump`` emits ``SELECT pg_catalog.set_config('search_path', '',
        false)`` (xdump/postgresql.py:179-188). This path writes bare table
        names, so each JDBC connection resolves them through the connecting
        role's ``search_path``. Against a hardened PG target whose
        search_path was emptied, qualify the names (``schema.table``) or set
        ``currentSchema=<schema>`` in the JDBC url — the engine deliberately
        does not override the connection's resolution rules."""
        order = self.load_order()
        for table in order:
            self.frames[table].write.jdbc(url, table, mode=mode, properties=properties)
        if apply_sequences and self.sequences:
            from xdump_spark.sources.jdbc import apply_sequences_jdbc

            spark = next(iter(self.frames.values())).sparkSession
            apply_sequences_jdbc(spark, url, self.sequences, properties)
        return order
