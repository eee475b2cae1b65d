"""Engine catalog: named DataFrames + foreign-key edge metadata.

The reference engine's only metadata structure is the FK edge dict
``{constraint_name, table_name, column_name, foreign_table_name,
foreign_column_name}`` (reference: xdump/postgresql.py:19-62,
xdump/sqlite.py:71-84). Spark's catalog cannot represent FK constraints, so
this module carries them engine-side; the FK graph drives the closure
planner (planner/closure.py).
"""

from __future__ import annotations

from collections.abc import Callable, MutableMapping
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class LazyTables(MutableMapping):
    """name → DataFrame mapping that builds each frame on first access.

    One broken source must fail only the queries that read it, not the
    whole catalog (round-3 lesson: an events schema drift zeroed all 50
    correctness entries because load_sf_dir was eager). Loader errors
    propagate on access and are retried on the next access — nothing is
    cached for a failed build.
    """

    def __init__(
        self,
        loaders: dict[str, Callable[[], DataFrame]] | None = None,
        materialized: dict[str, DataFrame] | None = None,
    ):
        self._loaders: dict[str, Callable[[], DataFrame]] = dict(loaders or {})
        self._dfs: dict[str, DataFrame] = dict(materialized or {})

    def __getitem__(self, key: str) -> DataFrame:
        if key not in self._dfs:
            if key not in self._loaders:
                raise KeyError(key)
            self._dfs[key] = self._loaders[key]()
        return self._dfs[key]

    def __setitem__(self, key: str, value: DataFrame) -> None:
        self._dfs[key] = value
        self._loaders.pop(key, None)

    def __delitem__(self, key: str) -> None:
        found = key in self._dfs or key in self._loaders
        self._dfs.pop(key, None)
        self._loaders.pop(key, None)
        if not found:
            raise KeyError(key)

    def __contains__(self, key) -> bool:
        # MutableMapping's default __contains__ calls __getitem__, which
        # would materialize (and couple table health to membership tests).
        return key in self._dfs or key in self._loaders

    def __iter__(self):
        # Materialized first (insertion order), then pending loaders.
        seen = dict.fromkeys(self._dfs)
        seen.update(dict.fromkeys(k for k in self._loaders if k not in seen))
        return iter(seen)

    def __len__(self) -> int:
        return len(set(self._dfs) | set(self._loaders))

    def peek(self, key: str) -> DataFrame | None:
        """The materialized frame, or None if not yet built (no side effects)."""
        return self._dfs.get(key)

    def copy(self) -> "LazyTables":
        return LazyTables(self._loaders, self._dfs)


@dataclass(frozen=True)
class ForeignKey:
    """One FK edge: ``table.column`` references ``foreign_table.foreign_column``.

    Mirrors the reference's edge dict (xdump/postgresql.py:19-62); the
    constraint name is optional because file-based sources have none.
    """

    table: str
    column: str
    foreign_table: str
    foreign_column: str
    name: str | None = None

    @property
    def is_recursive(self) -> bool:
        # A self-referencing FK; the reference routes these through a
        # recursive CTE (xdump/base.py:253-262, postgresql.py:162-165).
        return self.table == self.foreign_table

    def to_dict(self) -> dict:
        return {
            "table": self.table,
            "column": self.column,
            "foreign_table": self.foreign_table,
            "foreign_column": self.foreign_column,
            "name": self.name,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "ForeignKey":
        return cls(
            table=d["table"],
            column=d["column"],
            foreign_table=d["foreign_table"],
            foreign_column=d["foreign_column"],
            name=d.get("name"),
        )


class Catalog:
    """Table name → DataFrame, plus the FK graph.

    The analog of the reference's cached ``_related_data``
    (xdump/postgresql.py:148-156) and per-table ``_get_foreign_keys``
    (xdump/sqlite.py:67-69): all FK metadata is resolved once, up front.
    """

    def __init__(
        self,
        tables: MutableMapping[str, DataFrame],
        foreign_keys: list[ForeignKey] | None = None,
        primary_keys: dict[str, str] | None = None,
    ):
        # A LazyTables mapping is kept as-is (copying would force every
        # loader); a plain dict is defensively copied as before.
        self.tables: MutableMapping[str, DataFrame] = (
            tables.copy() if isinstance(tables, LazyTables) else dict(tables)
        )
        self.foreign_keys: list[ForeignKey] = list(foreign_keys or [])
        # Explicit per-table serial-key metadata (the reference reads this
        # from the DB's sequence catalog, xdump/postgresql.py:136-146).
        # Needed for LEAF tables: referenced-column inference can't see a
        # serial key nothing points at, and its sequence state would
        # silently be lost on dump (new inserts after load would collide).
        self.primary_keys: dict[str, str] = dict(primary_keys or {})
        for fk in self.foreign_keys:
            if fk.table not in self.tables:
                raise ValueError(f"FK references unknown table {fk.table!r}")
            if fk.foreign_table not in self.tables:
                raise ValueError(f"FK references unknown table {fk.foreign_table!r}")
        lazy = isinstance(self.tables, LazyTables)
        for t, col in self.primary_keys.items():
            if t not in self.tables:
                raise ValueError(f"primary key declared for unknown table {t!r}")
            # Column validation must not force a lazy load (that would
            # re-couple every table's health); unmaterialized frames are
            # validated on first real access by their own readers.
            df = self.tables.peek(t) if lazy else self.tables[t]
            if df is not None and col not in df.columns:
                raise ValueError(f"primary key column {col!r} not in table {t!r}")

    # -- graph accessors ---------------------------------------------------
    def outgoing(self, table: str) -> list[ForeignKey]:
        """FK edges whose child side is ``table`` (selected rows in ``table``
        pull the referenced parent rows — child→parent only, matching the
        reference's closure direction, xdump/base.py:154-171)."""
        return [fk for fk in self.foreign_keys if fk.table == table]

    def incoming(self, table: str) -> list[ForeignKey]:
        return [fk for fk in self.foreign_keys if fk.foreign_table == table]

    def referenced_key(self, table: str) -> str | None:
        """The column other tables reference — the row identity the closure
        planner accumulates key-sets on. None if nothing references
        ``table``. Always FK-derived: an explicitly declared primary key
        plays no role in closure propagation (the semi-joins must run on
        the column the edges actually point at)."""
        cols = {fk.foreign_column for fk in self.incoming(table)}
        if not cols:
            return None
        if len(cols) > 1:
            raise ValueError(
                f"table {table!r} is referenced through multiple columns {sorted(cols)}; "
                "composite/multi-column reference targets are not supported"
            )
        return next(iter(cols))

    def primary_key(self, table: str) -> str | None:
        """The table's serial-key column for sequence-state capture:
        explicit declaration first, referenced-column inference as the
        fallback (so leaf tables keep their counter when declared)."""
        if table in self.primary_keys:
            return self.primary_keys[table]
        return self.referenced_key(table)

    # -- convenience -------------------------------------------------------
    def register_views(self, spark: SparkSession, suffix: str = "") -> None:
        """Expose every table as a temp view so user seed SQL can run
        against it (the reference's seed surface is raw SQL per partial
        table, README.rst:41-45)."""
        for name, df in self.tables.items():
            df.createOrReplaceTempView(name + suffix)

    def with_table(
        self,
        name: str,
        df: DataFrame,
        fks: list[ForeignKey] | None = None,
        primary_key: str | None = None,
    ) -> "Catalog":
        tables = self.tables.copy() if isinstance(self.tables, LazyTables) else dict(self.tables)
        tables[name] = df
        pks = dict(self.primary_keys)
        if primary_key is not None:
            pks[name] = primary_key
        return Catalog(tables, self.foreign_keys + list(fks or []), primary_keys=pks)


# FK graph of the driver's TPC-H-ish testdata (TESTDATA.md); same graph
# shapes as the reference's 3-table fixture, at scale.
TPCH_FOREIGN_KEYS: list[ForeignKey] = [
    ForeignKey("nation", "n_regionkey", "region", "r_regionkey"),
    ForeignKey("customer", "c_nationkey", "nation", "n_nationkey"),
    ForeignKey("supplier", "s_nationkey", "nation", "n_nationkey"),
    ForeignKey("orders", "o_custkey", "customer", "c_custkey"),
    ForeignKey("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ForeignKey("lineitem", "l_partkey", "part", "p_partkey"),
    ForeignKey("lineitem", "l_suppkey", "supplier", "s_suppkey"),
]

# Serial-key declarations for the testdata tables (the reference reads
# these from the DB catalog). Includes LEAF tables (documents, embeddings,
# events) whose counters referenced-column inference cannot see; lineitem
# has a composite key — no single serial to capture.
TPCH_PRIMARY_KEYS: dict[str, str] = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

TPCH_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


# Recorded dtype manifest for the driver testdata (TESTDATA.md), as seen
# through the engine's readers (events via read_events, so its row states
# the ts TIMESTAMP + ts_ns LONG contract, not the raw file layout — any
# raw layout the reader accepts is fine). A value may be a tuple of
# accepted dtypes: the generator already flip-flopped timestamp layouts
# once (round 3), so tz-naive/tz-aware variants of the date columns are
# both accepted — session tz is pinned UTC, values are identical.
# validate_sf_dir turns any drift into ONE reader-level error naming the
# table and column instead of dozens of opaque oracle failures.
EXPECTED_DTYPES: dict[str, dict[str, str | tuple[str, ...]]] = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint", "c_name": "string", "c_nationkey": "int",
        "c_acctbal": "double", "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint", "s_name": "string", "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint", "p_name": "string", "p_brand": "string",
        "p_type": "string", "p_size": "int", "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint", "o_custkey": "bigint",
        "o_orderstatus": "string", "o_totalprice": "double",
        "o_orderdate": ("timestamp_ntz", "timestamp"),
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint", "l_partkey": "bigint", "l_suppkey": "bigint",
        "l_linenumber": "int", "l_quantity": "double",
        "l_extendedprice": "double", "l_discount": "double",
        "l_tax": "double", "l_returnflag": "string", "l_linestatus": "string",
        "l_shipdate": ("timestamp_ntz", "timestamp"),
    },
    "events": {
        "event_id": "bigint", "ts": "timestamp", "user_id": "bigint",
        "event_type": "string", "value": "double", "ts_ns": "bigint",
    },
    "documents": {
        "doc_id": "bigint", "text": "string", "lang": "string",
        "source": "string", "n_chars": "bigint",
    },
    "embeddings": {"vec_id": "bigint", "embedding": "array<float>"},
}


def validate_sf_dir(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> None:
    """Check every table's dtypes against EXPECTED_DTYPES, raising ONE
    ValueError that lists all drifted/missing/unreadable columns with
    their table names. Run this when a testdata layout change is
    suspected (tests/test_testdata.py runs it against the real driver
    data every round)."""
    cat = load_sf_dir(spark, sf_dir, tables)
    problems: list[str] = []
    for name, want in EXPECTED_DTYPES.items():
        if tables is not None and name not in tables:
            continue
        try:
            got_types = dict(cat.tables[name].dtypes)
        except Exception as exc:  # surface per-table read errors in one place
            problems.append(f"{name}: unreadable ({type(exc).__name__}: {exc})")
            continue
        for col, accept in want.items():
            accepted = (accept,) if isinstance(accept, str) else accept
            got = got_types.get(col, "<missing>")
            if got not in accepted:
                problems.append(
                    f"{name}.{col}: expected {' or '.join(accepted)}, got {got}"
                )
    if problems:
        raise ValueError(
            f"testdata schema drift at {sf_dir!r} — "
            f"{len(problems)} problem(s); fix the reader contract or "
            "regenerate the manifest (catalog.EXPECTED_DTYPES): "
            + "; ".join(problems)
        )


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the events table, normalizing ``ts`` across parquet layouts.

    Contract (everything downstream — queries.py ``events_*`` builders and
    streaming/events.py — depends on it): the returned frame exposes
      * ``ts``    TIMESTAMP (session tz, pinned UTC in session.py), and
      * ``ts_ns`` LONG nanoseconds-since-epoch,
    regardless of how the file stores the column. Two layouts are accepted:

      * ``timestamp[us]``/``timestamp[ns]`` parquet timestamps — current
        driver testdata. ``nanosAsLong`` (set before the read; a no-op for
        µs columns) surfaces ns columns as long so the read never throws;
        µs columns arrive as timestamp/timestamp_ntz and are cast to
        TIMESTAMP (micros-identity under the UTC session tz), with
        ``ts_ns = unix_micros(ts) * 1000``.
      * int64 nanoseconds — older layouts and tools/make_soak_sf1.py
        output. Converted with integer ``div``, not ``/``: ns epochs
        (~1.7e18) exceed double's 53-bit mantissa, so float division
        mis-rounds ~12% of rows by 1 µs and breaks bit parity with
        DuckDB's exact ns→µs truncation.

    Any other ``ts`` dtype fails HERE with a clear message rather than as
    dozens of cryptic downstream oracle errors (round-3 lesson).
    """
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    return normalize_events_ts(df, source=f"events.parquet at {sf_dir!r}")


def normalize_events_ts(df: DataFrame, source: str = "events") -> DataFrame:
    """Apply the read_events ts contract to an already-read events frame
    (shared by the batch reader above and streaming/events.py)."""
    ts_type = dict(df.dtypes).get("ts", "<missing>")
    if ts_type.startswith("timestamp"):
        ts = F.col("ts").cast("timestamp")
        return df.withColumn("ts_ns", F.unix_micros(ts) * F.lit(1000)).withColumn("ts", ts)
    if ts_type == "bigint":
        return df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    raise ValueError(
        f"{source}: unsupported ts dtype {ts_type!r}; "
        "expected a parquet timestamp or int64 nanoseconds "
        "(see read_events contract: downstream requires ts TIMESTAMP + ts_ns LONG)"
    )


def load_sf_dir(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> Catalog:
    """Build a Catalog over one driver testdata directory (TESTDATA.md).

    Parquet files are immutable, so the snapshot-consistency requirement the
    reference meets with REPEATABLE READ / BEGIN IMMEDIATE
    (xdump/postgresql.py:75-83, xdump/sqlite.py:63-65) holds for free; for
    mutable sources see sources/jdbc.py staging.
    """
    names = tables or TPCH_TABLES

    def loader(name: str) -> Callable[[], DataFrame]:
        if name == "events":
            return lambda: read_events(spark, sf_dir)
        return lambda: spark.read.parquet(f"{sf_dir}/{name}.parquet")

    # Lazy per table: one broken source fails only the queries that read it
    # (round-3 regression: an eager loop here turned one bad table into 50
    # red correctness entries).
    dfs = LazyTables({name: loader(name) for name in names})
    fks = [fk for fk in TPCH_FOREIGN_KEYS if fk.table in dfs and fk.foreign_table in dfs]
    pks = {t: c for t, c in TPCH_PRIMARY_KEYS.items() if t in dfs}
    return Catalog(dfs, fks, primary_keys=pks)
