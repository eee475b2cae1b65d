"""A 'database' as a directory of parquet tables + optional fk_config.json
— the file-source backend of the engine (the reference's backends wrap
PostgreSQL/SQLite connections; ours wraps storage Spark reads natively).

Provides the maintenance surface the reference exposes per backend:
truncate (xdump/postgresql.py:212-214, sqlite.py:124-131) and recreate
(xdump/postgresql.py:203-210, sqlite.py:114-122).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from xdump_spark.catalog import Catalog, ForeignKey

FK_CONFIG = "fk_config.json"
SEQ_CONFIG = "sequences.json"


class ParquetDatabase:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # -- introspection (O9/O7 analog) -------------------------------------
    def tables(self) -> list[str]:
        if not os.path.isdir(self.path):
            return []
        out = []
        for name in sorted(os.listdir(self.path)):
            p = os.path.join(self.path, name)
            if os.path.isdir(p) or name.endswith(".parquet"):
                out.append(name.removesuffix(".parquet"))
        return out

    def foreign_keys(self) -> list[ForeignKey]:
        cfg = os.path.join(self.path, FK_CONFIG)
        if not os.path.exists(cfg):
            return []
        with open(cfg) as f:
            return [ForeignKey.from_dict(d) for d in json.load(f)]

    def catalog(self) -> Catalog:
        # A missing source must be an ERROR, not an empty catalog — a
        # typo'd path would otherwise dump an empty archive that loads
        # "successfully" (reference parity: connecting to a non-existent
        # database fails, tests/test_backend.py test_non_existent_db).
        if not os.path.isdir(self.path):
            raise FileNotFoundError(
                f"parquet database directory does not exist: {self.path!r}"
            )
        dfs: dict[str, DataFrame] = {}
        for name in self.tables():
            p = os.path.join(self.path, name)
            if not os.path.isdir(p):
                p = os.path.join(self.path, f"{name}.parquet")
            dfs[name] = self.spark.read.parquet(p)
        return Catalog(
            dfs,
            [
                fk
                for fk in self.foreign_keys()
                if fk.table in dfs and fk.foreign_table in dfs
            ],
        )

    # -- maintenance (O16/O17 analog) -------------------------------------
    def truncate(self, tables: list[str] | None = None) -> None:
        for name in tables if tables is not None else self.tables():
            p = os.path.join(self.path, name)
            if os.path.isdir(p):
                shutil.rmtree(p)
            fp = os.path.join(self.path, f"{name}.parquet")
            if os.path.isfile(fp):
                os.remove(fp)

    def recreate(self) -> None:
        if os.path.isdir(self.path):
            shutil.rmtree(self.path)
        os.makedirs(self.path, exist_ok=True)

    def load_tables(
        self, frames: dict[str, DataFrame], order: list[str], mode: str = "overwrite"
    ) -> None:
        """Backend load hook the CLI drives: write frames in FK order."""
        for table in order:
            frames[table].write.mode(mode).parquet(os.path.join(self.path, table))

    def write_fk_config(self, fks: list[ForeignKey]) -> None:
        os.makedirs(self.path, exist_ok=True)
        with open(os.path.join(self.path, FK_CONFIG), "w") as f:
            json.dump([fk.to_dict() for fk in fks], f, indent=2)

    # -- sequence counters (O13 replay; reference xdump/base.py:227-237) --
    def sequences(self) -> dict[str, int]:
        """Per-table LAST-USED serial key (same convention as
        ``engine.sequence_state``: the dumped value is the max key)."""
        cfg = os.path.join(self.path, SEQ_CONFIG)
        if not os.path.exists(cfg):
            return {}
        with open(cfg) as f:
            return {t: int(v) for t, v in json.load(f).items()}

    def write_sequences(self, sequences: dict[str, int]) -> None:
        os.makedirs(self.path, exist_ok=True)
        with open(os.path.join(self.path, SEQ_CONFIG), "w") as f:
            json.dump({t: int(v) for t, v in sequences.items()}, f, indent=2)

    def allocate_keys(self, table: str, n: int = 1) -> list[int]:
        """Hand out the next ``n`` serial keys for ``table`` and persist
        the advanced counter — the insert-after-load path that proves the
        replayed sequence state continues numbering (the reference's
        currval test, tests/test_backend.py:138-140)."""
        seq = self.sequences()
        last = seq.get(table, 0)
        keys = list(range(last + 1, last + n + 1))
        seq[table] = last + n
        self.write_sequences(seq)
        return keys
