"""xdump_spark — a PySpark-native engine with the query/data-processing
capabilities of Stranger6667/xdump (reference: /root/reference), re-designed
Spark-first.

The reference produces consistent partial database dumps by computing the
transitive closure of rows reachable via foreign keys from seed queries
(reference: xdump/base.py:87-106). It delegates execution to PostgreSQL /
SQLite via SQL string rewriting. This engine replaces the host database with
Spark: seeds are Spark SQL, the FK closure is a semi-naive key-set
propagation over DataFrames, and export/load are DataFrame reads/writes.

Layout:
    catalog     — tables + FK-edge metadata (the reference's only metadata)
    planner     — FK fixed-point closure (semi-join / union / recursive CTE)
    engine      — dump/load orchestration, archive format
    operators   — dedup / similarity / text-analysis / multimodal extensions
    sources     — parquet / CSV-with-manifest / JDBC connectors
    streaming   — Structured Streaming ingestion of event tables
"""

from xdump_spark.catalog import Catalog, ForeignKey, TPCH_FOREIGN_KEYS, load_sf_dir
from xdump_spark.engine import SparkDumpEngine
from xdump_spark.pipeline import prepare_training_corpus
from xdump_spark.planner.closure import compute_closure

__version__ = "0.1.0"

__all__ = [
    "Catalog",
    "ForeignKey",
    "SparkDumpEngine",
    "TPCH_FOREIGN_KEYS",
    "load_sf_dir",
    "compute_closure",
    "prepare_training_corpus",
    "__version__",
]
