"""Streaming corpus monitor: the curation layer's statistics maintained
incrementally over an ARRIVING document stream.

The batch curation operators (operators/curation.py) are deliberately
expressible as commutative aggregations, so their streaming twins are the
same expressions under a streaming groupBy — no operator rewrite, which
is the whole point of keeping the hot path declarative. Two surfaces:

- ``mixture_stream``: running per-source doc/token counts (the streaming
  twin of ``mixture_stats``'s first stage; the share division happens at
  read time because a ratio is not incrementally mergeable by itself).
- ``quality_monitor_stream``: running per-language aggregates of the
  repetition/quality signals (mean TTR, mean top-token dominance, doc
  count) — the drift detector a production ingest runs alongside dedup.

State is one row per source/lang key in the state store — bounded by key
cardinality, never by stream length. At 100 TB/day the identical code
runs on a Kafka source; only the reader changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mixture_stream(docs: DataFrame, source_col: str = "source", text_col: str = "text") -> DataFrame:
    """Running (source, n_docs, n_tokens) over a document stream.
    Complete-mode aggregate; token share = n_tokens / sum(n_tokens) is a
    read-time projection over the tiny result table."""
    return docs.groupBy(source_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.trim(F.col(text_col)), r"\s+"))).alias("n_tokens"),
    )


def quality_monitor_stream(
    docs: DataFrame, lang_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """Running per-language quality aggregates: (lang, n_docs,
    mean_ttr, mean_top_frac). The per-doc signal expressions are inlined
    (same formulas as operators/curation.repetition_frame) so the stream
    needs NO join against a batch frame and state stays one row per
    language."""
    t = F.split(F.trim(F.col(text_col)), r"\s+")
    pre = docs.select(
        F.col(lang_col),
        t.alias("_t"),
    ).filter(F.size("_t") > 0)
    n = F.size("_t")
    distinct = F.array_distinct(F.col("_t"))
    top = F.array_max(
        F.transform(distinct, lambda x: F.size(F.filter(F.col("_t"), lambda y: y == x)))
    )
    per_doc = pre.select(
        F.col(lang_col),
        (F.size(distinct) / n).alias("_ttr"),
        (top / n).alias("_topf"),
    )
    return per_doc.groupBy(lang_col).agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("_ttr"), 6).alias("mean_ttr"),
        F.round(F.avg("_topf"), 6).alias("mean_top_frac"),
    )
