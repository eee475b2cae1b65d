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


def mixture_drift_stream(
    docs: DataFrame,
    baseline: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Running composition drift of an ARRIVING stream against a static
    baseline snapshot: (source, counts after, counts/share before).

    The incremental mixture aggregate is stream-static LEFT-joined
    against the precomputed baseline mixture (tiny, one row per source —
    broadcast into every micro-batch). Share ratios need the stream-wide
    token total, which is not an incrementally-mergeable per-row value —
    the same constraint that makes ``mixture_stream`` defer its share
    division — so the DRIFT shares are a read-time projection: run
    :func:`finish_drift` over the (tiny) complete-mode result table.
    Baseline-only sources appear once the batch-side report runs
    (``curation.mixture_drift``); the stream carries keys it has seen.

    State: one row per source, same bound as ``mixture_stream``.
    """
    from xdump_spark.operators.curation import mixture_stats

    base = mixture_stats(baseline, part_col=source_col, text_col=text_col).select(
        F.col(source_col),
        F.col("n_docs").alias("n_docs_before"),
        F.col("n_tokens").alias("n_tokens_before"),
        F.col("token_share").alias("share_before"),
    )
    run = mixture_stream(docs, source_col=source_col, text_col=text_col).select(
        source_col,
        F.col("n_docs").alias("n_docs_after"),
        F.col("n_tokens").alias("n_tokens_after"),
    )
    return run.join(F.broadcast(base), source_col, "left").fillna(
        {"n_docs_before": 0, "n_tokens_before": 0, "share_before": 0.0}
    )


def finish_drift(drift_table: DataFrame) -> DataFrame:
    """Read-time share projection over a ``mixture_drift_stream`` result
    table (a BATCH frame — e.g. ``spark.table(<memory sink>)``): adds
    share_after and share_delta. |sources| rows through one window."""
    from pyspark.sql import Window as W

    total_after = F.sum("n_tokens_after").over(W.partitionBy())
    return (
        drift_table.withColumn(
            "share_after", F.round(F.col("n_tokens_after") / total_after, 6)
        )
        .withColumn(
            "share_delta",
            F.round(F.col("share_after") - F.col("share_before"), 6),
        )
    )


def dsir_score_stream(
    docs: DataFrame, model, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document DSIR importance log-weights over an ARRIVING stream —
    the ingest-side twin of ``operators.dsir.dsir_score``. The scoring is
    a stateless projection (broadcast model + one zero-shuffle Arrow
    pass), so the identical expression tree runs under append mode with
    NO state store; a production ingest scores documents on arrival and
    gates them with a threshold (keep ``dsir_logw >= tau``) — the
    Gumbel-top-k resampling step needs the full population and stays a
    batch job over the accumulated scores."""
    from xdump_spark.operators.dsir import dsir_score

    return dsir_score(docs, model, text_col=text_col, id_col=id_col)
