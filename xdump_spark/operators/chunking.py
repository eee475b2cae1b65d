"""Document chunking: split long documents into bounded-token pieces.

Context windows are the unit everything downstream consumes — RAG
retrieval, embedding models, eval harnesses, and any trainer whose
sequence budget is smaller than a crawl document. The reference engine
has no text surface at all (it dumps relational rows); this module is
corpus-side extension scope like operators/text.py, and the counterpart
of ``curation.pack_sequences``: packing CONCATENATES short docs up to a
budget, chunking SPLITS long docs down to one.

Two chunkers, both budgeted in whitespace tokens (the same boundaries
as ``text.tokens``, so chunk budgets line up with every token-count
gate — but chunk TEXT preserves the original casing; only counting
normalizes):

* ``chunk_tokens`` — fixed stride: windows of exactly ``max_tokens``
  with ``overlap`` carried between neighbors. Pure per-row codegen
  (sequence → transform → slice → array_join): ZERO shuffles, any
  corpus size, the plan is a single Project. The chunker for embedding
  and RAG ingestion where exact budgets matter.
* ``chunk_sentences`` — sentence-aware soft budget: sentences are never
  split; each sentence goes to chunk ``floor(preceding_tokens /
  max_tokens)``, so a chunk can overrun the budget by at most one
  sentence (documented soft contract — the greedy packer's behavior
  without its sequential loop). One explode + one window cumsum + one
  groupBy per call: two shuffles of SENTENCE rows, never full text
  re-shuffles beyond the doc key.

Both emit (id, chunk_idx, chunk_text, n_tokens) with deterministic
``chunk_idx`` ordering, so downstream joins and re-assembly are stable
under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from xdump_spark.operators.text import tokens

#: Sentence boundary: ./!/? (optionally quoted/parenthesized) followed by
#: whitespace-then-capital, or a newline. Deliberately regex-simple (like
#: TOKEN_SEP in retrieval.py) so an external system can reproduce the
#: boundaries; abbreviation-perfect splitting is a model, not a regex.
SENTENCE_SPLIT = r"(?<=[.!?][\"')\]]?)\s+(?=[A-Z0-9\"'(])|\n+"


def split_sentences(text: Column) -> Column:
    """array<string> of trimmed, non-empty sentences. Pure codegen."""
    return F.filter(
        F.transform(F.split(text, SENTENCE_SPLIT, -1), lambda s: F.trim(s)),
        lambda s: F.length(s) > 0,
    )


def chunk_tokens(
    df: DataFrame,
    max_tokens: int = 512,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-stride token windows: chunk ``i`` covers tokens
    ``[i*(max_tokens-overlap), i*(max_tokens-overlap)+max_tokens)``.
    Every chunk except possibly the last has exactly ``max_tokens``
    tokens; consecutive chunks share ``overlap`` tokens; every token
    appears in at least one chunk; empty docs produce no rows.

    Scale shape: one Project — the token array, the chunk-index
    sequence, and the slices are all per-row expressions, so the
    operator has NO exchange and runs inside WholeStageCodegen at any
    corpus size.
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"need 0 <= overlap < max_tokens, got overlap={overlap} "
            f"max_tokens={max_tokens}"
        )
    stride = max_tokens - overlap
    # case-PRESERVING whitespace split (same boundaries/count as
    # text.tokens, which lowercases for counting only)
    t = F.trim(F.col(text_col))
    toks = F.when(
        F.length(t) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(t, r"\s+"))
    n = F.size(toks)
    # number of stride-starts needed to cover n tokens: ceil over the
    # tokens past the first window, minimum 1 chunk for non-empty docs
    n_chunks = F.when(n <= max_tokens, F.lit(1)).otherwise(
        F.lit(1) + F.ceil((n - F.lit(max_tokens)) / F.lit(stride)).cast("int")
    )
    chunked = (
        df.select(
            F.col(id_col).alias("id"),
            toks.alias("_toks"),
            n.alias("_n"),
            n_chunks.alias("_nc"),
        )
        .filter(F.col("_n") > 0)
        .select(
            "id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.col("_nc") - 1),
                    lambda i: F.struct(
                        i.alias("chunk_idx"),
                        F.slice(
                            F.col("_toks"), i * stride + 1, max_tokens
                        ).alias("ts"),
                    ),
                )
            ).alias("c"),
        )
        .select(
            F.col("id").alias(id_col),
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.array_join(F.col("c.ts"), " ").alias("chunk_text"),
            F.size(F.col("c.ts")).alias("n_tokens"),
        )
    )
    return chunked


def chunk_sentences(
    df: DataFrame,
    max_tokens: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sentence-aware chunks: sentences stay whole, assigned to chunk
    ``floor(tokens_before_this_sentence / max_tokens)`` — chunks fill to
    the budget and may overrun by less than one sentence (a sentence
    longer than the whole budget gets its own chunk). Returns
    (id, chunk_idx, chunk_text, n_tokens); chunk_idx is dense from 0 in
    document order.

    Scale shape: explode to sentence rows (narrow: id + sentence), one
    window cumsum partitioned by doc, one groupBy(doc, chunk) that
    re-joins sentences via ``sort_array`` of (pos, sentence) structs —
    deterministic under any partitioning, and the window partitions are
    bounded by the longest single DOCUMENT's sentence count, not the
    corpus.
    """
    sent = (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(split_sentences(F.col(text_col))).alias("pos", "s"),
        )
        .withColumn("_nt", F.size(tokens(F.col("s"))))
    )
    w = Window.partitionBy("id").orderBy("pos")
    assigned = sent.withColumn(
        "_before", F.coalesce(F.sum("_nt").over(w) - F.col("_nt"), F.lit(0))
    ).withColumn("_bucket", F.floor(F.col("_before") / F.lit(max_tokens)))
    out = (
        assigned.groupBy("id", "_bucket")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "s"))),
                    lambda st: st["s"],
                ),
                " ",
            ).alias("chunk_text"),
            F.sum("_nt").alias("n_tokens"),
            F.min("pos").alias("_first"),
        )
    )
    dense = Window.partitionBy("id").orderBy("_first")
    return out.select(
        F.col("id").alias(id_col),
        (F.row_number().over(dense) - 1).alias("chunk_idx"),
        "chunk_text",
        F.col("n_tokens").cast("int").alias("n_tokens"),
    )
