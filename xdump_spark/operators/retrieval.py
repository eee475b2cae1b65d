"""BM25 keyword retrieval over a distributed inverted index.

The training-data counterpart of "grep the corpus": given keyword
queries, rank documents by Okapi BM25. At 100 TB this is how a corpus
owner answers "show me the documents about X" without a serving stack —
the index is a parquet-able DataFrame, the query is two broadcast joins
and one aggregation, and the per-query result is top-k.

Extension scope (the reference engine, a relational dump tool, has no
retrieval surface — SURVEY.md §2 extensions). Public algorithm:
Robertson/Spärck Jones Okapi BM25 with the Lucene non-negative idf,
``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``.

Scale design:

* The index is built in ONE pass over the text: tokenize (codegen regex
  split — no Python), explode, map-side-combinable ``groupBy(term, id)``.
  Document length ``dl`` is DENORMALIZED into the posting row (+8 bytes)
  so the query path never joins a doc-stats table.
* Query scoring never scans text. ``postings ⋈ B(term_stats ⋈ B(queries))``
  — the query set broadcasts into the term-stats scan, the tiny matched
  term set (|query terms| rows, with df attached) broadcasts into the
  postings scan. One shuffle total: the (query, doc) score aggregation.
* Top-k per query goes through ``skew.topk_per_key`` — a stopword-ish
  query term can match most of the corpus, and a plain window would put
  every candidate for that query in one task.
* The tokenizer array is pre-projected behind ``sizing.pushdown_barrier``:
  exploding a derived array makes Catalyst infer a ``size(col) > 0``
  filter and push it below the projection, re-inlining the split per
  reference (the Spark-4 trap measured at 15-50× elsewhere in this repo).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xdump_spark.operators.sizing import pushdown_barrier
from xdump_spark.operators.skew import topk_per_key

#: Lowercase alphanumeric terms; everything else is a separator. Kept
#: deliberately simple so an external system (the DuckDB oracle, a
#: serving layer) can reproduce term boundaries bit-for-bit.
TOKEN_SEP = "[^a-z0-9]+"


def terms_of(col) -> "F.Column":
    """Query/document tokenizer: lowercase, split on non-alphanumerics,
    drop empties. Pure codegen (no UDF)."""
    return F.filter(
        F.split(F.lower(col), TOKEN_SEP, -1), lambda t: F.length(t) > 0
    )


@dataclass
class TextIndex:
    """A built inverted index.

    ``postings``  — (term, id, tf, dl): one row per distinct (term, doc).
    ``term_stats`` — (term, df): document frequency per term.
    ``n_docs`` / ``avgdl`` — corpus scalars (docs with zero terms count).

    Both frames are plain DataFrames: persist them with
    ``write.partitionBy`` / bucketing like any other table — the index IS
    the storage format, there is no serving process to keep alive.
    """

    postings: DataFrame
    term_stats: DataFrame
    n_docs: int
    avgdl: float
    id_col: str = "doc_id"


def build_text_index(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> TextIndex:
    """One pass over the text → inverted index (see module docstring).

    Zero-term documents (empty/whitespace text) produce no postings but
    still count toward ``n_docs`` and ``avgdl`` — BM25's length prior is
    over the corpus, not over the matchable subset.
    """
    toks = docs.select(
        F.col(id_col).alias("id"),
        pushdown_barrier(terms_of(F.col(text_col))).alias("_toks"),
    )
    stats = toks.agg(
        F.count("*").alias("n"), F.avg(F.size("_toks")).alias("avgdl")
    ).collect()[0]
    base = toks.select(
        "id", F.size("_toks").alias("dl"), F.explode("_toks").alias("term")
    )
    postings = base.groupBy("term", "id").agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl")
    )
    term_stats = postings.groupBy("term").agg(F.count("*").alias("df"))
    return TextIndex(
        postings=postings,
        term_stats=term_stats,
        n_docs=int(stats["n"]),
        avgdl=float(stats["avgdl"] or 0.0),
        id_col=id_col,
    )


def bm25_topk(
    index: TextIndex,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    n_salt: int = 16,
) -> DataFrame:
    """Top-``k`` documents per query by Okapi BM25.

    ``queries`` is (query_id, query); repeated query terms weight their
    contribution by query-term frequency (the classic third factor with
    k3→∞). Returns (query_id, doc_id, score, rnk). Each per-term
    contribution is quantized to DECIMAL(20,6) before summation — decimal
    addition is associative, so the score (and therefore the ranking,
    which ties-breaks on doc id ascending) is bit-identical under ANY
    partitioning or aggregation order; a raw double sum is not (the
    repo-wide ``_msum`` float policy, queries.py:10-17).

    Plan: two broadcast joins + one groupBy + salted top-k — see module
    docstring for why each hop is shaped this way.
    """
    qt = (
        queries.select(
            "query_id", F.explode(terms_of(F.col("query"))).alias("term")
        )
        .groupBy("query_id", "term")
        .agg(F.count("*").alias("qtf"))
    )
    matched = F.broadcast(index.term_stats.join(F.broadcast(qt), "term"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(index.n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tf_norm = (
        F.col("tf")
        * (k1 + 1.0)
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("dl") / F.lit(float(index.avgdl or 1.0)))
        )
    )
    scored = (
        index.postings.join(matched, "term")
        .select(
            "query_id",
            F.col("id").alias(index.id_col),
            (F.col("qtf") * idf * tf_norm).alias("_part"),
        )
        .groupBy("query_id", index.id_col)
        .agg(
            F.sum(F.col("_part").cast("decimal(20,6)"))
            .cast("double")
            .alias("score")
        )
    )
    return topk_per_key(
        scored,
        "query_id",
        [F.desc("score"), F.col(index.id_col)],
        k,
        n_salt=n_salt,
        rn_col="rnk",
    )


def bm25_search(
    spark: SparkSession,
    docs: DataFrame,
    query_strings: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """Convenience one-shot: build the index and run literal query
    strings (query_id = position). For repeated querying, build the
    index once with :func:`build_text_index` and persist it."""
    queries = spark.createDataFrame(
        [(i, q) for i, q in enumerate(query_strings)], "query_id int, query string"
    )
    index = build_text_index(docs, text_col=text_col, id_col=id_col)
    return bm25_topk(index, queries, k=k, **kwargs)
