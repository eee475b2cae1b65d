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
    #: set by :func:`load_text_index` when the postings carry the
    #: ``_tbucket`` partition column — enables query-time bucket pruning
    n_tbuckets: int | None = None

    def save(self, path: str, n_tbuckets: int = 64) -> None:
        """Persist the index (see :func:`save_text_index`)."""
        save_text_index(self, path, n_tbuckets=n_tbuckets)

    @staticmethod
    def load(spark: SparkSession, path: str) -> "TextIndex":
        """Load a saved index (see :func:`load_text_index`)."""
        return load_text_index(spark, path)


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


_INDEX_MANIFEST = "index.json"


def save_text_index(index: TextIndex, path: str, n_tbuckets: int = 64) -> None:
    """Persist a :class:`TextIndex`: the docstring's "the index IS the
    storage format", made literal.

    Layout: ``postings/`` parquet PARTITIONED by ``_tbucket =
    pmod(xxhash64(term), n_tbuckets)`` — at query time the matched
    terms' buckets become a partition filter, so a 3-term query over a
    10 B-posting index opens ≤3 of ``n_tbuckets`` partition directories
    instead of all of them (plan-asserted in tests). ``term_stats/``
    plain parquet (it is broadcast-side anyway), and an atomic
    ``index.json`` manifest for the scalars — written LAST, so a
    half-written index (no manifest) is never loadable."""
    spark = index.postings.sparkSession
    from xdump_spark import fsutil

    (
        index.postings
        .withColumn("_tbucket", F.pmod(F.xxhash64("term"), F.lit(n_tbuckets)))
        .repartition(n_tbuckets, "_tbucket")
        .write.mode("overwrite").partitionBy("_tbucket")
        .parquet(fsutil.join(path, "postings"))
    )
    index.term_stats.write.mode("overwrite").parquet(
        fsutil.join(path, "term_stats")
    )
    import json

    fsutil.write_text_atomic(
        spark,
        fsutil.join(path, _INDEX_MANIFEST),
        json.dumps(
            {
                "version": 1,
                "n_docs": index.n_docs,
                "avgdl": index.avgdl,
                "id_col": index.id_col,
                "n_tbuckets": n_tbuckets,
            }
        ),
    )


def load_text_index(spark: SparkSession, path: str) -> TextIndex:
    """Load a :func:`save_text_index` index. The returned ``postings``
    frame keeps the ``_tbucket`` partition column — :func:`bm25_topk`
    uses it to prune the postings scan to the queried terms' buckets;
    every other consumer can ignore or drop it."""
    import json

    from xdump_spark import fsutil

    man = json.loads(
        fsutil.read_text(spark, fsutil.join(path, _INDEX_MANIFEST))
    )
    if man.get("version") != 1:
        raise ValueError(f"unsupported text-index version: {man.get('version')!r}")
    return TextIndex(
        postings=spark.read.parquet(fsutil.join(path, "postings")),
        term_stats=spark.read.parquet(fsutil.join(path, "term_stats")),
        n_docs=int(man["n_docs"]),
        avgdl=float(man["avgdl"]),
        id_col=man["id_col"],
        n_tbuckets=int(man["n_tbuckets"]),
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
    postings = index.postings
    if index.n_tbuckets and "_tbucket" in postings.columns:
        # loaded-index fast path: the queried terms name their hash
        # buckets, and the bucket set becomes a PARTITION filter on the
        # postings scan (one tiny driver job over the query terms buys
        # skipping n_tbuckets - |terms| partition dirs of a 100 TB index)
        buckets = [
            r.b
            for r in qt.select(
                F.pmod(F.xxhash64("term"), F.lit(index.n_tbuckets)).alias("b")
            ).distinct().collect()
        ]
        postings = postings.filter(
            F.col("_tbucket").isin(buckets) if buckets else F.lit(False)
        )
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
        postings.join(matched, "term")
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
