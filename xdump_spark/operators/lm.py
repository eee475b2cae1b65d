"""Trained n-gram language model with Stupid Backoff scoring — the
CCNet-style perplexity quality filter, distributed the way the model was
born to be.

Stupid Backoff (Brants et al. 2007, "Large Language Models in Machine
Translation") was designed FOR distributed n-gram counting: no
discounting pass over the full count tables, no held-out EM — the score
is a pure function of raw counts, so training is exactly the shuffle
Spark already does best (explode → groupBy → count, map-side combined),
and scoring is a handful of joins. CCNet (Wenzek et al. 2020) filters
Common Crawl by LM perplexity and buckets documents head/middle/tail;
this module reproduces that shape with a self-contained model instead of
an external KenLM binary.

Score of a token ``w`` after context ``(u, v)``::

    S(w | u, v) = c(uvw) / c(uv)          if c(uvw) > 0
                = alpha * S(w | v)         otherwise
    S(w | v)    = c(vw) / c(v)             if c(vw) > 0
                = alpha * S(w)             otherwise
    S(w)        = (c(w) + 1) / (N + V)     (add-one floor: OOV scores
                                            finite, matching
                                            curation.unigram_surprisal_frame)

with ``alpha = 0.4`` (the paper's constant). The first token of a
document is scored at the unigram level, the second at the bigram level
— no synthetic <s> padding, consistent with the surprisal frames.

Scale: training is one tokenize pass producing all three orders
(map-side-combinable groupBys — the corpus shuffles gram keys, never
documents); ``prune_min_count`` drops singleton trigrams/bigrams the way
every web-scale n-gram release does (Brants §3: count cutoffs), bounding
the model. Scoring BROADCASTs the model when bounded (five
BroadcastHashJoins, corpus never shuffles) or, for an unpruned
corpus-sized model, shuffle-joins on the gram key (``broadcast=False``).
Fit on a reference corpus / sample — scoring 100 TB against a model fit
on a curated 100 GB slice is the CCNet deployment exactly.

No reference analog (extension operator; the reference engine
`/root/reference` has no text pipeline).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xdump_spark import fsutil
from xdump_spark.operators.sizing import spread
from xdump_spark.operators.text import tokens, tokens_sql

ALPHA = 0.4

_MANIFEST = "_lm_manifest.json"


@dataclass(frozen=True)
class NgramLM:
    """Count tables of a trained model. ``unigrams`` (w, n), ``bigrams``
    (u, w, n), ``trigrams`` (u, v, w, n); ``n_tokens`` = N (total
    training tokens), ``vocab_size`` = V (distinct tokens). Counts are
    RAW (Stupid Backoff needs no discounting)."""

    unigrams: DataFrame
    bigrams: DataFrame
    trigrams: DataFrame
    n_tokens: int
    vocab_size: int
    alpha: float = ALPHA


def _grams(toked: DataFrame, order: int) -> DataFrame:
    """(u?, v?, w) consecutive n-grams of ``_toks``, exploded."""
    if order == 1:
        return toked.select(F.explode("_toks").alias("w"))
    if order == 2:
        pair = F.transform(
            F.sequence(F.lit(0), F.size("_toks") - F.lit(2)),
            lambda i: F.struct(
                F.element_at("_toks", i + F.lit(1)).alias("u"),
                F.element_at("_toks", i + F.lit(2)).alias("w"),
            ),
        )
        return (
            toked.filter(F.size("_toks") >= 2)
            .select(F.explode(pair).alias("p"))
            .select("p.u", "p.w")
        )
    tri = F.transform(
        F.sequence(F.lit(0), F.size("_toks") - F.lit(3)),
        lambda i: F.struct(
            F.element_at("_toks", i + F.lit(1)).alias("u"),
            F.element_at("_toks", i + F.lit(2)).alias("v"),
            F.element_at("_toks", i + F.lit(3)).alias("w"),
        ),
    )
    return (
        toked.filter(F.size("_toks") >= 3)
        .select(F.explode(tri).alias("p"))
        .select("p.u", "p.v", "p.w")
    )


def train_ngram_lm(
    df: DataFrame,
    text_col: str = "text",
    prune_min_count: int = 1,
    alpha: float = ALPHA,
) -> NgramLM:
    """Fit trigram/bigram/unigram counts on ``df[text_col]`` (shared
    whitespace tokenizer). ``prune_min_count`` > 1 drops bigrams and
    trigrams below the cutoff (Brants-style count cutoff — bounds the
    model for broadcast); unigram counts are never pruned (they are the
    backoff floor and are bounded by V already). N and V are computed
    BEFORE pruning, so pruning changes only which orders back off, not
    the base distribution."""
    toked = spread(df.select(F.col(text_col).alias("_text"))).select(
        tokens(F.col("_text")).alias("_toks")
    )
    toked = toked.filter(F.size("_toks") > 0)
    uni = _grams(toked, 1).groupBy("w").agg(F.count("*").alias("n"))
    bi = _grams(toked, 2).groupBy("u", "w").agg(F.count("*").alias("n"))
    tri = _grams(toked, 3).groupBy("u", "v", "w").agg(F.count("*").alias("n"))
    if prune_min_count > 1:
        bi = bi.filter(F.col("n") >= prune_min_count)
        tri = tri.filter(F.col("n") >= prune_min_count)
    # Materialize the count tables NOW (localCheckpoint truncates the
    # lineage back to the raw corpus): scoring builds FIVE lookup
    # broadcasts from these frames, and without this each broadcast
    # would re-run the whole training aggregation — five training
    # passes per scoring query. The totals agg rides uni's
    # materialization; unigrams are never pruned, so N/V are pre-prune
    # by construction.
    uni = uni.localCheckpoint(eager=False)
    bi = bi.localCheckpoint(eager=False)
    tri = tri.localCheckpoint(eager=False)
    t = uni.agg(F.sum("n").alias("nn"), F.count("*").alias("vv")).first()
    n_tokens = int(t["nn"] or 0)
    vocab_size = int(t["vv"] or 0)
    return NgramLM(
        unigrams=uni,
        bigrams=bi,
        trigrams=tri,
        n_tokens=n_tokens,
        vocab_size=vocab_size,
        alpha=alpha,
    )


def save_ngram_lm(lm: NgramLM, path: str) -> None:
    """Persist the model: one parquet dir per order + a scalars manifest
    (written LAST — a partial write leaves no readable model). When
    OVERWRITING an existing model the old manifest is deleted FIRST:
    otherwise it would keep serving its stale N/V scalars over
    half-rewritten count tables if the save crashes mid-way — the
    invalidate-then-rewrite-then-commit order makes a crashed re-save
    unreadable, same as a crashed first save."""
    spark = lm.unigrams.sparkSession
    fsutil.delete(spark, fsutil.join(path, _MANIFEST))
    lm.unigrams.write.mode("overwrite").parquet(fsutil.join(path, "unigrams"))
    lm.bigrams.write.mode("overwrite").parquet(fsutil.join(path, "bigrams"))
    lm.trigrams.write.mode("overwrite").parquet(fsutil.join(path, "trigrams"))
    fsutil.write_text_atomic(
        spark,
        fsutil.join(path, _MANIFEST),
        json.dumps(
            {
                "n_tokens": lm.n_tokens,
                "vocab_size": lm.vocab_size,
                "alpha": lm.alpha,
                "tokenizer": "whitespace_lower",
            }
        ),
    )


def load_ngram_lm(spark: SparkSession, path: str) -> NgramLM:
    """Load a saved model; raises if the manifest is missing (a crashed
    save is not a model)."""
    man_path = fsutil.join(path, _MANIFEST)
    if not fsutil.exists_atomic(spark, man_path):
        raise FileNotFoundError(
            f"no LM manifest at {man_path} — save_ngram_lm did not complete"
        )
    man = json.loads(fsutil.read_text_atomic(spark, man_path))
    return NgramLM(
        unigrams=spark.read.parquet(fsutil.join(path, "unigrams")),
        bigrams=spark.read.parquet(fsutil.join(path, "bigrams")),
        trigrams=spark.read.parquet(fsutil.join(path, "trigrams")),
        n_tokens=int(man["n_tokens"]),
        vocab_size=int(man["vocab_size"]),
        alpha=float(man["alpha"]),
    )


def lm_score(
    df: DataFrame,
    lm: NgramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast: bool = True,
) -> DataFrame:
    """Per-document Stupid-Backoff surprisal: (id, n_tokens,
    mean_surprisal, ppl) where mean_surprisal = mean over positions of
    −ln S(w|context) and ppl = exp(mean_surprisal). Empty documents
    drop (no position to score).

    ``broadcast=True`` (default): all five count lookups are broadcast
    hash joins — the corpus is scanned once and never shuffled before
    the per-doc re-aggregation. Use for pruned / reference-corpus
    models. ``broadcast=False``: shuffle joins on the gram keys for a
    model too large to broadcast; same result, pinned by test.
    """
    b = F.broadcast if broadcast else (lambda d: d)
    # expressions as SQL text (r14): the Column-API form of the position
    # transform + backoff CASE chain measured ~1.3 s of driver build per
    # call (1.3k py4j round trips); the identical expressions parsed
    # JVM-side are ~ms, plan and results unchanged (lockstep-pinned in
    # tests/test_lm.py against the DuckDB backoff oracle)
    pos_arr = (
        "transform(sequence(1, size(_toks)), i -> named_struct("
        "'u', CASE WHEN i >= 3 THEN element_at(_toks, i - 2) END, "
        "'v', CASE WHEN i >= 2 THEN element_at(_toks, i - 1) END, "
        "'w', element_at(_toks, i)))"
    )
    pos = (
        spread(df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_text")))
        .selectExpr("id", tokens_sql("_text") + " AS _toks")
        .filter(F.size("_toks") > 0)
        .selectExpr("id", "size(_toks) AS _nt", f"explode({pos_arr}) AS p")
        .select("id", "_nt", "p.u", "p.v", "p.w")
    )
    tri = lm.trigrams.select("u", "v", "w", F.col("n").alias("_c_uvw"))
    bi_uv = lm.bigrams.select(
        F.col("u").alias("u"), F.col("w").alias("v"), F.col("n").alias("_c_uv")
    )
    bi_vw = lm.bigrams.select(
        F.col("u").alias("v"), F.col("w").alias("w"), F.col("n").alias("_c_vw")
    )
    uni_v = lm.unigrams.select(F.col("w").alias("v"), F.col("n").alias("_c_v"))
    uni_w = lm.unigrams.select("w", F.col("n").alias("_c_w"))
    scored = (
        pos.join(b(tri), ["u", "v", "w"], "left")
        .join(b(bi_uv), ["u", "v"], "left")
        .join(b(bi_vw), ["v", "w"], "left")
        .join(b(uni_v), ["v"], "left")
        .join(b(uni_w), ["w"], "left")
    )
    # numeric literals: integer denominators stay integral (SQL `/` on
    # them is double division, same as the Column form); alpha uses the
    # `D` double-literal suffix so the multiplier is the identical
    # float64 the Column form's F.lit(alpha) produced
    alpha = f"{lm.alpha!r}D"
    s1 = f"(coalesce(_c_w, 0) + 1) / {lm.n_tokens + lm.vocab_size}"
    s2 = (
        "CASE WHEN _c_vw IS NOT NULL AND _c_v IS NOT NULL "
        f"THEN _c_vw / _c_v ELSE {alpha} * ({s1}) END"
    )
    s3 = (
        "CASE WHEN _c_uvw IS NOT NULL AND _c_uv IS NOT NULL "
        f"THEN _c_uvw / _c_uv ELSE {alpha} * ({s2}) END"
    )
    s = (
        f"CASE WHEN u IS NOT NULL THEN {s3} "
        f"WHEN v IS NOT NULL THEN {s2} ELSE {s1} END"
    )
    return (
        scored.withColumn("_s", F.expr(f"-ln({s})"))
        .groupBy(F.col("id").alias(id_col), F.col("_nt").cast("long").alias("n_tokens"))
        .agg(F.round(F.avg("_s"), 6).alias("mean_surprisal"))
        .withColumn("ppl", F.round(F.exp("mean_surprisal"), 4))
    )


def duckdb_backoff_sql(
    train_select: str, score_select: str, alpha: float = ALPHA
) -> str:
    """Independent DuckDB recomputation of :func:`lm_score` (same
    tokenizer, same backoff chain, same rounding) — the oracle twin.
    ``train_select`` / ``score_select`` are SELECTs producing
    (doc_id, text)."""
    from xdump_spark.operators.text import DUCKDB_TOKS_SQL as toks
    return rf"""
WITH tt AS (
  SELECT t FROM (SELECT {toks} AS t FROM ({train_select})) WHERE len(t) > 0
),
uni AS (
  SELECT w, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT unnest(t) AS w FROM tt) GROUP BY 1
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(count(*) AS BIGINT) AS vv FROM uni),
bi AS (
  SELECT p['u'] AS u, p['w'] AS w, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT unnest(list_transform(generate_series(1, len(t) - 1),
        i -> {{'u': t[i], 'w': t[i + 1]}})) AS p FROM tt WHERE len(t) >= 2)
  GROUP BY 1, 2
),
tri AS (
  SELECT p['u'] AS u, p['v'] AS v, p['w'] AS w, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT unnest(list_transform(generate_series(1, len(t) - 2),
        i -> {{'u': t[i], 'v': t[i + 1], 'w': t[i + 2]}})) AS p FROM tt WHERE len(t) >= 3)
  GROUP BY 1, 2, 3
),
st AS (
  SELECT doc_id, t FROM (SELECT doc_id, {toks} AS t FROM ({score_select}))
  WHERE len(t) > 0
),
pos AS (
  SELECT doc_id, len(t) AS nt,
    CASE WHEN i >= 3 THEN t[i - 2] END AS u,
    CASE WHEN i >= 2 THEN t[i - 1] END AS v,
    t[i] AS w
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i FROM st)
),
j AS (
  SELECT pos.doc_id, pos.nt, pos.u, pos.v, pos.w,
         tri.n AS c_uvw, b1.n AS c_uv, b2.n AS c_vw, u1.n AS c_v, u2.n AS c_w,
         tot.nn, tot.vv
  FROM pos
  LEFT JOIN tri ON pos.u = tri.u AND pos.v = tri.v AND pos.w = tri.w
  LEFT JOIN bi b1 ON pos.u = b1.u AND pos.v = b1.w
  LEFT JOIN bi b2 ON pos.v = b2.u AND pos.w = b2.w
  LEFT JOIN uni u1 ON pos.v = u1.w
  LEFT JOIN uni u2 ON pos.w = u2.w
  CROSS JOIN tot
),
s AS (
  SELECT doc_id, nt,
    CASE
      WHEN u IS NOT NULL THEN
        CASE WHEN c_uvw IS NOT NULL AND c_uv IS NOT NULL THEN c_uvw / c_uv
             ELSE {alpha} * (
               CASE WHEN c_vw IS NOT NULL AND c_v IS NOT NULL THEN c_vw / c_v
                    ELSE {alpha} * ((COALESCE(c_w, 0) + 1) / (nn + vv)) END)
        END
      WHEN v IS NOT NULL THEN
        CASE WHEN c_vw IS NOT NULL AND c_v IS NOT NULL THEN c_vw / c_v
             ELSE {alpha} * ((COALESCE(c_w, 0) + 1) / (nn + vv)) END
      ELSE (COALESCE(c_w, 0) + 1) / (nn + vv)
    END AS sc
  FROM j
)
SELECT doc_id, CAST(nt AS BIGINT) AS n_tokens,
       ROUND(avg(-ln(sc)), 6) AS mean_surprisal
FROM s GROUP BY 1, 2
"""


def perplexity_buckets(
    scored: DataFrame,
    col: str = "ppl",
    id_col: str = "doc_id",
    n_buckets: int = 3,
    labels: tuple = ("head", "middle", "tail"),
) -> DataFrame:
    """CCNet's head/middle/tail split: equal-count buckets by ascending
    perplexity (head = most-natural text), deterministic tie-break on
    id. Returns ``scored`` + (bucket_idx, bucket). A global ntile is a
    single-partition sort of the SCORED frame (one narrow row per doc,
    not the corpus) — for 100 TB-scale scoring use quantile cutoffs from
    ``approxQuantile`` on a sample instead; this exact form is the
    oracle-matching reference semantics."""
    if n_buckets != len(labels):
        raise ValueError(
            f"{n_buckets} buckets need {n_buckets} labels, got {len(labels)}"
        )
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col(col).asc(), F.col(id_col).asc())
    out = scored.withColumn("bucket_idx", F.ntile(n_buckets).over(w))
    label = F.element_at(
        F.array(*[F.lit(x) for x in labels]), F.col("bucket_idx")
    )
    return out.withColumn("bucket", label)


def ppl_cutoffs(
    scored: DataFrame,
    col: str = "ppl",
    n_buckets: int = 3,
    relative_error: float = 0.001,
) -> list:
    """The 100 TB path to bucket boundaries: ``approxQuantile``
    (Greenwald-Khanna, one pass, no global sort) instead of the exact
    ntile. Returns ``n_buckets − 1`` ascending cutoffs. CCNet computes
    its head/middle/tail thresholds once per language from a sample and
    reuses them across crawl snapshots — compute these once, pass them
    to :func:`bucket_by_cutoffs` forever after."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    return scored.approxQuantile(col, probs, relative_error)


def bucket_by_cutoffs(
    scored: DataFrame,
    cutoffs: list,
    col: str = "ppl",
    labels: tuple = ("head", "middle", "tail"),
) -> DataFrame:
    """Assign buckets from precomputed cutoffs: a chain of WHENs — pure
    codegen, zero shuffles, streams at any scale (unlike the exact
    ntile, which sorts the scored frame on one partition). Value ≤
    cutoff[i] → labels[i]; above every cutoff → the last label. Ties on
    a boundary all land in the lower bucket (the cutoff form is a value
    rule, not an equal-count rule — exact equal counts need the ntile
    twin)."""
    if len(cutoffs) != len(labels) - 1:
        raise ValueError(
            f"{len(labels)} labels need {len(labels) - 1} cutoffs, "
            f"got {len(cutoffs)}"
        )
    expr = F.lit(labels[-1])
    for c, lab in zip(reversed(cutoffs), reversed(labels[:-1])):
        expr = F.when(F.col(col) <= c, F.lit(lab)).otherwise(expr)
    return scored.withColumn("bucket", expr)
