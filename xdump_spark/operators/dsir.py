"""DSIR-style data selection: importance resampling on hashed n-grams.

Implements the selection recipe of "Data Selection for Language Models
via Importance Resampling" (Xie et al., 2023, arXiv:2302.03169):

1. featurize every document as a bag of HASHED word uni+bigrams over a
   fixed bucket space (the paper's hashed n-gram features);
2. fit two bucket multinomials — p̂ on a TARGET corpus sample (the
   distribution you want more of) and q̂ on the RAW corpus sample —
   with add-one smoothing;
3. score each raw document with its importance log-weight
   log w(x) = Σ_grams log( p̂[h(gram)] / q̂[h(gram)] );
4. resample the corpus by weight using the Gumbel-top-k trick, which
   turns "sample k docs without replacement ∝ softmax(log w / T)" into
   a deterministic ORDER BY over per-doc keys.

Spark-first shape, sized for 100 TB:

* The MODELS are tiny (``num_buckets`` float64 counts, default 65 536 =
  512 KB) — fit is ONE map-side-combined groupBy per side over hashed
  gram ids (never gram strings), collected to a driver array and
  re-broadcast; fit inputs are capped deterministic samples like every
  other learned op in this repo (classifier.py, pq.py).
* SCORING is a single Arrow-batched pandas UDF over the corpus with the
  broadcast log-ratio array: zero shuffles, corpus stays narrow. (A
  65k-row broadcast join + explode + re-groupBy(doc) would re-shuffle
  the whole corpus on doc_id just to restore a per-doc sum — the same
  anti-pattern tokenize_frame documents.)
* SELECTION is ``orderBy(key desc).limit(n)`` → TakeOrderedAndProject:
  per-partition top-k heaps, no global sort, no unbounded window (the
  build_vocab discipline).
* The Gumbel noise is derived from md5(doc_id, seed) — deterministic
  across runs, partitionings, and cluster sizes, like every sampling
  decision in this repo.

``hash_fn="md5"`` makes the bucket hash DuckDB-reproducible (same trick
as dedup.simhash_frame) so tests cross-check scores against an
independent SQL recomputation; the default xxhash64 is the fast path.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd  # module-level: pandas_udf resolves type hints via module globals

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xdump_spark.operators.text import tokens

DEFAULT_BUCKETS = 65_536


def _bucket_expr(gram_col, num_buckets: int, hash_fn: str):
    """Hash a gram-string COLUMN to a bucket id in [0, num_buckets)."""
    if hash_fn == "xxhash64":
        h = F.xxhash64(gram_col)
    elif hash_fn == "md5":
        # first 60 bits of md5 — reproducible in DuckDB as
        # ('0x'||substr(md5(g),1,15))::UBIGINT (see simhash_frame)
        h = F.conv(F.substring(F.md5(gram_col), 1, 15), 16, 10).cast("long")
    else:
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")
    return F.pmod(h, F.lit(num_buckets))


def _grams_of_toks(toks):
    """Word uni+bigrams from an already-PROJECTED token-array COLUMN.
    The input must be a plain column reference, never an inline
    ``tokens(text)`` expression: expressions captured inside a
    higher-order-function lambda re-evaluate PER ELEMENT, so an inlined
    split would re-run its regex once per bigram — measured 20× slower
    on the r5 soak (24 s → ~1 s for the fit aggregation at sf0.1).
    ``toks`` is referenced several times, which also keeps
    CollapseProject from re-inlining the alias."""
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def hashed_ngram_counts(
    df: DataFrame,
    text_col: str = "text",
    num_buckets: int = DEFAULT_BUCKETS,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(bucket, n) hashed-gram counts over a corpus — one explode of
    bucket IDS (ints, never gram strings) into a map-side-combined
    groupBy; the shuffle carries ≤ num_buckets rows per partition."""
    from xdump_spark.operators.sizing import pushdown_barrier

    # pushdown_barrier: explode makes the optimizer infer a
    # `size(_g) > 0 AND isnotnull(_g)` filter and push it BELOW the
    # projections, re-inlining the whole gram expression (including the
    # per-element token split) into the predicate — the measured
    # pushdown-inlining trap (sizing.pushdown_barrier). The barrier is
    # shuffle(array(col))[0]: a permutation of one element, value-
    # identical, but nondeterministic so substitution cannot cross it.
    g = df.select(tokens(F.col(text_col)).alias("_toks")).select(
        pushdown_barrier(_grams_of_toks(F.col("_toks"))).alias("_g")
    )
    return (
        g.select(F.explode("_g").alias("_gram"))
        .select(_bucket_expr(F.col("_gram"), num_buckets, hash_fn).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


@dataclass
class DSIRModel:
    """Bucket log-ratio model: ``log_ratio[b] = log p̂_target[b] − log
    q̂_raw[b]`` with add-one smoothing. ~512 KB at the default bucket
    count — broadcastable anywhere."""

    log_ratio: np.ndarray  # float64[num_buckets]
    num_buckets: int
    hash_fn: str = "xxhash64"

    def to_dict(self) -> dict:
        return {
            "log_ratio": self.log_ratio.tolist(),
            "num_buckets": self.num_buckets,
            "hash_fn": self.hash_fn,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "DSIRModel":
        return cls(
            log_ratio=np.asarray(d["log_ratio"], dtype=np.float64),
            num_buckets=int(d["num_buckets"]),
            hash_fn=d.get("hash_fn", "xxhash64"),
        )


def _counts_to_array(counts: DataFrame, num_buckets: int) -> np.ndarray:
    out = np.zeros(num_buckets, dtype=np.float64)
    for r in counts.collect():  # ≤ num_buckets rows by construction
        out[int(r["bucket"])] = float(r["n"])
    return out


def fit_dsir(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    num_buckets: int = DEFAULT_BUCKETS,
    hash_fn: str = "xxhash64",
) -> DSIRModel:
    """Fit the importance model from a target corpus (sample) and the
    raw corpus (sample). Callers cap the inputs like every fit in this
    repo (a deterministic md5 sample upstream); the fit itself is two
    bucket-count aggregations + driver arithmetic on num_buckets floats."""
    t = _counts_to_array(hashed_ngram_counts(target, text_col, num_buckets, hash_fn), num_buckets)
    r = _counts_to_array(hashed_ngram_counts(raw, text_col, num_buckets, hash_fn), num_buckets)
    # add-one smoothing on both multinomials
    logp = np.log(t + 1.0) - math.log(float(t.sum() + num_buckets))
    logq = np.log(r + 1.0) - math.log(float(r.sum() + num_buckets))
    return DSIRModel(log_ratio=logp - logq, num_buckets=num_buckets, hash_fn=hash_fn)


def dsir_score(
    df: DataFrame,
    model: DSIRModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """(id, n_grams, dsir_logw): per-document importance log-weight.

    One Arrow-batched pass: the plan computes each doc's bucket-id array
    JVM-side (tokens → grams → hash → pmod, all codegen), and the pandas
    UDF only sums the broadcast log-ratio table at those indices — the
    Python side never touches text."""
    from pyspark.sql.functions import pandas_udf

    b_ratio = df.sparkSession.sparkContext.broadcast(model.log_ratio)

    @pandas_udf("double")
    def logw(buckets: pd.Series) -> pd.Series:
        ratio = b_ratio.value

        def one(bs) -> float:
            # null text → null bucket array (tokens() of null is null):
            # score 0 like an empty doc instead of failing the job
            if bs is None or len(bs) == 0:
                return 0.0
            return float(np.round(ratio[np.asarray(bs, dtype=np.int64)].sum(), round_to))

        return buckets.map(one)

    with_buckets = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).select(
        F.col(id_col),
        F.transform(
            _grams_of_toks(F.col("_toks")),
            lambda g: _bucket_expr(g, model.num_buckets, model.hash_fn),
        ).alias("_buckets"),
    )
    return with_buckets.select(
        id_col,
        F.coalesce(F.size("_buckets"), F.lit(0)).alias("n_grams"),
        logw(F.col("_buckets")).alias("dsir_logw"),
    )


def dsir_resample(
    df: DataFrame,
    model: DSIRModel,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    temperature: float = 1.0,
    seed: int = 0,
) -> DataFrame:
    """Select ``n`` documents ∝ softmax(dsir_logw / temperature) without
    replacement — the paper's importance resampling step — via the
    Gumbel-top-k identity: key_i = logw_i/T + Gumbel_i, take the n
    largest keys.

    The Gumbel noise is md5-derived from (id, seed): u ∈ (0,1) from the
    first 15 hex chars, g = −log(−log u) — bit-reproducible on any
    cluster/partitioning, and the selection plans as
    TakeOrderedAndProject (per-partition top-n heaps), never a global
    sort or window. Scale note: TakeOrderedAndProject materializes the
    n winners on the driver (~30 bytes/row here) — fine up to tens of
    millions; for larger selections gate on a log-weight THRESHOLD
    instead (``dsir_score`` + filter, the streaming-ingest formulation
    in streaming/corpus.py), which selects a softmax-equivalent
    expected fraction with zero driver state.
    Returns (id, dsir_logw, gumbel_key) for the selected docs."""
    scored = dsir_score(df, model, text_col, id_col).select(id_col, "dsir_logw")
    u = (
        F.conv(
            F.substring(F.md5(F.concat_ws("|", F.col(id_col), F.lit(str(seed)))), 1, 15),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 60))
    key = F.col("dsir_logw") / F.lit(float(temperature)) - F.log(-F.log(u))
    return (
        scored.withColumn("gumbel_key", F.round(key, 6))
        .orderBy(F.desc("gumbel_key"), id_col)
        .limit(n)
    )
