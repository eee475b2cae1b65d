"""Training-data curation operators: the selection/filtering layer a
large-scale LLM data pipeline runs between raw ingest and tokenization.

The reference engine curates rows via seed SQL + FK closure (its notion
of "take a consistent, representative subset", xdump/base.py:87-106);
this module is the corpus-level counterpart for the documents table:

- repetition/quality signals in the style of the Gopher rules
  (Rae et al. 2021, "Scaling Language Models: ... Gopher", App. A1) and
  C4 (Raffel et al. 2020): type-token ratio, top-token dominance,
  duplicate-bigram fraction;
- deterministic hash-bucket sampling, stratified per language (the
  reproducible alternative to rand() sampling — re-runs select the SAME
  documents, so a pipeline restart doesn't reshuffle the corpus);
- benchmark-contamination screening by n-gram overlap (the standard
  eval-decontamination step, e.g. GPT-3 App. C / PaLM §7);
- per-source caps (domain caps in CC-style pipelines) with a two-phase
  distributed top-k;
- per-source mixture statistics for weighting.

Everything is JVM-side codegen (split/transform/filter/windows) except
the Arrow-batched kernels with no JVM-expression equivalent (the
order-preserving token encode, the zlib compression-ratio signal);
every operator states its 100 TB shuffle story inline.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# repetition / quality signals
# --------------------------------------------------------------------------
def repetition_frame(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document repetition signals: (id, n_tokens, n_distinct, ttr,
    top_token_frac, dup_bigram_frac).

    - ttr: type-token ratio (distinct/total — low = repetitive);
    - top_token_frac: most frequent token's share (Gopher caps this);
    - dup_bigram_frac: 1 − distinct-bigrams/bigrams (Gopher's duplicate
      n-gram fraction, n=2).

    Scale: narrow map — zero shuffles, one pass, all whole-stage codegen.
    The per-doc top-frequency scan is O(distinct × tokens) per row with
    no memory beyond the token array. At 100 TB this is scan-bound.
    """
    from xdump_spark.operators.sizing import spread

    # Project the split ONCE: lambda bodies referencing a split(...) column
    # re-evaluate it per element (same hazard dedup._shingles_of_norm
    # documents); a prior select pins it to one evaluation. spread() fans
    # a single-partition small-file scan across cores first (no-op at
    # scale).
    t = F.split(F.trim(F.col(text_col)), r"\s+")
    toks = (
        spread(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), t.alias("t"))
        .filter(F.size("t") > 0)
    )
    distinct = F.array_distinct(F.col("t"))
    n = F.size("t")
    n_dist = F.size(distinct)
    top_freq = F.array_max(
        F.transform(distinct, lambda x: F.size(F.filter(F.col("t"), lambda y: y == x)))
    )
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(" ", F.element_at("t", i), F.element_at("t", i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        toks.withColumn("_bg", bigrams)
        .select(
            F.col(id_col),
            n.alias("n_tokens"),
            n_dist.alias("n_distinct"),
            F.round(n_dist / n, 6).alias("ttr"),
            F.round(top_freq / n, 6).alias("top_token_frac"),
            F.when(F.size("_bg") > 0, F.round(1 - F.size(F.array_distinct("_bg")) / F.size("_bg"), 6))
            .otherwise(F.lit(0.0))
            .alias("dup_bigram_frac"),
        )
    )


# --------------------------------------------------------------------------
# deterministic stratified sampling
# --------------------------------------------------------------------------
def _hex_threshold(rate: float, digits: int) -> str:
    """rate ∈ [0,1] → lowercase hex cutoff of ``digits`` chars; keep a row
    iff its hex bucket string < threshold. Resolution is 16^digits."""
    space = 16 ** digits
    cut = min(space, max(0, int(round(rate * space))))
    return format(cut, f"0{digits + 1}x")[-digits:] if cut < space else "g" * digits
    # 'g' sorts after every hex digit → keep-all sentinel


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    hex_digits: int = 4,
) -> DataFrame:
    """Deterministic per-stratum downsampling: a row survives iff the
    first ``hex_digits`` hex chars of md5(id) sort below the stratum's
    cutoff. Same inputs → same sample, on any cluster, any partitioning,
    any run — unlike rand()-based sampling, a restarted 100 TB pipeline
    reproduces itself bit-for-bit. Strata absent from ``rates`` drop.

    Scale: narrow filter, no shuffle, no state; md5 is codegen'd.
    """
    bucket = F.substring(F.md5(F.col(id_col).cast("string")), 1, hex_digits)
    thr = F.lit(None).cast("string")
    for stratum, rate in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == stratum, F.lit(_hex_threshold(rate, hex_digits))).otherwise(thr)
    return (
        df.withColumn("_bucket", bucket)
        .withColumn("_thr", thr)
        .filter(F.col("_thr").isNotNull() & (F.col("_bucket") < F.col("_thr")))
        .drop("_thr")
        .withColumnRenamed("_bucket", "sample_bucket")
    )


# --------------------------------------------------------------------------
# benchmark contamination screening
# --------------------------------------------------------------------------
def contamination_screen(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_shared: int = 1,
) -> DataFrame:
    """Documents sharing ≥ ``min_shared`` distinct word n-grams with ANY
    benchmark document: (id, n_shared). The eval-decontamination join —
    training docs overlapping the eval set get flagged before training.

    Scale: the benchmark gram set is dedup'd FIRST (distinct on one
    string column — the only benchmark-sized shuffle) and broadcast; the
    corpus side is a narrow explode → broadcast-hash join → per-doc
    count. The 100 TB corpus never shuffles on gram. For benchmark sets
    too big to broadcast (rare — eval sets are small), drop the
    broadcast hint and this becomes a sort-merge join on gram, still
    linear.
    """
    from xdump_spark.operators.dedup import _grams_of_tokens
    from xdump_spark.operators.sizing import spread
    from xdump_spark.operators.text import tokens

    def grams_of(df: DataFrame) -> DataFrame:
        # Project the token array BEFORE the n-gram transform: feeding
        # tokens(text) straight into the per-element lambda re-evaluates
        # the split per gram (O(tokens²) per doc — measured 6× the whole
        # operator). spread() fans the small-file single-partition scan
        # out before the CPU-heavy gram build; no-op on wide inputs.
        toked = spread(df.select(F.col(id_col), F.col(text_col))).select(
            F.col(id_col), tokens(F.col(text_col)).alias("_toks")
        )
        return toked.select(
            F.col(id_col), F.explode(_grams_of_tokens(F.col("_toks"), n)).alias("gram")
        )

    corpus_grams = grams_of(docs)
    bench_grams = grams_of(benchmark).select("gram").distinct()
    return (
        corpus_grams.join(F.broadcast(bench_grams), "gram")
        # word_ngrams is per-doc distinct, so count(*) == distinct shared grams
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


# --------------------------------------------------------------------------
# per-source caps (domain caps)
# --------------------------------------------------------------------------
def source_cap(
    df: DataFrame,
    cap: int,
    part_col: str = "source",
    id_col: str = "doc_id",
    salt_partitions: int = 64,
) -> DataFrame:
    """Keep at most ``cap`` documents per source, chosen by deterministic
    hash order (md5 of the id — an unbiased, reproducible draw rather
    than "first N by id"). Two-phase top-k so a hot source cannot pin a
    single task at 100 TB:

      phase 1: rank within (source, salt) — ``salt_partitions`` ways —
               and keep ``cap`` per salt slice: a source's candidate set
               shrinks to ≤ salt_partitions × cap rows *before* …
      phase 2: … the exact global per-source rank runs on the survivors.

    Phase 2's window sees a bounded row count per source regardless of
    corpus size; the full corpus only ever shuffles by (source, salt),
    which the salt spreads evenly.
    """
    rank_key = F.md5(F.col(id_col).cast("string"))
    salt = F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(salt_partitions))
    local = W.partitionBy(part_col, salt).orderBy(rank_key, F.col(id_col))
    survivors = (
        df.withColumn("_rk", rank_key)
        .withColumn("_r1", F.row_number().over(local))
        .filter(F.col("_r1") <= cap)
        .drop("_r1")
    )
    final = W.partitionBy(part_col).orderBy(F.col("_rk"), F.col(id_col))
    return (
        survivors.withColumn("_r2", F.row_number().over(final))
        .filter(F.col("_r2") <= cap)
        .drop("_rk", "_r2")
    )


# --------------------------------------------------------------------------
# unigram surprisal (LM-filter proxy)
# --------------------------------------------------------------------------
def unigram_surprisal_frame(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Per-document mean unigram surprisal: (id, n_tokens,
    mean_surprisal) where surprisal(tok) = −ln p(tok) under an add-one-
    smoothed unigram model. The cheap proxy for an LM quality filter
    (CCNet-style): word salads of rare tokens score high, natural
    high-frequency text scores low. Deterministic — no training, the
    "model" is corpus token counts.

    ``vocab``: optional (token, n) frequency frame to score against
    (e.g. fitted on a reference corpus or a sample); defaults to ``df``
    itself. OOV tokens get the smoothed floor p = 1/(N + V).

    Scale: one groupBy on token for the vocab (map-side combined), one
    broadcast join of the (small) vocab against the exploded corpus,
    one per-doc re-aggregation keyed by id. The corpus never shuffles on
    token; at 100 TB fit the vocab on a sample and broadcast it the
    same way.
    """
    from xdump_spark.operators.sizing import spread
    from xdump_spark.operators.text import tokens

    exploded = spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    if vocab is None:
        vocab = exploded.groupBy("tok").agg(F.count("*").alias("n"))
    # _total/_vsize, not N/V: Spark's default case-insensitive resolution
    # would make `N` collide with the vocab's `n` column.
    totals = vocab.agg(F.sum("n").alias("_total"), F.count("*").alias("_vsize"))
    scored = (
        exploded.join(F.broadcast(vocab), "tok", "left")
        .crossJoin(F.broadcast(totals))
        # add-one smoothing; OOV (null n) floors at 1/(N+V)
        .withColumn(
            "_s",
            -F.log(
                (F.coalesce(F.col("n"), F.lit(0)) + 1)
                / (F.col("_total") + F.col("_vsize"))
            ),
        )
    )
    return scored.groupBy(F.col("id").alias(id_col)).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.round(F.avg("_s"), 6).alias("mean_surprisal"),
    )


# Default thresholds for gopher_filter. Sources: Rae et al. 2021
# (Gopher), Appendix A1.1 — token-count window, mean-word-length window,
# alphabetic-word fraction, and the >=2-stopwords rule are verbatim;
# the repetition caps (ttr floor, top-token share, duplicate-bigram
# fraction) are this engine's adaptation of the paper's duplicate-n-gram
# family to the signals repetition_frame computes.
DEFAULT_GOPHER_RULES: dict[str, float] = {
    "min_tokens": 50,
    "max_tokens": 100_000,
    "min_mean_token_len": 3.0,
    "max_mean_token_len": 10.0,
    "min_alpha_word_frac": 0.8,
    "min_stopword_hits": 2,
    "min_ttr": 0.2,
    "max_top_token_frac": 0.2,
    "max_dup_bigram_frac": 0.2,
}


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rules: dict[str, float] | None = None,
) -> DataFrame:
    """Apply the Gopher document-quality rules as a gate: the input frame
    plus ``kept`` (boolean) and ``drop_reasons`` (array of failed rule
    names, empty when kept). The caller filters on ``kept``; keeping the
    reasons makes the gate auditable (what fraction fell to which rule is
    ``explode(drop_reasons)`` + groupBy — the data-card number).

    Signals are computed FUSED in one two-stage projection (not by
    joining quality_frame ⋈ repetition_frame — that would scan the text
    twice and shuffle on id for signals a single pass produces): zero
    shuffles, pure codegen. Override any threshold via ``rules``
    (merged over :data:`DEFAULT_GOPHER_RULES`).
    """
    from xdump_spark.operators.text import LANG_MARKERS, tokens

    r = {**DEFAULT_GOPHER_RULES, **(rules or {})}
    markers = F.array(*[F.lit(w) for w in LANG_MARKERS["en"]])

    toked = df.withColumn("_t", tokens(F.col(text_col)))
    n = F.size("_t")
    nsp = F.length(F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", ""))
    mean_len = F.when(n > 0, nsp / n).otherwise(F.lit(0.0))
    alpha_frac = F.when(
        n > 0,
        F.size(F.filter("_t", lambda x: x.rlike("[a-z]"))) / n,
    ).otherwise(F.lit(0.0))
    stop_hits = F.size(
        F.array_intersect(F.array_distinct("_t"), markers)
    )
    distinct = F.array_distinct("_t")
    ttr = F.when(n > 0, F.size(distinct) / n).otherwise(F.lit(0.0))
    top_frac = F.when(
        n > 0,
        F.array_max(
            F.transform(distinct, lambda x: F.size(F.filter("_t", lambda y: y == x)))
        )
        / n,
    ).otherwise(F.lit(0.0))
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(" ", F.element_at("_t", i), F.element_at("_t", i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    dup_bi = F.when(
        F.size(bigrams) > 0,
        1 - F.size(F.array_distinct(bigrams)) / F.size(bigrams),
    ).otherwise(F.lit(0.0))

    sig = toked.withColumns(
        {
            "_n": n,
            "_mean_len": mean_len,
            "_alpha": alpha_frac,
            "_stop": stop_hits,
            "_ttr": ttr,
            "_top": top_frac,
            "_dupbi": dup_bi,
        }
    )
    checks = [
        ("min_tokens", F.col("_n") >= F.lit(r["min_tokens"])),
        ("max_tokens", F.col("_n") <= F.lit(r["max_tokens"])),
        ("min_mean_token_len", F.col("_mean_len") >= F.lit(r["min_mean_token_len"])),
        ("max_mean_token_len", F.col("_mean_len") <= F.lit(r["max_mean_token_len"])),
        ("min_alpha_word_frac", F.col("_alpha") >= F.lit(r["min_alpha_word_frac"])),
        ("min_stopword_hits", F.col("_stop") >= F.lit(r["min_stopword_hits"])),
        ("min_ttr", F.col("_ttr") >= F.lit(r["min_ttr"])),
        ("max_top_token_frac", F.col("_top") <= F.lit(r["max_top_token_frac"])),
        ("max_dup_bigram_frac", F.col("_dupbi") <= F.lit(r["max_dup_bigram_frac"])),
    ]
    reasons = F.filter(
        F.array(
            *[F.when(~ok, F.lit(name)).otherwise(F.lit(None)) for name, ok in checks]
        ),
        lambda x: x.isNotNull(),
    )
    from xdump_spark.operators.sizing import pushdown_barrier

    return (
        sig.withColumn("drop_reasons", reasons)
        # barrier: the caller's filter("kept") must stay ABOVE this
        # projection — pushdown would substitute the whole fused signal
        # tree (token array re-inlined per lambda element) into the
        # predicate (see sizing.pushdown_barrier)
        .withColumn("kept", pushdown_barrier(F.size("drop_reasons") == 0))
        .drop("_t", "_n", "_mean_len", "_alpha", "_stop", "_ttr", "_top", "_dupbi")
    )


def mixture_drift(
    before: DataFrame, after: DataFrame, part_col: str = "source"
) -> DataFrame:
    """Compare two :func:`mixture_stats` outputs (corpus snapshots):
    per-source (n_docs_before/after, n_tokens_before/after,
    share_before/after, share_delta) — the composition-drift report a
    pipeline runs between crawl snapshots to catch a source silently
    exploding or vanishing. Sources absent from one side appear with
    zeros. Full outer join on the (tiny) aggregated frames — cost is
    |sources|, not corpus-sized."""
    b = before.select(
        part_col,
        F.col("n_docs").alias("n_docs_before"),
        F.col("n_tokens").alias("n_tokens_before"),
        F.col("token_share").alias("share_before"),
    )
    a = after.select(
        part_col,
        F.col("n_docs").alias("n_docs_after"),
        F.col("n_tokens").alias("n_tokens_after"),
        F.col("token_share").alias("share_after"),
    )
    out = b.join(a, part_col, "full_outer")
    zero = {
        "n_docs_before": 0, "n_tokens_before": 0, "share_before": 0.0,
        "n_docs_after": 0, "n_tokens_after": 0, "share_after": 0.0,
    }
    out = out.fillna(zero)
    return out.withColumn(
        "share_delta", F.round(F.col("share_after") - F.col("share_before"), 6)
    )


def bigram_surprisal_frame(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bigrams: DataFrame | None = None,
    unigrams: DataFrame | None = None,
) -> DataFrame:
    """Per-document mean CONDITIONAL surprisal: (id, n_bigrams,
    mean_surprisal) where surprisal(u→w) = −ln p(w|u) under add-one
    smoothing, p(w|u) = (c(u,w)+1)/(c(u)+V). The next step up from
    :func:`unigram_surprisal_frame` as an LM-filter proxy — catches
    locally-implausible word ORDER that unigram frequency cannot see
    (shuffled natural text scores high here, low there).

    ``bigrams`` (u, w, n) and ``unigrams`` (tok, n) optionally supply an
    external model; defaults fit on ``df`` itself. Docs with < 2 tokens
    drop (no bigram to score).

    Scale: the scoring joins BROADCAST the model (bigram table of a
    reference model / sample fit — bounded), so the corpus never
    shuffles on the bigram key; a self-fit on the full 100 TB corpus
    would make the model corpus-sized, so at scale fit on a sample
    exactly as the unigram docstring prescribes.
    """
    from xdump_spark.operators.sizing import spread
    from xdump_spark.operators.text import tokens

    toked = spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("_toks")
    )
    pair_arr = F.transform(
        F.sequence(F.lit(0), F.size("_toks") - F.lit(2)),
        lambda i: F.struct(
            F.element_at("_toks", i + F.lit(1)).alias("u"),
            F.element_at("_toks", i + F.lit(2)).alias("w"),
        ),
    )
    pairs = toked.filter(F.size("_toks") >= 2).select(
        "id", F.explode(pair_arr).alias("p")
    ).select("id", F.col("p.u").alias("u"), F.col("p.w").alias("w"))

    if unigrams is None:
        unigrams = (
            toked.select(F.explode("_toks").alias("tok"))
            .groupBy("tok")
            .agg(F.count("*").alias("n"))
        )
    if bigrams is None:
        bigrams = pairs.groupBy("u", "w").agg(F.count("*").alias("n"))

    vsize = unigrams.agg(F.count("*").alias("_vsize"))
    scored = (
        pairs.join(
            F.broadcast(bigrams.select("u", "w", F.col("n").alias("_nb"))),
            ["u", "w"],
            "left",
        )
        .join(
            F.broadcast(unigrams.select(F.col("tok").alias("u"), F.col("n").alias("_nu"))),
            "u",
            "left",
        )
        .crossJoin(F.broadcast(vsize))
        .withColumn(
            "_s",
            -F.log(
                (F.coalesce(F.col("_nb"), F.lit(0)) + 1)
                / (F.coalesce(F.col("_nu"), F.lit(0)) + F.col("_vsize"))
            ),
        )
    )
    return scored.groupBy(F.col("id").alias(id_col)).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(F.avg("_s"), 6).alias("mean_surprisal"),
    )



def compression_ratio_frame(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", level: int = 6
) -> DataFrame:
    """(id, n_bytes, n_compressed, compression_ratio): per-document zlib
    compression ratio — the redundancy gate production pipelines run
    alongside the repetition signals (RefinedWeb/MassiveText family:
    highly-compressible docs are boilerplate/template/repeated content;
    ratio ≈ 1 is incompressible noise). compressed/raw bytes, so LOWER
    means MORE redundant.

    One Arrow-batched narrow pass (zlib has no JVM-expression
    equivalent); empty docs get ratio 1.0. Complements
    curation.repetition_frame: n-gram signals see within-line repeats,
    compression sees cross-line and long-range structure."""
    import zlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<n_bytes: long, n_compressed: long>")
    def comp(texts: pd.Series) -> pd.DataFrame:
        nb, nc = [], []
        for t in texts:
            b = (t or "").encode("utf-8")
            nb.append(len(b))
            nc.append(len(zlib.compress(b, level)) if b else 0)
        return pd.DataFrame({"n_bytes": nb, "n_compressed": nc})

    out = df.select(F.col(id_col), comp(F.col(text_col)).alias("_c"))
    return out.select(
        id_col,
        F.col("_c.n_bytes").alias("n_bytes"),
        F.col("_c.n_compressed").alias("n_compressed"),
        F.when(F.col("_c.n_bytes") > 0,
               F.round(F.col("_c.n_compressed") / F.col("_c.n_bytes"), 6))
        .otherwise(F.lit(1.0))
        .alias("compression_ratio"),
    )


# --------------------------------------------------------------------------
# tokenization to ids
# --------------------------------------------------------------------------
def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    max_size: int = 65_536,
    min_count: int = 1,
) -> DataFrame:
    """(tok, token_id, n) word vocabulary from a corpus: ids assigned by
    descending frequency (ties broken by token string, so the mapping is
    deterministic), 1-based — id 0 is reserved for OOV/<unk>.

    Scale contract: the distinct-word table is unbounded (billions of rows
    at 100 TB), so id assignment must NOT window over it. ``limit`` after
    ``orderBy`` plans as TakeOrderedAndProject — per-partition top-K heaps,
    then a single ≤``max_size``-row merge on the driver side — and ONLY the
    bounded survivor set flows through the ``row_number`` window (same
    discipline as ``bpe_train``, bpe.py). Ids are identical to the old
    global-window formulation because the window's sort key equals the
    limit's sort key."""
    from xdump_spark.operators.text import tokens

    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
    )
    top = counts.orderBy(F.desc("n"), "tok").limit(max_size)
    w = W.orderBy(F.desc("n"), "tok")
    return (
        top.withColumn("token_id", F.row_number().over(w))
        .select("tok", "token_id", "n")
    )


def tokenize_frame(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    unk_id: int = 0,
) -> DataFrame:
    """(id, ids array<int>, n_tokens, n_oov): each document's tokens
    mapped to vocabulary ids IN ORDER — the encode step between curation
    and sequence building (whitespace-word granularity; a trained
    subword/BPE merge table would slot into the same broadcast-dict
    shape).

    Why a Pandas UDF and not a join: order-preserving encode via explode
    + broadcast-join + collect_list(sort) would re-shuffle the whole
    corpus on doc_id just to restore an order every row already had.
    The vocab is bounded (``build_vocab`` caps it), so a broadcast dict
    + one Arrow-batched map per partition keeps the corpus NARROW —
    zero shuffles, and the dict lookup is the same cost the join's hash
    probe would pay, without the exchange.
    """
    missing = {"tok", "token_id"} - set(vocab.columns)
    if missing:
        raise ValueError(
            f"vocab frame is missing column(s) {sorted(missing)}; expected the "
            "(tok, token_id, n) shape build_vocab produces"
        )
    vmap = {r["tok"]: r["token_id"] for r in vocab.select("tok", "token_id").collect()}
    b_vmap = df.sparkSession.sparkContext.broadcast(vmap)

    @F.pandas_udf("array<int>")
    def encode(texts: pd.Series) -> pd.Series:
        m = b_vmap.value
        return texts.map(
            lambda t: [m.get(w, unk_id) for w in t.strip().lower().split()]
            if t and t.strip()
            else []
        )

    out = df.select(F.col(id_col), encode(F.col(text_col)).alias("ids"))
    return out.select(
        id_col,
        "ids",
        F.size("ids").alias("n_tokens"),
        F.size(F.filter("ids", lambda i: i == F.lit(unk_id))).alias("n_oov"),
    )


# --------------------------------------------------------------------------
# sequence packing
# --------------------------------------------------------------------------
def pack_sequences(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    partitions: int | None = None,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Greedy first-fit packing of documents into token-budget-bounded
    training sequences: (seq_id, doc_ids array<long>, n_docs, total_tokens).
    Documents longer than ``budget`` become singleton (truncation-needed)
    sequences. The packing step every pretraining pipeline runs between
    curation and tokenization.

    Packing is a SEQUENTIAL bin-fill, so it runs per partition
    (``applyInPandas`` over a hash bucket of doc ids): global packing
    would serialize the corpus through one task, and training does not
    need globally-optimal bins — only bounded waste. Determinism: bucket
    assignment is a pure hash of the id and docs are packed in id order
    within each bucket, so re-runs reproduce the same sequences on any
    cluster layout. seq_id = (bucket << 32) | local_index, collision-free
    for < 2^32 sequences per bucket.

    Scale: one shuffle (the bucket groupBy); state per task is one open
    bin — O(1) memory beyond the Arrow batch.
    """
    import pandas as pd

    n_parts = partitions or df.sparkSession.sparkContext.defaultParallelism

    # ``counts`` overrides the whitespace token counter: an (id, n_tok)
    # frame in ANOTHER tokenizer's units (e.g. bpe_encode_frame's
    # n_bpe_tokens) packs sequences against that budget instead —
    # budget semantics must match whatever encoder fills the sequences.
    base = (
        df.select(F.col(id_col).cast("long").alias("id"),
                  F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("n_tok"))
        if counts is None
        else counts.select(F.col(id_col).cast("long").alias("id"),
                           F.col("n_tok").cast("int").alias("n_tok"))
    )
    toks = base.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col("id").cast("string")), F.lit(n_parts))
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id")
        bucket = int(pdf["bucket"].iloc[0])
        seqs: list[tuple[int, list[int], int]] = []  # (seq_id, ids, tokens)
        cur_ids: list[int] = []
        cur_tok = 0
        nxt = 0

        def flush():
            nonlocal cur_ids, cur_tok, nxt
            if cur_ids:
                seqs.append(((bucket << 32) | nxt, cur_ids, cur_tok))
                nxt += 1
                cur_ids, cur_tok = [], 0

        for _id, n in zip(pdf["id"], pdf["n_tok"]):
            if cur_tok + n > budget and cur_ids:
                flush()
            cur_ids.append(int(_id))
            cur_tok += int(n)
            if cur_tok >= budget:
                flush()
        flush()
        return pd.DataFrame(
            {
                "seq_id": [s[0] for s in seqs],
                "doc_ids": [s[1] for s in seqs],
                "n_docs": [len(s[1]) for s in seqs],
                "total_tokens": [s[2] for s in seqs],
            }
        )

    schema = "seq_id long, doc_ids array<long>, n_docs int, total_tokens long"
    return toks.groupBy("bucket").applyInPandas(pack, schema=schema)


def training_shards(
    df: DataFrame,
    vocab: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The terminal stage: (seq_id, input_ids array<int>, n_docs,
    n_tokens) — token-id sequences ready to write as training shards.

    Composes :func:`tokenize_frame` (order-preserving encode) with
    :func:`pack_sequences` (budget-bounded doc packing): documents inside
    a sequence concatenate in the pack's doc order; both stages count
    tokens with the same whitespace tokenizer, so ``n_tokens`` ==
    ``len(input_ids)`` exactly.

    Scale: one equi-join of (seq slot, doc_id) against the encoded docs
    (shuffle on doc_id) and one groupBy seq_id that re-assembles each
    sequence from its ≤budget-token pieces — per-sequence state is
    bounded by the budget, never by the corpus.
    """
    # Materialize a narrow (id, text) source BEFORE the encode UDF. When
    # the incoming frame carries its own expression pipeline (e.g.
    # strip_duplicated_spans' rebuild), Spark 4.1 leaves the pandas UDF
    # un-extracted in this join+aggregate shape and a task dies with
    # INTERNAL_ERROR "Cannot evaluate expression: encode(...)"; the
    # checkpoint turns the UDF input into a leaf column, which plans
    # correctly. (Checkpointing AFTER the UDF doesn't work —
    # localCheckpoint on a UDF-bearing frame trips the same bug.) Cost:
    # these are exactly the rows both downstream stages re-read anyway.
    src = df.select(F.col(id_col), F.col(text_col)).localCheckpoint(eager=True)
    tok = tokenize_frame(src, vocab, text_col=text_col, id_col=id_col).select(
        F.col(id_col).alias("_doc"), "ids"
    )
    packs = pack_sequences(src, budget, text_col=text_col, id_col=id_col)
    slots = packs.select(
        "seq_id", "n_docs", F.posexplode("doc_ids").alias("slot", "_doc")
    )
    return (
        slots.join(tok, "_doc")
        .groupBy("seq_id")
        .agg(
            F.first("n_docs").alias("n_docs"),
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("slot", "ids"))),
                    lambda x: x.ids,
                )
            ).alias("input_ids"),
        )
        .select(
            "seq_id",
            "input_ids",
            "n_docs",
            F.size("input_ids").cast("long").alias("n_tokens"),
        )
    )


# --------------------------------------------------------------------------
# referential-integrity audit
# --------------------------------------------------------------------------
def fk_orphans(catalog) -> DataFrame:
    """Orphan counts per FK edge: (table, column, foreign_table,
    foreign_column, n_orphans) — child rows whose non-null FK value has no
    parent. The reference delegates integrity to the database's enforced
    constraints (xdump/postgresql.py:19-62 reads them from the catalog);
    a parquet lake enforces nothing, so closure correctness silently
    depends on this audit passing.

    Scale: one left-anti join per edge against the parent's DISTINCT key
    column (keys-only shuffle; broadcast when small). Edges evaluate
    independently — at 100 TB run them as separate jobs.
    """
    spark = None
    pieces = []
    for fk in catalog.foreign_keys:
        child = catalog.tables[fk.table]
        parent = catalog.tables[fk.foreign_table]
        spark = child.sparkSession
        keys = parent.select(F.col(fk.foreign_column).alias("_k")).distinct()
        orphans = (
            child.filter(F.col(fk.column).isNotNull())
            .select(F.col(fk.column).alias("_k"))
            .join(keys, "_k", "left_anti")
            .agg(F.count("*").alias("n_orphans"))
            .select(
                F.lit(fk.table).alias("table"),
                F.lit(fk.column).alias("column"),
                F.lit(fk.foreign_table).alias("foreign_table"),
                F.lit(fk.foreign_column).alias("foreign_column"),
                "n_orphans",
            )
        )
        pieces.append(orphans)
    if not pieces:
        raise ValueError("catalog has no foreign keys to audit")
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


# --------------------------------------------------------------------------
# mixture statistics
# --------------------------------------------------------------------------
def mixture_resample(
    df: DataFrame,
    target: dict[str, float],
    part_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    by_tokens: bool = False,
    strict: bool = True,
    hex_digits: int = 6,
) -> tuple[DataFrame, dict[str, float]]:
    """Downsample the corpus so its per-source composition matches
    ``target`` (shares summing to 1) — the mixture-rebalancing stage
    between curation and tokenization (the "sampling weights" knob of
    Pile/ROOTS/DoReMi-style recipes, applied as a materialized
    downsample rather than a loader-side reweight).

    Downsample-only: the keep-rate for source ``s`` is
    ``min(1, c · target_s / current_s)`` with ``c`` chosen as the
    LARGEST scale at which no source needs upsampling
    (``c = min_s current_s / target_s``). The binding source keeps rate
    1.0 and every other source is trimmed to match — the biggest corpus
    whose expected composition is exactly ``target``. Sources with
    target share 0 (or absent from ``target``) drop entirely.

    ``by_tokens`` measures shares in whitespace tokens instead of doc
    counts (rates still apply per document, so the match is exact in
    expectation under within-source length homogeneity — the standard
    approximation; re-run mixture_stats on the output to audit).

    ``strict`` raises when a target source is missing from the corpus
    (its share is unachievable); ``strict=False`` renormalizes the
    target over the present sources instead.

    Returns ``(sampled_df, rates)`` — the survivors plus the per-source
    keep-rates actually applied, for the pipeline audit/data card.

    Scale: one map-side-combined groupBy on the source key (|sources|
    rows to the driver — mixture cardinality, not corpus), then the
    same zero-shuffle deterministic md5-bucket filter as
    stratified_sample: restart-reproducible on any cluster at any
    partitioning, no rand(), no state.
    """
    total = sum(target.values())
    if total <= 0:
        raise ValueError("target shares must sum to a positive value")
    tgt = {s: w / total for s, w in target.items() if w > 0}

    weight = (
        F.sum(F.size(F.split(F.trim(F.col(text_col)), r"\s+")))
        if by_tokens
        else F.count("*")
    )
    current = {
        r["s"]: r["w"]
        for r in df.groupBy(F.col(part_col).alias("s")).agg(weight.alias("w")).collect()
    }
    missing = sorted(set(tgt) - set(current))
    if missing:
        if strict:
            raise ValueError(
                f"target sources missing from corpus: {missing}; "
                "pass strict=False to renormalize over present sources"
            )
        tgt = {s: w for s, w in tgt.items() if s in current}
        renorm = sum(tgt.values())
        if renorm <= 0:
            raise ValueError("no target source present in the corpus")
        tgt = {s: w / renorm for s, w in tgt.items()}

    grand = sum(current.values())
    if grand <= 0:
        return df.limit(0), {}
    # largest c with every rate <= 1
    c = min(current[s] / grand / w for s, w in tgt.items())
    rates = {s: min(1.0, c * w / (current[s] / grand)) for s, w in tgt.items()}
    sampled = stratified_sample(
        df, rates, strata_col=part_col, id_col=id_col, hex_digits=hex_digits
    ).drop("sample_bucket")
    return sampled, rates


def mixture_stats(df: DataFrame, part_col: str = "source", text_col: str = "text") -> DataFrame:
    """Per-source corpus composition: (source, n_docs, n_tokens,
    token_share) — the inputs to mixture weighting (how much of each
    source a training run sees). token_share sums to 1.

    Scale: one map-side-combined groupBy on the source key (tiny
    cardinality), then the corpus total via an unpartitioned window over
    the AGGREGATED frame — |sources| rows through one extra exchange. A
    ``per.agg(...)`` + crossJoin total would re-run the full scan and
    groupBy a second time (Spark does not materialize ``per`` across the
    two consumers).
    """
    per = df.groupBy(part_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.trim(F.col(text_col)), r"\s+"))).alias("n_tokens"),
    )
    total = F.sum("n_tokens").over(W.partitionBy())
    return per.withColumn("token_share", F.round(F.col("n_tokens") / total, 6))
