"""Unit tests for the training-data curation operators
(operators/curation.py); the registry entry curation_doc_signals
cross-checks the same operators value-exactly against DuckDB."""

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from xdump_spark.operators.curation import (
    _hex_threshold,
    contamination_screen,
    mixture_stats,
    repetition_frame,
    source_cap,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a a a a", "en", "s1"),          # maximally repetitive
        (2, "a b c d", "en", "s1"),          # all distinct
        (3, "x y x y x", "de", "s2"),        # alternating
        (4, "one", "de", "s2"),              # single token (no bigrams)
        (5, "p q r p q r p q r", "fr", "s2"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_repetition_metrics(spark, docs):
    got = {r.doc_id: r for r in repetition_frame(docs).collect()}
    r1 = got[1]
    assert (r1.n_tokens, r1.n_distinct, r1.ttr, r1.top_token_frac) == (4, 1, 0.25, 1.0)
    assert r1.dup_bigram_frac == pytest.approx(2 / 3, abs=1e-6)  # 3 bigrams, 1 distinct
    r2 = got[2]
    assert (r2.ttr, r2.top_token_frac, r2.dup_bigram_frac) == (1.0, 0.25, 0.0)
    r4 = got[4]
    assert (r4.n_tokens, r4.dup_bigram_frac) == (1, 0.0)


def test_hex_threshold_edges():
    assert _hex_threshold(0.0, 4) == "0000"       # keeps nothing
    assert _hex_threshold(0.5, 4) == "8000"
    assert _hex_threshold(1.0, 4) == "gggg"       # sorts after all hex → keeps all
    assert _hex_threshold(0.2, 4) == "3333"


def test_stratified_sample_deterministic_and_stratified(spark, docs):
    out1 = stratified_sample(docs, {"en": 1.0, "de": 0.0})
    ids1 = {r.doc_id for r in out1.collect()}
    assert ids1 == {1, 2}            # en keep-all; de rate 0 drops; fr absent drops
    # determinism: identical on re-run
    assert {r.doc_id for r in stratified_sample(docs, {"en": 1.0, "de": 0.0}).collect()} == ids1
    # rate ~0.5 on a bigger frame lands near half, deterministic
    big = spark.range(1000).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    )
    n = stratified_sample(big, {"en": 0.5}).count()
    assert 400 < n < 600
    assert stratified_sample(big, {"en": 0.5}).count() == n


def test_contamination_screen(spark, docs):
    bench = docs.filter("doc_id = 5")     # grams: 'p q r', 'q r p', 'r p q'
    corpus = docs.filter("doc_id <> 5")
    out = {r.doc_id: r.n_shared for r in contamination_screen(corpus, bench, n=3).collect()}
    assert out == {}                      # nothing shares a 3-gram with doc 5
    bench2 = docs.filter("doc_id = 1")    # gram: 'a a a'
    corpus2 = spark.createDataFrame(
        [(10, "z a a a z", "en", "s1"), (11, "b b b", "en", "s1")],
        "doc_id long, text string, lang string, source string",
    )
    out2 = {r.doc_id: r.n_shared for r in contamination_screen(corpus2, bench2, n=3).collect()}
    assert out2 == {10: 1}


def test_source_cap_two_phase_matches_single_window(spark):
    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("source"),
    )
    got = {r.doc_id for r in source_cap(df, 7, salt_partitions=8).collect()}
    # reference: plain single-window top-k by the same deterministic order
    w = W.partitionBy("source").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    want = {
        r.doc_id
        for r in df.withColumn("r", F.row_number().over(w)).filter("r <= 7").collect()
    }
    assert got == want and len(got) == 21


def test_source_cap_under_cap_keeps_all(spark, docs):
    assert source_cap(docs, 100).count() == docs.count()


def test_pack_sequences_budget_and_determinism(spark):
    from xdump_spark.operators.curation import pack_sequences

    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        # doc i has (i % 7) + 1 tokens
        F.concat_ws(" ", F.array_repeat(F.lit("w"), (F.col("id") % 7 + 1).cast("int"))).alias(
            "text"
        ),
    )
    out = pack_sequences(df, budget=10, partitions=8).collect()
    # every doc appears exactly once
    packed = [d for r in out for d in r.doc_ids]
    assert sorted(packed) == list(range(200))
    # no sequence exceeds the budget unless it is a single long doc
    for r in out:
        assert r.total_tokens <= 10 or r.n_docs == 1
        assert r.n_docs == len(r.doc_ids)
    # deterministic across runs
    again = pack_sequences(df, budget=10, partitions=8).collect()
    assert sorted((r.seq_id, tuple(r.doc_ids)) for r in out) == sorted(
        (r.seq_id, tuple(r.doc_ids)) for r in again
    )


def test_pack_sequences_oversized_doc_is_singleton(spark):
    from xdump_spark.operators.curation import pack_sequences

    df = spark.createDataFrame(
        [(1, "a b"), (2, " ".join(["w"] * 50)), (3, "c d")],
        "doc_id long, text string",
    )
    out = pack_sequences(df, budget=10, partitions=1).collect()
    big = [r for r in out if 2 in r.doc_ids]
    assert len(big) == 1 and big[0].n_docs == 1 and big[0].total_tokens == 50


def test_fk_orphans(spark, employees_catalog):
    from xdump_spark.operators.curation import fk_orphans

    out = {
        (r.table, r.column): r.n_orphans for r in fk_orphans(employees_catalog).collect()
    }
    # the fixture is referentially consistent
    assert set(out.values()) == {0}
    assert ("employees", "manager_id") in out and ("tickets", "author_id") in out
    # break it: a ticket pointing at a missing employee
    broken = employees_catalog.with_table(
        "tickets",
        employees_catalog.tables["tickets"].unionByName(
            spark.createDataFrame(
                [(99, 42, "s", "m")], employees_catalog.tables["tickets"].schema
            )
        ),
    )
    out2 = {(r.table, r.column): r.n_orphans for r in fk_orphans(broken).collect()}
    assert out2[("tickets", "author_id")] == 1
    assert out2[("employees", "manager_id")] == 0


def test_unigram_surprisal_matches_duckdb(spark):
    """Exact cross-check of the smoothed unigram scorer against a DuckDB
    recomputation over the real documents table (pytest-level oracle —
    the registry's 50-entry window is full)."""
    import duckdb

    from xdump_spark.operators.curation import unigram_surprisal_frame

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    got = {r.doc_id: (r.n_tokens, r.mean_surprisal)
           for r in unigram_surprisal_frame(docs).collect()}
    con = duckdb.connect()
    want = con.execute(
        f"""
        WITH toks AS (
          SELECT doc_id, unnest(string_split(trim(lower(text)), ' ')) AS tok
          FROM read_parquet('{sf}/documents.parquet') WHERE length(trim(text)) > 0
        ),
        vocab AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
        tot AS (SELECT sum(n) AS N, count(*) AS V FROM vocab)
        SELECT t.doc_id, CAST(count(*) AS BIGINT),
               ROUND(avg(-ln((v.n + 1) / (tot.N + tot.V))), 6)
        FROM toks t JOIN vocab v USING (tok) CROSS JOIN tot
        GROUP BY t.doc_id
        """
    ).fetchall()
    assert len(want) == len(got) == 500
    for doc_id, n, s in want:
        assert got[doc_id][0] == n
        assert got[doc_id][1] == pytest.approx(s, abs=2e-6), doc_id


def test_unigram_surprisal_oov_floor(spark):
    from xdump_spark.operators.curation import unigram_surprisal_frame

    corpus = spark.createDataFrame([(1, "a a a b")], "doc_id long, text string")
    vocab = spark.createDataFrame([("a", 3)], "tok string, n long")
    out = unigram_surprisal_frame(corpus, vocab=vocab).collect()[0]
    # N=3, V=1; p(a)=(3+1)/4=1.0 → s=0; OOV b → -ln(1/4)
    import math

    want = round((3 * 0.0 + -math.log(1 / 4)) / 4, 6)
    assert out.n_tokens == 4 and out.mean_surprisal == pytest.approx(want, abs=1e-6)


def test_mixture_stats(spark, docs):
    out = {r.source: r for r in mixture_stats(docs).collect()}
    assert out["s1"].n_docs == 2 and out["s1"].n_tokens == 8
    assert out["s2"].n_docs == 3 and out["s2"].n_tokens == 15
    total_share = sum(r.token_share for r in out.values())
    assert total_share == pytest.approx(1.0, abs=1e-5)


def test_bigram_surprisal_matches_duckdb(spark):
    """Exact cross-check of the smoothed bigram scorer against a DuckDB
    recomputation over the real documents table."""
    import duckdb

    from xdump_spark.operators.curation import bigram_surprisal_frame

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    got = {r.doc_id: (r.n_bigrams, r.mean_surprisal)
           for r in bigram_surprisal_frame(docs).collect()}
    con = duckdb.connect()
    want = con.execute(
        f"""
        WITH t AS (
          SELECT doc_id, string_split(trim(lower(text)), ' ') AS toks
          FROM read_parquet('{sf}/documents.parquet') WHERE length(trim(text)) > 0
        ),
        pairs AS (
          SELECT doc_id, toks[i+1] AS u, toks[i+2] AS w
          FROM t, LATERAL (SELECT unnest(generate_series(0, len(toks)-2)) AS i)
          WHERE len(toks) >= 2
        ),
        uni AS (SELECT unnest(toks) AS tok FROM t),
        ucnt AS (SELECT tok, count(*) AS n FROM uni GROUP BY tok),
        bcnt AS (SELECT u, w, count(*) AS n FROM pairs GROUP BY u, w),
        v AS (SELECT count(*) AS vsize FROM ucnt)
        SELECT p.doc_id, CAST(count(*) AS BIGINT),
               ROUND(avg(-ln((b.n + 1) / (uc.n + v.vsize))), 6)
        FROM pairs p
        JOIN bcnt b USING (u, w)
        JOIN ucnt uc ON uc.tok = p.u
        CROSS JOIN v
        GROUP BY p.doc_id
        """
    ).fetchall()
    assert len(want) == len(got) == 500
    for doc_id, n, s in want:
        assert got[doc_id][0] == n
        assert got[doc_id][1] == pytest.approx(s, abs=2e-6), doc_id


def test_bigram_surprisal_external_model_and_oov(spark):
    import math

    from xdump_spark.operators.curation import bigram_surprisal_frame

    corpus = spark.createDataFrame([(1, "a b z")], "doc_id long, text string")
    bigrams = spark.createDataFrame([("a", "b", 3)], "u string, w string, n long")
    unigrams = spark.createDataFrame(
        [("a", 4), ("b", 4)], "tok string, n long"
    )
    out = bigram_surprisal_frame(corpus, bigrams=bigrams, unigrams=unigrams).collect()[0]
    # V=2; (a,b): -ln((3+1)/(4+2)); (b,z) OOV bigram: -ln((0+1)/(4+2))
    want = round((-math.log(4 / 6) + -math.log(1 / 6)) / 2, 6)
    assert out.n_bigrams == 2 and out.mean_surprisal == pytest.approx(want, abs=1e-6)


def test_bigram_surprisal_shuffled_text_scores_higher(spark):
    """The discriminative property the scorer exists for: natural word
    ORDER scores lower than the same tokens shuffled (identical unigram
    counts, so the unigram scorer cannot tell them apart)."""
    from pyspark.sql import functions as F

    from xdump_spark.operators.curation import bigram_surprisal_frame
    from xdump_spark.operators.text import tokens

    natural = "the cat sat on the mat " * 10
    shuffled = "mat the on sat the cat " * 10   # same unigram counts
    model_src = spark.createDataFrame(
        [(i, natural) for i in range(20)], "doc_id long, text string"
    )
    probe = spark.createDataFrame(
        [(100, natural), (101, shuffled)], "doc_id long, text string"
    )
    # fit the model on the natural corpus, score both probes against it
    t = model_src.select(tokens(F.col("text")).alias("_t"))
    unigrams = (
        t.select(F.explode("_t").alias("tok")).groupBy("tok").agg(F.count("*").alias("n"))
    )
    bigrams = (
        t.select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(_t)-2), i -> struct(_t[i] as u, _t[i+1] as w))"
                )
            ).alias("p")
        )
        .select("p.u", "p.w")
        .groupBy("u", "w")
        .agg(F.count("*").alias("n"))
    )
    scores = {
        r.doc_id: r.mean_surprisal
        for r in bigram_surprisal_frame(
            probe, bigrams=bigrams, unigrams=unigrams
        ).collect()
    }
    assert scores[101] > scores[100]


def test_build_vocab_and_tokenize_roundtrip(spark):
    from xdump_spark.operators.curation import build_vocab, tokenize_frame

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat"),
            (3, "unseen glyph"),
        ],
        "doc_id long, text string",
    )
    vocab = build_vocab(docs.filter("doc_id <= 2"))  # fit on docs 1-2 only
    v = {r.tok: (r.token_id, r.n) for r in vocab.collect()}
    # frequency-then-token deterministic ids, 1-based
    assert v["the"] == (1, 3) and v["sat"] == (2, 2)
    assert set(v) == {"the", "cat", "sat", "on", "mat", "dog"}

    out = {r.doc_id: r for r in tokenize_frame(docs, vocab).collect()}
    ids = {t: i for t, (i, _) in v.items()}
    assert out[1].ids == [ids["the"], ids["cat"], ids["sat"], ids["on"], ids["the"], ids["mat"]]
    assert out[1].n_tokens == 6 and out[1].n_oov == 0
    assert out[3].ids == [0, 0] and out[3].n_oov == 2  # OOV -> unk id 0

    # decode round-trip: non-OOV ids map back to the original tokens
    rev = {i: t for t, i in ids.items()}
    decoded = [rev[i] for i in out[2].ids]
    assert decoded == ["the", "dog", "sat"]


def test_tokenize_matches_token_counts_on_real_docs(spark):
    """n_tokens from the encoder must agree with the oracle-checked
    token_count_frame on the real documents table (same tokenizer)."""
    from xdump_spark.operators.curation import build_vocab, tokenize_frame
    from xdump_spark.operators.text import token_count_frame

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    vocab = build_vocab(docs)
    got = {r.doc_id: (r.n_tokens, r.n_oov) for r in tokenize_frame(docs, vocab).collect()}
    want = {r.doc_id: r.n_ws_tokens for r in token_count_frame(docs).collect()}
    assert {d: n for d, (n, _) in got.items()} == want
    assert all(o == 0 for _, o in got.values())  # full vocab -> no OOV


def test_tokenize_zero_shuffle_plan(spark):
    from xdump_spark.operators.curation import build_vocab, tokenize_frame

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    vocab = build_vocab(docs.limit(50))
    plan = tokenize_frame(docs, vocab)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan  # Arrow-batched, not row-at-a-time


def test_training_shards_end_to_end(spark):
    from xdump_spark.operators.curation import (
        build_vocab,
        pack_sequences,
        tokenize_frame,
        training_shards,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(150)
    vocab = build_vocab(docs)
    shards = training_shards(docs, vocab, budget=256).collect()

    # every doc's tokens appear exactly once, concatenated in pack order
    packs = {r.seq_id: list(r.doc_ids) for r in pack_sequences(docs, 256).collect()}
    ids_by_doc = {r.doc_id: list(r.ids) for r in tokenize_frame(docs, vocab).collect()}
    assert {r.seq_id for r in shards} == set(packs)
    for r in shards:
        want = [i for d in packs[r.seq_id] for i in ids_by_doc[d]]
        assert list(r.input_ids) == want, r.seq_id
        assert r.n_tokens == len(want)
        assert r.n_tokens <= 256 or r.n_docs == 1  # budget bound (oversize singleton)
    total = sum(len(v) for v in ids_by_doc.values())
    assert sum(r.n_tokens for r in shards) == total  # exactly-once coverage


def test_training_shards_over_span_stripped_input(spark, tmp_path):
    """Regression: composing training_shards directly onto
    strip_duplicated_spans output used to die in task execution with
    INTERNAL_ERROR 'Cannot evaluate expression: encode(...)' — Spark 4.1
    leaves the pandas UDF un-extracted when its input is the strip
    rebuild expression (and checkpointing the UDF-bearing frame trips
    the same bug). The narrow-source checkpoint inside training_shards
    must keep this composition writable."""
    from xdump_spark.operators.curation import build_vocab, training_shards
    from xdump_spark.operators.spans import strip_duplicated_spans

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    cur = strip_duplicated_spans(docs, k=8).drop("n_removed_tokens")
    vocab = build_vocab(cur)
    out = str(tmp_path / "shards")
    training_shards(cur, vocab, budget=256).write.parquet(out)
    assert spark.read.parquet(out).count() > 0


def test_mixture_drift(spark):
    from xdump_spark.operators.curation import mixture_drift, mixture_stats

    before = spark.createDataFrame(
        [(1, "a b c", "s1"), (2, "d e", "s2"), (3, "f g h i", "s2")],
        "doc_id long, text string, source string",
    )
    after = spark.createDataFrame(
        [(1, "a b c", "s1"), (4, "x y z w v", "s3")],
        "doc_id long, text string, source string",
    )
    drift = {
        r.source: r
        for r in mixture_drift(mixture_stats(before), mixture_stats(after)).collect()
    }
    assert set(drift) == {"s1", "s2", "s3"}
    assert drift["s2"].n_tokens_before == 6 and drift["s2"].n_tokens_after == 0
    assert drift["s3"].share_before == 0.0 and drift["s3"].n_tokens_after == 5
    assert drift["s1"].share_delta == pytest.approx(3 / 8 - 3 / 9, abs=1e-5)
    total_delta = sum(r.share_delta for r in drift.values())
    assert total_delta == pytest.approx(0.0, abs=1e-5)


def test_tokenize_rejects_malformed_vocab(spark):
    from xdump_spark.operators.curation import tokenize_frame

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    bad = spark.createDataFrame([("a", 1)], "word string, wid long")
    with pytest.raises(ValueError, match="tok"):
        tokenize_frame(docs, bad)


def test_gopher_filter_rules(spark):
    from xdump_spark.operators.curation import gopher_filter

    good = ("the quick brown fox jumps over a lazy dog and keeps running through "
            "green fields while many different common words vary nicely across "
            "sentences that describe weather, travel, music, food, science and "
            "history with enough breadth to pass every repetition gate easily, "
            "because natural prose rarely repeats itself in such short spans")
    rows = [
        (1, good),
        (2, "too short."),                                  # min_tokens
        (3, "zz " * 60),                                    # repetition + stopwords
        (4, ("1 2 3 4 5 6 7 8 9 10 " * 10)),                # alpha fraction
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in gopher_filter(df).collect()}
    assert out[1].kept and out[1].drop_reasons == []
    assert not out[2].kept and "min_tokens" in out[2].drop_reasons
    assert not out[3].kept
    assert {"min_ttr", "max_top_token_frac", "min_stopword_hits"} <= set(out[3].drop_reasons)
    assert not out[4].kept and "min_alpha_word_frac" in out[4].drop_reasons
    # schema: original columns preserved, plus kept + drop_reasons
    assert set(out[1].asDict()) == {"doc_id", "text", "kept", "drop_reasons"}


def test_gopher_filter_overrides_and_plan(spark):
    from xdump_spark.operators.curation import gopher_filter

    df = spark.createDataFrame([(1, "the and of to in is that with done here now")],
                               "doc_id long, text string")
    strict = gopher_filter(df).collect()[0]
    assert not strict.kept and "min_tokens" in strict.drop_reasons
    relaxed = gopher_filter(df, rules={"min_tokens": 5}).collect()[0]
    assert relaxed.kept, relaxed.drop_reasons
    plan = gopher_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan


# ------------------------------------------------------ mixture_resample ----
def test_mixture_resample_hits_target_shares(spark):
    from xdump_spark.operators.curation import mixture_resample

    # web 6000, code 3000, books 1000
    base = (
        spark.range(10000)
        .select(
            F.col("id").alias("doc_id"),
            F.lit("some sample words here").alias("text"),
            F.when(F.col("id") < 6000, "web")
            .when(F.col("id") < 9000, "code")
            .otherwise("books")
            .alias("source"),
        )
    )
    target = {"web": 0.5, "code": 0.3, "books": 0.2}
    sampled, rates = mixture_resample(base, target)
    # books is binding: current share 0.1 vs target 0.2 → c = 0.5, books keeps all
    assert rates["books"] == 1.0
    assert rates["web"] == pytest.approx(0.5 * 0.5 / 0.6, abs=1e-9)
    assert rates["code"] == pytest.approx(0.5 * 0.3 / 0.3, abs=1e-9)
    got = {r["source"]: r["n"] for r in sampled.groupBy("source").agg(F.count("*").alias("n")).collect()}
    total = sum(got.values())
    for s, share in target.items():
        assert got[s] / total == pytest.approx(share, abs=0.03)
    # determinism across runs
    again, _ = mixture_resample(base, target)
    assert {r.doc_id for r in again.collect()} == {r.doc_id for r in sampled.collect()}


def test_mixture_resample_strict_and_renormalize(spark):
    from xdump_spark.operators.curation import mixture_resample

    base = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.lit("t").alias("text"),
        F.when(F.col("id") < 50, "a").otherwise("b").alias("source"),
    )
    with pytest.raises(ValueError, match="missing from corpus"):
        mixture_resample(base, {"a": 0.5, "zz": 0.5})
    # renormalized: zz ignored, a takes its full weight; b (no target) drops
    sampled, rates = mixture_resample(base, {"a": 0.5, "zz": 0.5}, strict=False)
    assert set(rates) == {"a"} and rates["a"] == 1.0
    assert {r.source for r in sampled.select("source").distinct().collect()} == {"a"}
    assert sampled.count() == 50


def test_mixture_resample_by_tokens(spark):
    from xdump_spark.operators.curation import mixture_resample

    # a-docs are 4x longer: token shares a=0.8, b=0.2 at equal doc counts
    base = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "w w w w w w w w").otherwise("w w").alias("text"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("source"),
    )
    sampled, rates = mixture_resample(base, {"a": 0.5, "b": 0.5}, by_tokens=True)
    assert rates["b"] == 1.0 and rates["a"] == pytest.approx(0.25, abs=1e-9)
    toks = (
        sampled.groupBy("source")
        .agg(F.sum(F.size(F.split(F.trim(F.col("text")), r"\s+"))).alias("t"))
        .collect()
    )
    got = {r.source: r.t for r in toks}
    assert got["a"] / (got["a"] + got["b"]) == pytest.approx(0.5, abs=0.05)


def test_compression_ratio_frame(spark):
    """Repetitive text compresses far better than high-entropy text;
    values cross-checked against Python zlib directly."""
    import zlib

    from xdump_spark.operators.curation import compression_ratio_frame

    rows = [
        (1, "spam ham " * 200),                      # highly redundant
        (2, "k9#xQ!v7$mZp2@wL5&nR8*cT4^bY6%hU3(jF"),  # high entropy
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in compression_ratio_frame(df).collect()}
    assert got[1].compression_ratio < 0.05
    assert got[2].compression_ratio > 0.5
    assert got[3].compression_ratio == 1.0 and got[3].n_bytes == 0
    for i, t in rows[:2]:
        b = t.encode()
        assert got[i].n_compressed == len(zlib.compress(b, 6))
        assert abs(got[i].compression_ratio - len(zlib.compress(b, 6)) / len(b)) < 1e-6


def test_readability_frame(spark):
    from xdump_spark.operators.text import readability_frame

    rows = [
        (1, "The cat sat. The dog ran. It was fun."),       # easy: short words
        (2, "Incomprehensibility characterizes multisyllabic terminological considerations."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in readability_frame(df).collect()}
    assert got[1].n_sentences == 3 and got[1].n_words == 9
    assert got[1].flesch > 90          # simple prose scores high
    assert got[2].flesch < 0           # dense jargon goes negative
    # plan: pure codegen, no Python stage
    plan = readability_frame(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
