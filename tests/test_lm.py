"""Stupid-Backoff n-gram LM: hand-computed scores, backoff chain, OOV
floor, pruning, save/load, broadcast vs shuffle-join equality, bucket
split, plan pins, DuckDB cross-check."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from xdump_spark.operators import lm as LM

TRAIN = [(1, "a b c"), (2, "a b d")]


@pytest.fixture(scope="module")
def model(spark):
    df = spark.createDataFrame(TRAIN, "doc_id long, text string")
    return LM.train_ngram_lm(df)


def _score_map(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_train_counts(spark, model):
    assert model.n_tokens == 6
    assert model.vocab_size == 4
    uni = {r["w"]: r["n"] for r in model.unigrams.collect()}
    assert uni == {"a": 2, "b": 2, "c": 1, "d": 1}
    bi = {(r["u"], r["w"]): r["n"] for r in model.bigrams.collect()}
    assert bi == {("a", "b"): 2, ("b", "c"): 1, ("b", "d"): 1}
    tri = {(r["u"], r["v"], r["w"]): r["n"] for r in model.trigrams.collect()}
    assert tri == {("a", "b", "c"): 1, ("a", "b", "d"): 1}


def test_hand_computed_scores(spark, model):
    docs = spark.createDataFrame(
        [(10, "a b c"), (11, "a b x"), (12, "c b c"), (13, "")],
        "doc_id long, text string",
    )
    got = _score_map(LM.lm_score(docs, model))
    # "a b c": s(a)=3/10, s(b|a)=c(ab)/c(a)=2/2, s(c|a,b)=c(abc)/c(ab)=1/2
    exp = (math.log(10 / 3) + 0.0 + math.log(2)) / 3
    assert got[10]["mean_surprisal"] == round(exp, 6)
    assert got[10]["n_tokens"] == 3
    assert got[10]["ppl"] == round(math.exp(round(exp, 6)), 4)
    # "a b x": OOV trigram AND bigram AND unigram -> 0.4*0.4*(1/10)
    exp = (math.log(10 / 3) + 0.0 - math.log(0.4 * 0.4 * 0.1)) / 3
    assert got[11]["mean_surprisal"] == round(exp, 6)
    # "c b c": s(c)=2/10, s(b|c): c(cb)=0 -> 0.4*s(b)=0.4*3/10,
    # s(c|c,b): c(cbc)=0 -> 0.4*s(c|b)=0.4*(1/2)
    exp = (math.log(5) - math.log(0.12) - math.log(0.2)) / 3
    assert got[12]["mean_surprisal"] == round(exp, 6)
    # empty doc drops
    assert 13 not in got


def test_prune_min_count_changes_backoff(spark):
    df = spark.createDataFrame(TRAIN, "doc_id long, text string")
    pruned = LM.train_ngram_lm(df, prune_min_count=2)
    # singleton trigrams and bigrams pruned; (a,b) bigram (n=2) survives
    assert pruned.trigrams.count() == 0
    assert {(r["u"], r["w"]) for r in pruned.bigrams.collect()} == {("a", "b")}
    # N/V computed before pruning
    assert pruned.n_tokens == 6 and pruned.vocab_size == 4
    docs = spark.createDataFrame([(10, "a b c")], "doc_id long, text string")
    got = _score_map(LM.lm_score(docs, pruned))
    # s(c|a,b) now backs off: 0.4 * s(c|b) -> c(bc) pruned too ->
    # 0.4 * 0.4 * s(c) = 0.16 * 2/10
    exp = (math.log(10 / 3) + 0.0 - math.log(0.16 * 0.2)) / 3
    assert got[10]["mean_surprisal"] == round(exp, 6)


def test_save_load_roundtrip(spark, model, tmp_path):
    path = str(tmp_path / "lm")
    LM.save_ngram_lm(model, path)
    loaded = LM.load_ngram_lm(spark, path)
    assert loaded.n_tokens == model.n_tokens
    assert loaded.vocab_size == model.vocab_size
    assert loaded.alpha == model.alpha
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(["a b c", "c b c", "a b x"])],
        "doc_id long, text string",
    )
    assert _score_map(LM.lm_score(docs, loaded)) == _score_map(
        LM.lm_score(docs, model)
    )


def test_load_without_manifest_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="manifest"):
        LM.load_ngram_lm(spark, str(tmp_path / "nope"))


def test_broadcast_vs_shuffle_join_equal(spark, model):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(["a b c d a b", "x y", "b", "c b a"])],
        "doc_id long, text string",
    )
    assert _score_map(LM.lm_score(docs, model, broadcast=True)) == _score_map(
        LM.lm_score(docs, model, broadcast=False)
    )


def test_plan_broadcast_mode_never_shuffles_corpus(spark, model):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = LM.lm_score(docs, model)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert plan.count("BroadcastHashJoin") == 5
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_perplexity_buckets(spark, model):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["a b c", "a b d", "a b", "c b c", "x x x", "x y z"]
        )],
        "doc_id long, text string",
    )
    out = LM.perplexity_buckets(LM.lm_score(docs, model)).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r["ppl"])
    assert set(by_bucket) == {"head", "middle", "tail"}
    assert all(len(v) == 2 for v in by_bucket.values())
    assert max(by_bucket["head"]) <= min(by_bucket["middle"])
    assert max(by_bucket["middle"]) <= min(by_bucket["tail"])


def test_duckdb_cross_check_real_docs(spark, sf_documents):
    """Train on even doc_ids of the real documents table, score all,
    compare every doc's rounded surprisal with an independent DuckDB
    computation (same tokenizer, same backoff)."""
    docs = sf_documents
    train = docs.filter("doc_id % 2 = 0")
    model = LM.train_ngram_lm(train)
    got = {
        r["doc_id"]: (r["n_tokens"], r["mean_surprisal"])
        for r in LM.lm_score(docs, model).collect()
    }
    pdf = docs.select("doc_id", "text").toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    sql = LM.duckdb_backoff_sql(
        "SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0",
        "SELECT doc_id, text FROM documents",
    )
    exp = {
        int(r[0]): (int(r[1]), float(r[2]))
        for r in con.execute(sql).fetchall()
    }
    assert got == exp


def test_bucket_by_cutoffs_matches_ntile(spark, model, sf_documents):
    """With exact quantile cutoffs and no boundary ties, the zero-shuffle
    cutoff form assigns the same labels as the exact ntile."""
    scored = LM.lm_score(sf_documents, model)
    # distinct ppl per doc (real docs; drop any boundary-tied values)
    cuts = LM.ppl_cutoffs(scored, relative_error=0.0)
    ntile = {
        r["doc_id"]: r["bucket"]
        for r in LM.perplexity_buckets(scored).collect()
        if r["ppl"] not in cuts
    }
    by_cut = {
        r["doc_id"]: r["bucket"]
        for r in LM.bucket_by_cutoffs(scored, cuts).collect()
        if r["ppl"] not in cuts
    }
    assert ntile and ntile == by_cut
    plan = (
        LM.bucket_by_cutoffs(scored, cuts)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan  # the scale form never global-sorts

    with pytest.raises(ValueError, match="cutoffs"):
        LM.bucket_by_cutoffs(scored, [1.0])


def test_data_card_lm_section(spark, sf_documents, model):
    from xdump_spark.operators.datacard import data_card

    real_model = LM.train_ngram_lm(sf_documents.filter("doc_id % 2 = 0"))
    card = data_card(sf_documents, ngram_lm=real_model)
    assert {"mean", "p50", "count"} <= set(card["lm"]["ppl"])
    assert {"mean", "p50", "count"} <= set(card["lm"]["surprisal"])
    scored = LM.lm_score(sf_documents, real_model)
    assert card["lm"]["ppl"]["count"] == scored.count()
    got_mean = float(scored.agg(F.avg("ppl")).collect()[0][0])
    assert card["lm"]["ppl"]["mean"] == pytest.approx(got_mean, rel=1e-6)
    # default card has no lm section
    assert "lm" not in data_card(sf_documents)


def test_pipeline_ppl_gate(spark, sf_documents, tmp_path):
    """curate with ppl_model+max_ppl drops exactly the docs lm_score
    puts above the ceiling; model path and NgramLM object agree."""
    from xdump_spark.pipeline import prepare_training_corpus

    docs = sf_documents.withColumn("source", F.lit("web")).withColumn(
        "lang", F.lit("en")
    )
    model = LM.train_ngram_lm(docs.filter("doc_id % 2 = 0"))
    scored = LM.lm_score(docs, model)
    cutoff = scored.approxQuantile("ppl", [0.5], 0.0)[0]
    expect = {
        r["doc_id"]
        for r in scored.filter(F.col("ppl") <= cutoff).select("doc_id").collect()
    }
    res = prepare_training_corpus(
        docs, span_k=None, min_tokens=1, ppl_model=model, max_ppl=cutoff
    )
    assert "ppl_gated" in res.audit
    got = {r["doc_id"] for r in res.corpus.select("doc_id").collect()}
    # stages before the gate (cleaning/min_tokens=1) don't drop these docs
    assert got == expect and 0 < len(got) < docs.count()

    # saved-path form produces the identical gate
    path = str(tmp_path / "lm_model")
    LM.save_ngram_lm(model, path)
    res2 = prepare_training_corpus(
        docs, span_k=None, min_tokens=1, ppl_model=path, max_ppl=cutoff
    )
    assert {r["doc_id"] for r in res2.corpus.select("doc_id").collect()} == got

    with pytest.raises(ValueError, match="together"):
        prepare_training_corpus(docs, span_k=None, ppl_model=model)
    with pytest.raises(ValueError, match="together"):
        prepare_training_corpus(docs, span_k=None, max_ppl=100.0)


def test_ppl_gate_drops_only_measured_docs(spark, model):
    """The gate is an anti-join on the measured-above-max_ppl set, so it
    can never remove a doc lm_score produced no row for. The docs
    lm_score cannot score (whitespace-only → empty token array) are
    exactly the docs the always-on cleaning stage already removed
    (length(trim(text)) > 0, pipeline.py), so the audit must show the
    empty doc falling at quality_gated — and the gate itself dropping
    only the one doc with a measurement above the ceiling."""
    from xdump_spark.pipeline import prepare_training_corpus

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "x y z"), (3, "   ")],
        "doc_id long, text string",
    )
    scored = {r["doc_id"]: r["ppl"] for r in LM.lm_score(docs, model).collect()}
    assert set(scored) == {1, 2}  # 3 is unscorable: no row at all
    cutoff = (scored[1] + scored[2]) / 2
    res = prepare_training_corpus(
        docs, span_k=None, min_tokens=0, ppl_model=model, max_ppl=cutoff
    )
    kept = {r["doc_id"] for r in res.corpus.select("doc_id").collect()}
    assert kept == {1}
    # jurisdiction: 3 fell at cleaning, the gate removed exactly one
    assert res.audit["quality_gated"] == 2
    assert res.audit["ppl_gated"] == 1


def test_buckets_label_mismatch_raises(spark, model):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="labels"):
        LM.perplexity_buckets(LM.lm_score(docs, model), n_buckets=5)


def test_cli_train_lm_then_curate(spark, tmp_path, capsys):
    from xdump_spark import cli

    model_dir = str(tmp_path / "lm")
    args = cli.build_parser().parse_args(
        [
            "train-lm",
            "-i", "/root/testdata/sf0.001/documents.parquet",
            "-o", model_dir,
            "--prune-min-count", "2",
        ]
    )
    assert cli.run(args, spark) == 0
    assert "tokens" in capsys.readouterr().out
    loaded = LM.load_ngram_lm(spark, model_dir)
    assert loaded.n_tokens > 0 and loaded.vocab_size > 0
    # pruning applied on disk
    assert loaded.bigrams.filter("n < 2").count() == 0

    out = str(tmp_path / "corpus")
    args = cli.build_parser().parse_args(
        [
            "curate",
            "-i", "/root/testdata/sf0.001/documents.parquet",
            "-o", out,
            "--span-k", "8",
            "--ppl-model", model_dir,
            "--max-ppl", "5000",
        ]
    )
    assert cli.run(args, spark) == 0
    kept = spark.read.parquet(out)
    assert 0 < kept.count() <= 500


@pytest.fixture(scope="module")
def sf_documents(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(300)
    )
