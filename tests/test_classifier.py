"""Quality-classifier tests (operators/classifier.py): feature parity
with the oracle-checked signal frames, deterministic separable fit,
codegen-only scoring plan, model round-trip."""

import pytest
from pyspark.sql import functions as F

from xdump_spark.operators.classifier import (
    QUALITY_FEATURES,
    LinearModel,
    fit_linear_classifier,
    quality_classifier_scores,
    quality_feature_frame,
    score_frame,
)


@pytest.fixture(scope="module")
def labeled(spark):
    """Separable corpus: clean English prose (label 1) vs repetitive /
    punctuation-soup junk (label 0), ids interleaved."""
    clean = (
        "the quiet library keeps a careful record of every book that "
        "passes through its doors and the staff know most readers by name"
    )
    junk_rep = "buy now " * 18
    junk_punct = "!!! $$$ ### @@@ %%% ^^^ &&& *** ((( ))) !!! $$$ ### @@@"
    rows = []
    for i in range(40):
        rows.append((2 * i, clean + f" shelf {i} aisle {i % 7}", 1))
        junk = junk_rep if i % 2 else junk_punct + f" {i}"
        rows.append((2 * i + 1, junk, 0))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_feature_frame_matches_signal_frames(spark):
    """The one-pass feature frame must agree value-exactly with the
    oracle-checked quality_frame + repetition_frame on non-empty docs."""
    from xdump_spark.operators.curation import repetition_frame
    from xdump_spark.operators.text import quality_frame

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox and the lazy dog"),
            (2, "a a a a"),
            (3, "Punct, heavy! text; with: marks..."),
        ],
        "doc_id long, text string",
    )
    feat = {r.doc_id: r for r in quality_feature_frame(docs).collect()}
    q = {r.doc_id: r for r in quality_frame(docs).collect()}
    rep = {r.doc_id: r for r in repetition_frame(docs).collect()}
    for i in (1, 2, 3):
        assert feat[i].n_chars == q[i].n_chars
        assert feat[i].n_tokens == q[i].n_tokens
        assert feat[i].mean_token_len == q[i].mean_token_len
        assert feat[i].punct_ratio == q[i].punct_ratio
        assert feat[i].stopword_ratio == q[i].stopword_ratio
        assert feat[i].ttr == rep[i].ttr
        assert feat[i].top_token_frac == rep[i].top_token_frac
        assert feat[i].dup_bigram_frac == rep[i].dup_bigram_frac


def test_feature_frame_keeps_empty_docs(spark):
    docs = spark.createDataFrame([(1, ""), (2, "   "), (3, "ok then")],
                                 "doc_id long, text string")
    got = {r.doc_id: r for r in quality_feature_frame(docs).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1].n_tokens == 0.0 and got[1].ttr == 0.0


def test_fit_separates_and_is_deterministic(spark, labeled):
    feats = quality_feature_frame(labeled).join(
        labeled.select("doc_id", "label"), "doc_id"
    )
    m1 = fit_linear_classifier(feats)
    m2 = fit_linear_classifier(feats)
    assert m1 == m2  # bit-identical refit
    scored = score_frame(feats, m1).select("doc_id", "label", "quality_score").collect()
    acc = sum((r.quality_score >= 0.5) == (r.label == 1) for r in scored) / len(scored)
    assert acc >= 0.95, acc
    # every clean doc outscores every junk doc on this separable corpus
    lo_clean = min(r.quality_score for r in scored if r.label == 1)
    hi_junk = max(r.quality_score for r in scored if r.label == 0)
    assert lo_clean > hi_junk


def test_model_roundtrip_and_score_equivalence(spark, labeled):
    feats = quality_feature_frame(labeled).join(
        labeled.select("doc_id", "label"), "doc_id"
    )
    m = fit_linear_classifier(feats)
    m2 = LinearModel.from_dict(m.to_dict())
    assert m2 == m
    a = {r.doc_id: r.quality_score for r in score_frame(feats, m).collect()}
    b = {r.doc_id: r.quality_score for r in score_frame(feats, m2).collect()}
    assert a == b


def test_scoring_plan_is_codegen_only(spark):
    """End-to-end scoring of raw docs: one narrow projection — no KEY
    shuffle, no Python eval — so the corpus pass stays scan-bound. (A
    RoundRobin fan-out Exchange is allowed: that's sizing.spread()
    widening the tiny single-partition test file, a no-op at scale.)"""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    m = LinearModel(
        features=QUALITY_FEATURES,
        weights=tuple(0.1 * (i + 1) for i in range(len(QUALITY_FEATURES))),
        bias=-0.2,
        mean=tuple(0.5 for _ in QUALITY_FEATURES),
        std=tuple(1.0 for _ in QUALITY_FEATURES),
    )
    out = quality_classifier_scores(docs, m)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan
    assert "EvalPython" not in plan
    rows = out.limit(5).collect()
    # unstandardized toy weights can saturate the sigmoid to exactly 1.0
    assert all(r.quality_score is not None and 0.0 <= r.quality_score <= 1.0 for r in rows)


def test_fit_validates_labels(spark):
    bad = spark.createDataFrame([(1, 2.0)] , "doc_id long, label double").withColumns(
        {c: F.lit(0.0) for c in QUALITY_FEATURES}
    )
    with pytest.raises(ValueError, match="0/1"):
        fit_linear_classifier(bad)
    one_class = spark.createDataFrame([(1, 1), (2, 1)], "doc_id long, label int").withColumns(
        {c: F.lit(0.0) for c in QUALITY_FEATURES}
    )
    with pytest.raises(ValueError, match="both classes"):
        fit_linear_classifier(one_class)


def test_fit_caps_sample_deterministically(spark):
    """Above max_rows the fit samples by md5 bucket — same model on
    re-run, and the cap actually binds."""
    big = (
        spark.range(5000)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 2).cast("int").alias("label"),
        )
        .withColumns({c: (F.col("doc_id") % 2).cast("double") for c in QUALITY_FEATURES})
    )
    m1 = fit_linear_classifier(big, max_rows=500)
    m2 = fit_linear_classifier(big, max_rows=500)
    assert m1 == m2


def test_filter_on_score_not_pushed_into_signal_tree(spark):
    """Regression (round 4): filter(quality_score >= x) above the scoring
    projection must NOT be substituted below it — pushdown re-inlines the
    pinned token array into every per-element lambda of the predicate
    (measured 50× at 500 docs, unbounded at scale). The barrier keeps the
    Filter's condition a plain attribute reference."""
    from xdump_spark.operators.cleaning import normalize_text, redact_pii
    from xdump_spark.operators.classifier import with_quality_score
    from xdump_spark.operators.curation import gopher_filter

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    chain = redact_pii(normalize_text(docs))
    m = LinearModel(
        features=QUALITY_FEATURES,
        weights=tuple([0.3] * len(QUALITY_FEATURES)),
        bias=-0.1,
        mean=tuple([0.5] * len(QUALITY_FEATURES)),
        std=tuple([1.0] * len(QUALITY_FEATURES)),
    )
    for gated in (
        with_quality_score(chain, m).filter("quality_score >= 0.5"),
        gopher_filter(chain).filter("kept"),
    ):
        plan = gated._jdf.queryExecution().optimizedPlan().toString()
        filter_lines = [l for l in plan.splitlines() if l.lstrip().startswith(("Filter", "+- Filter", ":- Filter"))]
        assert filter_lines, plan[:500]
        # the predicate must reference the derived column, not its
        # inlined definition (lambda machinery = the blowup signature)
        assert all("lambdafunction" not in l for l in filter_lines), filter_lines


def test_train_quality_cli_roundtrip(spark, tmp_path, labeled):
    """train-quality writes a model JSON the curate stage can consume."""
    import json

    from xdump_spark.cli import build_parser, run
    from xdump_spark.config import _load_quality_model

    src = str(tmp_path / "labeled.parquet")
    labeled.write.parquet(src)
    out = tmp_path / "model.json"
    args = build_parser().parse_args(
        ["train-quality", "-i", src, "-o", str(out)]
    )
    assert run(args, spark) == 0
    m = _load_quality_model(str(out))
    assert m.features == QUALITY_FEATURES
    # the CLI-trained model separates its training corpus
    scored = score_frame(
        quality_feature_frame(labeled).join(labeled.select("doc_id", "label"), "doc_id"),
        m,
    ).collect()
    acc = sum((r.quality_score >= 0.5) == (r.label == 1) for r in scored) / len(scored)
    assert acc >= 0.9
