"""DSIR importance-resampling tests (operators/dsir.py).

Correctness is established three ways: (a) an independent DuckDB
recomputation of the hashed-gram log-weights (md5 hash mode — same
reproducibility trick as the simhash oracle), (b) distribution-level
behavior on constructed corpora (in-domain docs outscore out-of-domain
ones; resampling shifts the selected mix toward the target), and
(c) plan/determinism contracts (zero-shuffle scoring, bounded
TakeOrderedAndProject selection, partition-invariant results).
"""

import math

import numpy as np
import pytest

from xdump_spark.operators.dsir import (
    DEFAULT_BUCKETS,
    DSIRModel,
    dsir_resample,
    dsir_score,
    fit_dsir,
    hashed_ngram_counts,
)


@pytest.fixture(scope="module")
def corpora(spark):
    """Target: cooking-ish vocabulary. Raw: mostly legal-ish with an
    embedded cooking minority the selector should recover."""
    cook = ["bake the bread with yeast and flour", "simmer the garlic butter sauce",
            "knead dough then bake until golden", "roast vegetables with olive oil",
            "whisk eggs with sugar and flour"]
    legal = ["the party of the first part hereby agrees", "pursuant to the contract clause",
             "the court finds the defendant liable", "the statute requires written notice",
             "jurisdiction lies with the appellate court"]
    target = spark.createDataFrame([(i, t) for i, t in enumerate(cook)], "doc_id long, text string")
    raw_rows = []
    for i in range(60):
        base = cook[i % 5] if i % 6 == 0 else legal[i % 5]
        raw_rows.append((i, base + f" variant {i}"))
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    return target, raw


def test_hashed_counts_bounded_and_positive(spark, corpora):
    target, _ = corpora
    counts = hashed_ngram_counts(target, num_buckets=1024).collect()
    assert 0 < len(counts) <= 1024
    assert all(0 <= r.bucket < 1024 and r.n > 0 for r in counts)


def test_in_domain_docs_outscore_out_of_domain(spark, corpora):
    target, raw = corpora
    model = fit_dsir(target, raw, num_buckets=4096)
    scores = {r.doc_id: r.dsir_logw for r in dsir_score(raw, model).collect()}
    cook_ids = [i for i in range(60) if i % 6 == 0]
    legal_ids = [i for i in range(60) if i % 6 != 0]
    worst_cook = min(scores[i] for i in cook_ids)
    best_legal = max(scores[i] for i in legal_ids)
    assert worst_cook > best_legal, (worst_cook, best_legal)


def test_score_matches_duckdb_recomputation(spark, corpora):
    """md5 hash mode: DuckDB independently recomputes every doc's
    log-weight from the model's log-ratio table."""
    import duckdb

    target, raw = corpora
    B = 4096
    model = fit_dsir(target, raw, num_buckets=B, hash_fn="md5")
    got = {r.doc_id: r.dsir_logw for r in dsir_score(raw, model, round_to=4).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE ratio (bucket BIGINT, lr DOUBLE)")
    con.executemany(
        "INSERT INTO ratio VALUES (?, ?)",
        [(i, float(v)) for i, v in enumerate(model.log_ratio)],
    )
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", [(r.doc_id, r.text) for r in raw.collect()])
    sql = r"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN length(trim(lower(text))) = 0 THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS toks
  FROM docs),
g AS (
  SELECT doc_id, unnest(toks) AS gram FROM t
  UNION ALL
  SELECT doc_id, toks[i] || ' ' || toks[i+1] AS gram
  FROM t, LATERAL (SELECT unnest(range(1, len(toks))) AS i)
  WHERE len(toks) >= 2),
b AS (SELECT doc_id, (('0x' || substr(md5(gram), 1, 15))::UBIGINT % {B})::BIGINT AS bucket FROM g)
SELECT doc_id, sum(lr) AS logw FROM b JOIN ratio USING (bucket) GROUP BY doc_id
""".replace("{B}", str(B))
    want = {int(d): float(w) for d, w in con.execute(sql).fetchall()}
    assert set(got) == set(want)
    for d in got:
        assert abs(got[d] - want[d]) < 1e-3, (d, got[d], want[d])


def test_score_plan_zero_shuffle_single_arrow_stage(spark, corpora):
    target, raw = corpora
    model = fit_dsir(target, raw, num_buckets=1024)
    plan = dsir_score(raw, model)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert plan.count("ArrowEvalPython") == 1, plan


def test_resample_shifts_mix_toward_target(spark, corpora):
    target, raw = corpora
    model = fit_dsir(target, raw, num_buckets=4096)
    picked = [r.doc_id for r in dsir_resample(raw, model, n=10, seed=1).collect()]
    assert len(picked) == 10
    cook_frac_raw = len([i for i in range(60) if i % 6 == 0]) / 60
    cook_frac_sel = len([i for i in picked if i % 6 == 0]) / 10
    assert cook_frac_sel > 2 * cook_frac_raw  # strong enrichment


def test_resample_deterministic_and_bounded_plan(spark, corpora):
    target, raw = corpora
    model = fit_dsir(target, raw, num_buckets=1024)
    a = [r.doc_id for r in dsir_resample(raw, model, n=7, seed=3).collect()]
    b = [r.doc_id for r in dsir_resample(raw.repartition(13), model, n=7, seed=3).collect()]
    assert a == b
    c = [r.doc_id for r in dsir_resample(raw, model, n=7, seed=4).collect()]
    assert a != c  # seed actually matters
    plan = dsir_resample(raw, model, n=7)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_temperature_extremes(spark, corpora):
    """T→0 approaches deterministic top-n by weight; high T approaches
    uniform (selection decoupled from scores)."""
    target, raw = corpora
    model = fit_dsir(target, raw, num_buckets=4096)
    scores = {r.doc_id: r.dsir_logw for r in dsir_score(raw, model).collect()}
    top_by_weight = sorted(scores, key=lambda d: -scores[d])[:8]
    cold = [r.doc_id for r in dsir_resample(raw, model, n=8, temperature=1e-6, seed=5).collect()]
    assert set(cold) == set(top_by_weight)


def test_model_roundtrip():
    m = DSIRModel(log_ratio=np.array([0.5, -0.25]), num_buckets=2, hash_fn="md5")
    m2 = DSIRModel.from_dict(m.to_dict())
    assert np.array_equal(m.log_ratio, m2.log_ratio)
    assert (m2.num_buckets, m2.hash_fn) == (2, "md5")
    assert DEFAULT_BUCKETS == 65_536


def test_score_null_and_empty_text(spark, corpora):
    """Null text must score 0.0 like an empty doc — not kill the job
    (JSONL corpora routinely carry rows with a missing text field)."""
    target, raw = corpora
    model = fit_dsir(target, raw, num_buckets=1024)
    df = spark.createDataFrame(
        [(1, "bake the bread"), (2, None), (3, "")], "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_grams, r.dsir_logw) for r in dsir_score(df, model).collect()}
    assert got[2] == (0, 0.0)
    assert got[3] == (0, 0.0)
    assert got[1][0] > 0
