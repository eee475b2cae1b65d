"""Stage checkpointing (xdump_spark/checkpointing.py): restart-safety
actually restarted.

Covers the contract the module docstring claims: cold run → resume run
recomputes nothing (asserted with poisoned build thunks that would
throw if re-run), a changed parameter invalidates exactly the stages it
feeds, a crash mid-manifest-write leaves the previous manifest serving,
``checkpoint_stages`` subsets still chain fingerprints through
unmaterialized stages, and — the scenario a logical-plan fingerprint
breaks — a resume where every DataFrame-valued parameter was REBUILT
(new expression IDs, new partitioning), as a restarted driver would."""

import os

import pytest
from pyspark.sql import functions as F

from xdump_spark import fsutil
from xdump_spark.checkpointing import (
    StageCheckpointer,
    content_fingerprint,
    frame_fingerprint,
    input_fingerprint,
)
from xdump_spark.pipeline import prepare_training_corpus

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _ids(df):
    return [r.doc_id for r in df.select("doc_id").orderBy("doc_id").collect()]


# -- fingerprints ----------------------------------------------------------


def test_content_fingerprint_is_data_addressed(spark):
    rows = [(1, "a"), (2, "b"), (3, "c")]
    a = spark.createDataFrame(rows, "id long, s string")
    # rebuilt frame: new plan object, new expression IDs, different
    # partitioning and row order — same DATA, so same fingerprint
    b = spark.createDataFrame(list(reversed(rows)), "id long, s string").repartition(5)
    assert content_fingerprint(a) == content_fingerprint(b)
    c = spark.createDataFrame([(1, "a"), (2, "b"), (3, "X")], "id long, s string")
    assert content_fingerprint(a) != content_fingerprint(c)
    # and it is what frame_fingerprint uses for lineage-less params
    assert frame_fingerprint(a) == frame_fingerprint(b)
    assert frame_fingerprint(None) == "none"


def test_input_fingerprint_detects_inplace_overwrite(spark, docs, tmp_path):
    p = str(tmp_path / "landing")
    docs.limit(20).write.parquet(p)
    fp1 = input_fingerprint(spark.read.parquet(p))
    assert fp1 == input_fingerprint(spark.read.parquet(p))  # stable
    # same file names, same sizes — only mtime moves (a landing dir
    # re-dropped in place, the ADVICE r6 hazard)
    part = next(f for f in os.listdir(p) if f.endswith(".parquet"))
    st = os.stat(os.path.join(p, part))
    os.utime(os.path.join(p, part), (st.st_atime + 100, st.st_mtime + 100))
    assert input_fingerprint(spark.read.parquet(p)) != fp1


def test_input_fingerprint_sees_derivation(spark, docs):
    # same files, same schema, different derivation must not collide
    en = docs.filter("lang = 'en'").select("doc_id", "text")
    de = docs.filter("lang = 'de'").select("doc_id", "text")
    assert input_fingerprint(en) != input_fingerprint(de)
    # rebuilt same derivation → identical (canonicalized plan, no exprIds)
    en2 = docs.filter("lang = 'en'").select("doc_id", "text")
    assert input_fingerprint(en) == input_fingerprint(en2)


# -- StageCheckpointer unit ------------------------------------------------


def test_resume_skips_poisoned_thunk(spark, tmp_path):
    d = str(tmp_path / "ck")
    df = spark.range(10).withColumn("v", F.col("id") * 2)
    ck1 = StageCheckpointer(spark, d, "fp0")
    out1, n1, _ = ck1.stage("a", {"p": 1}, lambda: df)
    assert n1 == 10

    def boom():
        raise AssertionError("stage 'a' was recomputed on resume")

    ck2 = StageCheckpointer(spark, d, "fp0")
    out2, n2, _ = ck2.stage("a", {"p": 1}, boom)
    assert ck2.resumed == ["a"] and n2 == 10
    assert sorted(r.id for r in out2.collect()) == list(range(10))
    # resume=False rebuilds even with a valid checkpoint
    ck3 = StageCheckpointer(spark, d, "fp0", resume=False)
    ck3.stage("a", {"p": 1}, lambda: df)
    assert ck3.resumed == []


def test_param_and_input_changes_invalidate(spark, tmp_path):
    d = str(tmp_path / "ck")
    df = spark.range(5)
    ck = StageCheckpointer(spark, d, "fp0")
    ck.stage("a", {"p": 1}, df)
    # changed stage param → miss
    ck2 = StageCheckpointer(spark, d, "fp0")
    ck2.stage("a", {"p": 2}, df)
    assert ck2.resumed == []
    # changed INPUT fingerprint → miss even with the original params
    ck3 = StageCheckpointer(spark, d, "fpX")
    ck3.stage("a", {"p": 1}, df)
    assert ck3.resumed == []


def test_crash_mid_manifest_write_serves_previous(spark, tmp_path, monkeypatch):
    d = str(tmp_path / "ck")
    df = spark.range(7)
    ck = StageCheckpointer(spark, d, "fp0")
    ck.stage("a", {}, df)

    import xdump_spark.fsutil as fsmod

    real = fsmod.write_text_atomic

    def crash(*a, **k):
        raise IOError("simulated crash during manifest write")

    ck2 = StageCheckpointer(spark, d, "fp0")
    ck2.stage("a", {}, df)  # resume a, chain advances
    monkeypatch.setattr(fsmod, "write_text_atomic", crash)
    with pytest.raises(IOError):
        ck2.stage("b", {}, df.withColumn("x", F.lit(1)))
    monkeypatch.setattr(fsmod, "write_text_atomic", real)

    # previous manifest intact: 'a' still serves, 'b' recomputes cleanly
    ck3 = StageCheckpointer(spark, d, "fp0")
    out_a, n_a, _ = ck3.stage("a", {}, lambda: (_ for _ in ()).throw(AssertionError))
    assert n_a == 7
    out_b, n_b, _ = ck3.stage("b", {}, df.withColumn("x", F.lit(1)))
    assert n_b == 7 and ck3.resumed == ["a"]


def test_extra_roundtrips_through_manifest(spark, tmp_path):
    d = str(tmp_path / "ck")
    df = spark.range(3)
    ck = StageCheckpointer(spark, d, "fp0")
    _, _, x1 = ck.stage("a", {}, lambda: df, extra=lambda: {"rates": {"en": 0.5}})
    ck2 = StageCheckpointer(spark, d, "fp0")
    _, _, x2 = ck2.stage("a", {}, lambda: df, extra=lambda: {"rates": {"en": 0.9}})
    assert x1 == x2 == {"rates": {"en": 0.5}}  # served, extra-thunk skipped


# -- pipeline integration --------------------------------------------------


def _target(spark):
    # lineage-less DataFrame param: exercises the content fingerprint
    return spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)],
        "doc_id long, text string",
    )


def test_pipeline_cold_then_resume_recomputes_nothing(
    spark, docs, tmp_path, monkeypatch
):
    d = str(tmp_path / "ck")
    kw = dict(
        span_k=8, doc_dedup="exact", min_tokens=5,
        dsir_n=50, checkpoint_dir=d,
    )
    res1 = prepare_training_corpus(docs, dsir_target=_target(spark), **kw)
    assert res1.resumed == []
    expected = {"cleaned", "span_stripped", "doc_deduped", "quality_gated",
                "dsir_selected"}
    assert expected <= set(res1.audit)

    # poison the DSIR fit: a resumed run must never call it
    import xdump_spark.operators.dsir as dsir_mod

    def boom(*a, **k):
        raise AssertionError("fit_dsir ran on a resumed pipeline")

    monkeypatch.setattr(dsir_mod, "fit_dsir", boom)
    # every DataFrame param REBUILT (new exprIds + new partitioning),
    # as after a driver restart
    res2 = prepare_training_corpus(
        docs, dsir_target=_target(spark).repartition(3), **kw
    )
    assert set(res2.resumed) == expected
    assert res2.audit == res1.audit
    assert _ids(res2.corpus) == _ids(res1.corpus)


def test_pipeline_param_change_invalidates_downstream_only(spark, docs, tmp_path):
    d = str(tmp_path / "ck")
    kw = dict(span_k=8, doc_dedup="exact", checkpoint_dir=d)
    res1 = prepare_training_corpus(docs, min_tokens=5, **kw)
    # min_tokens feeds quality_gated: everything before it resumes,
    # quality_gated recomputes with the new floor
    res2 = prepare_training_corpus(docs, min_tokens=50, **kw)
    assert set(res2.resumed) == {"cleaned", "span_stripped", "doc_deduped"}
    assert res2.audit["doc_deduped"] == res1.audit["doc_deduped"]
    assert res2.audit["quality_gated"] < res1.audit["quality_gated"]


def test_pipeline_checkpoint_stages_subset(spark, docs, tmp_path):
    d = str(tmp_path / "ck")
    kw = dict(doc_dedup="exact", min_tokens=5,
              checkpoint_dir=d, checkpoint_stages={"doc_deduped"})
    res1 = prepare_training_corpus(docs, span_k=8, **kw)
    # only the requested stage materializes
    assert fsutil.is_dir(spark, fsutil.join(d, "doc_deduped"))
    assert not fsutil.is_dir(spark, fsutil.join(d, "cleaned"))
    res2 = prepare_training_corpus(docs, span_k=8, **kw)
    assert res2.resumed == ["doc_deduped"]
    # an EARLIER, unmaterialized stage's param still chains into the
    # fingerprint: changing span_k must invalidate doc_deduped
    res3 = prepare_training_corpus(docs, span_k=6, **kw)
    assert res3.resumed == []


def test_pipeline_mixture_rates_roundtrip_on_resume(spark, docs, tmp_path):
    d = str(tmp_path / "ck")
    srcs = [r.source for r in docs.select("source").distinct().limit(2).collect()]
    mix = {srcs[0]: 0.6, srcs[1]: 0.4}
    kw = dict(span_k=None, min_tokens=5, target_mixture=mix, checkpoint_dir=d)
    res1 = prepare_training_corpus(docs, **kw)
    res2 = prepare_training_corpus(docs, **kw)
    assert "mixture_rebalanced" in res2.resumed
    assert res2.mixture_rates == res1.mixture_rates
    assert res2.mixture_rates  # non-empty, served from the manifest


def test_pipeline_resume_false_rewrites(spark, docs, tmp_path):
    d = str(tmp_path / "ck")
    kw = dict(span_k=None, min_tokens=5, checkpoint_dir=d)
    prepare_training_corpus(docs, **kw)
    res2 = prepare_training_corpus(docs, resume=False, **kw)
    assert res2.resumed == []
