"""Cross-pillar integration: the curation operators feed the dump/load
engine — a curated subset of the documents table exports through the
reference-format archive and round-trips losslessly. This is the
workflow the two halves of the engine exist to compose: select (curate)
→ dump → load."""

import pytest
from pyspark.sql import functions as F

from xdump_spark.catalog import load_sf_dir
from xdump_spark.engine import SparkDumpEngine
from xdump_spark.operators.dedup import exact_dedup
from xdump_spark.operators.curation import repetition_frame, stratified_sample

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def curated(spark):
    docs = load_sf_dir(spark, SF_DIR).tables["documents"]
    # dedup -> quality floor -> deterministic half-rate sample
    deduped = exact_dedup(docs)
    signals = repetition_frame(deduped).filter("ttr >= 0.3").select("doc_id")
    kept = deduped.join(signals, "doc_id")
    return stratified_sample(
        kept, {"en": 0.5, "de": 0.5, "fr": 0.5, "zh": 0.5, "es": 0.5}
    ).drop("sample_bucket")


def test_curated_subset_is_nontrivial(spark, curated):
    n_all = load_sf_dir(spark, SF_DIR).tables["documents"].count()
    n = curated.count()
    assert 0 < n < n_all


def test_curated_dump_load_roundtrip(spark, curated, tmp_path):
    cat = load_sf_dir(spark, SF_DIR, tables=["documents"])
    engine = SparkDumpEngine(spark, cat)
    zip_path = str(tmp_path / "curated.zip")
    counts = engine.dump(zip_path, partial_tables={"documents": curated})
    assert counts["documents"] == curated.count()

    loaded = SparkDumpEngine(spark, cat.__class__({})).load(zip_path)
    back = loaded.frames["documents"]
    # lossless: same ids, same text bytes (md5), schema preserved
    want = {
        (r.doc_id, r.h)
        for r in curated.select("doc_id", F.md5("text").alias("h")).collect()
    }
    got = {
        (r.doc_id, r.h)
        for r in back.select("doc_id", F.md5("text").alias("h")).collect()
    }
    assert got == want
    assert dict(back.dtypes)["doc_id"] == "bigint"
    # sequence state for the leaf table's serial key survived the trip
    assert int(loaded.sequences["documents"]) == curated.agg(F.max("doc_id")).first()[0]
