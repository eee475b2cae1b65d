"""Product-quantization tests (operators/pq.py): deterministic train,
codebook round-trip, exact-limit agreement with cosine_topk, recall
floors on the real testdata embeddings."""

import pytest
from pyspark.sql import functions as F

from xdump_spark.operators.pq import (
    PQCodebook,
    pq_encode,
    pq_topk,
    pq_topk_rerank,
    pq_train,
)
from xdump_spark.operators.similarity import cosine_topk


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_train_is_deterministic_and_roundtrips(spark, embs):
    cb1 = pq_train(embs, m=4, k=16)
    cb2 = pq_train(embs, m=4, k=16)
    assert cb1 == cb2
    assert PQCodebook.from_dict(cb1.to_dict()) == cb1
    assert cb1.dim == 64 and cb1.m == 4 and cb1.k == 16
    assert len(cb1.centroids) == 4
    assert all(len(c) == 16 and len(c[0]) == 16 for c in cb1.centroids)


def test_encode_shape_and_partition_invariance(spark, embs):
    cb = pq_train(embs, m=8, k=32)
    a = {r.vec_id: tuple(r.codes) for r in pq_encode(embs, cb).collect()}
    b = {
        r.vec_id: tuple(r.codes)
        for r in pq_encode(embs.repartition(13), cb).collect()
    }
    assert a == b  # codes don't depend on batching/partitioning
    assert all(len(c) == 8 and all(0 <= x < 32 for x in c) for c in a.values())


def test_exact_limit_matches_cosine_topk(spark):
    """m=1 with k >= n distinct vectors degrades PQ to exact vector
    quantization — top-k must equal the exact operator's."""
    rows = [
        (i, [float((i * 7 + j * 3) % 11 - 5) for j in range(8)]) for i in range(12)
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cb = pq_train(corpus, m=1, k=64)
    assert cb.k == 12  # capped at sample size: every vector its own centroid
    codes = pq_encode(corpus, cb)
    got = {
        (r.query_id, r.rn): r.neighbor_id
        for r in pq_topk(codes, cb, corpus.limit(4), k=3).collect()
    }
    want = {
        (r.query_id, r.rn): r.neighbor_id
        for r in cosine_topk(corpus, corpus.limit(4), k=3).collect()
    }
    assert got == want


def test_pq_recall_floor_on_real_embeddings(spark, embs):
    """Synthetic near-uniform-similarity embeddings are PQ's hard
    regime; defaults still clear 0.5 recall@5 (measured 0.64)."""
    queries = embs.limit(20)
    cb = pq_train(embs)
    codes = pq_encode(embs, cb).cache()
    try:
        approx = {
            (r.query_id, r.neighbor_id)
            for r in pq_topk(codes, cb, queries, k=5).collect()
        }
        exact = {
            (r.query_id, r.neighbor_id)
            for r in cosine_topk(embs, queries, k=5).collect()
        }
        assert len(approx & exact) / len(exact) >= 0.5
        # shortlist + exact re-rank recovers accuracy (measured 1.0)
        rer = {
            (r.query_id, r.neighbor_id)
            for r in pq_topk_rerank(codes, embs, cb, queries, k=5, rerank=50).collect()
        }
        assert len(rer & exact) / len(exact) >= 0.9
    finally:
        codes.unpersist()


def test_rerank_scores_are_exact_cosine(spark, embs):
    """Re-ranked scores must equal cosine_topk's for the overlapping
    (query, neighbor) pairs — same rounding, same association order."""
    queries = embs.limit(5)
    cb = pq_train(embs)
    codes = pq_encode(embs, cb)
    rer = {
        (r.query_id, r.neighbor_id): r.cosine_sim
        for r in pq_topk_rerank(codes, embs, cb, queries, k=5, rerank=100).collect()
    }
    exact = {
        (r.query_id, r.neighbor_id): r.cosine_sim
        for r in cosine_topk(embs, queries, k=5).collect()
    }
    shared = set(rer) & set(exact)
    assert shared, "expected overlapping pairs"
    assert all(rer[p] == pytest.approx(exact[p], abs=1e-9) for p in shared)


def test_validation_errors(spark, embs):
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(embs, m=7)
    with pytest.raises(ValueError, match="empty corpus"):
        pq_train(embs.limit(0))
    cb = pq_train(embs, m=4, k=8)
    bad = spark.createDataFrame(
        [(1, [0.0] * 32)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception, match="codebook dim"):
        pq_encode(bad, cb).collect()


# ---------------------------------------------------------------- IVFADC ----
def test_ivfpq_recall_and_rerank(spark, embs):
    """IVF cells prune the scan, PQ codes shrink it, exact rerank
    recovers accuracy (measured: n_probe=8 rerank 0.87; full-probe
    rerank 1.0; full-probe ADC 0.64 == plain pq_topk)."""
    from xdump_spark.operators.pq import ivfpq_build, ivfpq_search

    queries = embs.limit(20)
    idx = ivfpq_build(embs, n_cells=16)  # persists by default
    try:
        exact = {
            (r.query_id, r.neighbor_id)
            for r in cosine_topk(embs, queries, k=5).collect()
        }
        adc_full = {
            (r.query_id, r.neighbor_id)
            for r in ivfpq_search(idx, queries, k=5, n_probe=16).collect()
        }
        assert len(adc_full & exact) / len(exact) >= 0.5
        rr8 = {
            (r.query_id, r.neighbor_id)
            for r in ivfpq_search(
                idx, queries, k=5, n_probe=8, rerank=50, corpus=embs
            ).collect()
        }
        assert len(rr8 & exact) / len(exact) >= 0.75
        rr_full = ivfpq_search(
            idx, queries, k=5, n_probe=16, rerank=50, corpus=embs
        )
        pairs = {(r.query_id, r.neighbor_id): r.cosine_sim for r in rr_full.collect()}
        assert len(set(pairs) & exact) / len(exact) >= 0.9
        # reranked scores are exact cosine (same rounding as cosine_topk)
        ex_scores = {
            (r.query_id, r.neighbor_id): r.cosine_sim
            for r in cosine_topk(embs, queries, k=5).collect()
        }
        shared = set(pairs) & set(ex_scores)
        assert shared and all(
            pairs[p] == pytest.approx(ex_scores[p], abs=1e-9) for p in shared
        )
    finally:
        idx.unpersist()


def test_ivfpq_probed_cells_prune_the_scan(spark, embs):
    """A search must only read rows of probed cells: the code-table
    filter carries the isin(cell) predicate (partition pruning when the
    index is stored partitioned by cell)."""
    from xdump_spark.operators.pq import ivfpq_build, ivfpq_search

    idx = ivfpq_build(embs, n_cells=16, persist=False)
    out = ivfpq_search(idx, embs.limit(2), k=3, n_probe=2)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "cell" in plan and "IN" in plan.upper()
    rows = out.collect()
    assert rows and all(r.rn <= 3 for r in rows)
    # rerank without the corpus frame is a usage error
    with pytest.raises(ValueError, match="rerank requires"):
        ivfpq_search(idx, embs.limit(2), k=3, rerank=10)


def test_ivfpq_write_read_roundtrip(spark, embs, tmp_path):
    """Stored index searches identically to the in-session one, and the
    on-disk layout is partitioned by cell (file-pruned probes)."""
    import os

    from xdump_spark.operators.pq import ivfpq_build, ivfpq_read, ivfpq_search, ivfpq_write

    queries = embs.limit(5)
    idx = ivfpq_build(embs, n_cells=8, persist=False)
    want = {
        (r.query_id, r.rn): (r.neighbor_id, r.pq_sim)
        for r in ivfpq_search(idx, queries, k=3, n_probe=4).collect()
    }
    path = str(tmp_path / "ivfpq")
    ivfpq_write(idx, path)
    assert any(d.startswith("cell=") for d in os.listdir(os.path.join(path, "codes")))
    idx2 = ivfpq_read(spark, path)
    assert idx2.codebook == idx.codebook and idx2.n_cells == 8
    got = {
        (r.query_id, r.rn): (r.neighbor_id, r.pq_sim)
        for r in ivfpq_search(idx2, queries, k=3, n_probe=4).collect()
    }
    assert got == want
    # the stored-layout search plan actually prunes partitions
    plan = (
        ivfpq_search(idx2, queries, k=3, n_probe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan


def test_pq_reconstruct_round_trip(spark, embs):
    """Decode is the exact inverse gather of encode's codeword choice:
    encode(reconstruct(codes)) == codes under the same codebook (the
    property VectorStore's pq retrain relies on), and reconstruction
    cosine is high on real embedding structure."""
    import numpy as np

    from xdump_spark.operators.pq import (
        _assign_codes,
        _matrix,
        _normalize_rows,
        pq_reconstruct,
        pq_train,
    )

    cb = pq_train(embs, m=8, k=64)
    cents = cb.matrices()
    pdf = embs.limit(200).toPandas()
    X = _normalize_rows(_matrix(pdf["embedding"]))
    codes = _assign_codes(X, cb, cents)
    R = pq_reconstruct(codes, cb)
    # codes round-trip losslessly
    codes2 = _assign_codes(_normalize_rows(R), cb, cents)
    assert (codes == codes2).all()
    # reconstructions point the way the originals do
    cos = np.einsum("ij,ij->i", X, R) / np.linalg.norm(R, axis=1)
    assert cos.min() > 0.5 and cos.mean() > 0.8
