"""Store retention (right-to-be-forgotten / TTL deletion): delete_ids
on the SignatureStore and VectorStore (float + pq), delete_docs /
delete_hashes on the ExactHashStore — deleted members become novel
again, survivors' bytes and decisions are untouched, untouched
partitions are never rewritten, and an interrupted delete re-runs to
completion (the compaction kernel's crash discipline)."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from xdump_spark.operators.incremental import (
    ExactHashStore,
    SignatureStore,
    VectorStore,
    incremental_exact_dedup,
    incremental_neardup,
    incremental_semantic_dedup,
)

BASE = "the quick brown fox jumps over the lazy dog again and again in the yard"
NEAR = "the quick brown fox jumped over the lazy dog again and again in the yard"
OTHER = "completely different content about distributed query engines and shuffles"
THIRD = "yet another unrelated document mentioning parquet footers and row groups"
DOC_SCHEMA = "doc_id long, text string"


def _vecs(spark, n=20, dim=4):
    return spark.createDataFrame(
        [(i, [float(i % dim == j) + 0.02 * i for j in range(dim)])
         for i in range(n)],
        "vec_id long, embedding array<double>",
    )


def _store_ids(spark, store):
    return sorted(
        r.neighbor_id
        for r in spark.read.parquet(store._assigned_path()).collect()
    )


# ------------------------------------------------------------- VectorStore


def test_vector_store_delete_ids_prunes_and_forgets(spark, tmp_path):
    from xdump_spark import fsutil

    vecs = _vecs(spark)
    store = VectorStore(spark, str(tmp_path / "vs"))
    incremental_semantic_dedup(vecs, store, threshold=0.9999, n_cells=3)
    path = store._assigned_path()
    cell_of = {
        r.neighbor_id: r.cell
        for r in spark.read.parquet(path).select("neighbor_id", "cell").collect()
    }
    doomed = [3, 8]
    doomed_cells = {cell_of[i] for i in doomed}
    before = {
        f for f, _ in fsutil.list_data_files(spark, path)
        if not any(f"/cell={c}/" in f for c in doomed_cells)
    }
    cv_before = {
        r.neighbor_id: list(r.cv)
        for r in spark.read.parquet(path).collect()
    }

    rpt = store.delete_ids(doomed)
    assert rpt["deleted_rows"] == 2
    assert rpt["cells_rewritten"] == len(doomed_cells)
    assert _store_ids(spark, store) == sorted(set(range(20)) - set(doomed))
    # untouched cells: file set byte-identical (partition pruning proof)
    after = {
        f for f, _ in fsutil.list_data_files(spark, path)
        if not any(f"/cell={c}/" in f for c in doomed_cells)
    }
    assert after == before
    # survivors' vectors untouched
    cv_after = {
        r.neighbor_id: list(r.cv)
        for r in spark.read.parquet(path).collect()
    }
    assert cv_after == {
        i: v for i, v in cv_before.items() if i not in doomed
    }
    # the semantic point: a re-send of a deleted vector is novel again,
    # while a re-send of a survivor still rejects against the store
    resend = spark.createDataFrame(
        [(103, cv_before[3]), (105, cv_before[5])],
        "vec_id long, embedding array<double>",
    )
    r = incremental_semantic_dedup(resend, store, threshold=0.9999)
    assert sorted(x.id for x in r.accepted.collect()) == [103]
    assert {(x.dup_id, x.kept_id) for x in r.rejects.collect()} == {(105, 5)}


def test_vector_store_delete_ids_pq_codes_verbatim(spark, tmp_path):
    vecs = _vecs(spark, n=25, dim=5)
    store = VectorStore(
        spark, str(tmp_path / "pqs"), dtype="pq", pq_m=5, pq_k=100
    )
    incremental_semantic_dedup(vecs, store, threshold=0.9999, n_cells=3)
    path = store._assigned_path()
    raw_before = {
        r.neighbor_id: (list(r.codes), r.vh)
        for r in spark.read.parquet(path).collect()
    }
    rpt = store.delete_ids([7])
    assert rpt["deleted_rows"] == 1
    raw_after = {
        r.neighbor_id: (list(r.codes), r.vh)
        for r in spark.read.parquet(path).collect()
    }
    # survivors' codes and exact-hashes moved verbatim (no decode/encode)
    assert raw_after == {
        i: v for i, v in raw_before.items() if i != 7
    }
    # vh channel: the byte-identical re-send of the DELETED vector is
    # accepted (nothing stored to force-reject against), the survivor's
    # still force-rejects at est 1.0
    emb = {r.vec_id: list(r.embedding) for r in _vecs(spark, 25, 5).collect()}
    resend = spark.createDataFrame(
        [(107, emb[7]), (109, emb[9])],
        "vec_id long, embedding array<double>",
    )
    r = incremental_semantic_dedup(resend, store, threshold=0.9999)
    assert sorted(x.id for x in r.accepted.collect()) == [107]
    rej = {(x.dup_id, x.kept_id): x.est for x in r.rejects.collect()}
    assert set(rej) == {(109, 9)} and rej[(109, 9)] == 1.0


def test_vector_store_delete_no_match_rewrites_nothing(spark, tmp_path):
    from xdump_spark import fsutil

    store = VectorStore(spark, str(tmp_path / "vs"))
    incremental_semantic_dedup(
        _vecs(spark), store, threshold=0.9999, n_cells=3
    )
    path = store._assigned_path()
    before = {f for f, _ in fsutil.list_data_files(spark, path)}
    rpt = store.delete_ids([999, 1000])
    assert rpt == {"deleted_rows": 0, "cells_rewritten": 0}
    assert {f for f, _ in fsutil.list_data_files(spark, path)} == before
    # meta-shell store (no committed increment): no-op, not a crash
    shell = VectorStore(spark, str(tmp_path / "shell"))
    assert shell.delete_ids([1]) == {
        "deleted_rows": 0, "cells_rewritten": 0,
    }


def test_vector_store_delete_ids_frame_and_search(spark, tmp_path):
    vecs = _vecs(spark)
    store = VectorStore(spark, str(tmp_path / "vs"))
    incremental_semantic_dedup(vecs, store, threshold=0.9999, n_cells=3)
    doomed = spark.createDataFrame([(2,), (4,)], "neighbor_id long")
    assert store.delete_ids(doomed)["deleted_rows"] == 2
    hits = store.search(
        vecs.filter("vec_id = 2"), k=20, n_probe=3
    )
    assert 2 not in {r.neighbor_id for r in hits.collect()}
    with pytest.raises(ValueError, match="empty delete request"):
        store.delete_ids([])


def test_vector_store_interrupted_delete_reruns_to_completion(
    spark, tmp_path, monkeypatch
):
    """Crash after the survivor append, before the original deletes:
    doomed rows still present beside duplicated survivors — decisions
    unchanged (duplicates harmless), and re-running the delete
    completes it."""
    from xdump_spark import fsutil

    vecs = _vecs(spark)
    store = VectorStore(spark, str(tmp_path / "vs"))
    incremental_semantic_dedup(vecs, store, threshold=0.9999, n_cells=3)

    real_delete = fsutil.delete

    def boom(spark_, path_, recursive=True):
        raise OSError("injected crash before original-file delete")

    monkeypatch.setattr(fsutil, "delete", boom)
    with pytest.raises(OSError, match="injected crash"):
        store.delete_ids([6])
    monkeypatch.setattr(fsutil, "delete", real_delete)

    # post-crash: 6 still stored (deletion incomplete), survivors of its
    # cell duplicated — a survivor re-send must still reject
    ids_now = _store_ids(spark, store)
    assert 6 in ids_now and len(ids_now) > 20
    emb = {r.vec_id: list(r.embedding) for r in vecs.collect()}
    r = incremental_semantic_dedup(
        spark.createDataFrame(
            [(106, emb[6])], "vec_id long, embedding array<double>"
        ),
        store, threshold=0.9999,
    )
    assert r.accepted.count() == 0

    # re-run completes: 6 gone; the crash-duplicated survivor rows stay
    # (the kernel's documented posture — duplicates are harmless in
    # every store; compact() merges files, never rows)
    rpt = store.delete_ids([6])
    assert rpt["deleted_rows"] >= 1
    assert set(_store_ids(spark, store)) == set(range(20)) - {6}
    # and they really are harmless: survivor re-send still rejects once
    r = incremental_semantic_dedup(
        spark.createDataFrame(
            [(111, emb[11])], "vec_id long, embedding array<double>"
        ),
        store, threshold=0.9999,
    )
    assert r.accepted.count() == 0
    assert {(x.dup_id, x.kept_id) for x in r.rejects.collect()} == {(111, 11)}


def test_vector_store_delete_purges_orphan_generations(spark, tmp_path):
    """Right-to-be-forgotten is about bytes: a crashed retrain's orphan
    generation dir may still hold the doomed vectors — delete_ids
    purges every non-live generation, not just the live rows."""
    import shutil

    vecs = _vecs(spark)
    store = VectorStore(spark, str(tmp_path / "vs"))
    incremental_semantic_dedup(vecs, store, threshold=0.9999, n_cells=3)
    # simulate the crash-orphan: a copied generation dir the meta never
    # came to reference
    shutil.copytree(
        str(tmp_path / "vs" / "assigned"),
        str(tmp_path / "vs" / "assigned_g9"),
    )
    store.delete_ids([3])
    names = {p.name for p in (tmp_path / "vs").iterdir()}
    assert "assigned_g9" not in names and "assigned" in names
    assert _store_ids(spark, store) == sorted(set(range(20)) - {3})


def test_vector_store_delete_then_retrain_pq(spark, tmp_path):
    """Deletion composes with the retrain lifecycle: a retrain after a
    delete re-buckets ONLY the survivors (codes verbatim — the
    code-lossless property), and a re-send of the deleted vector is
    accepted by the post-retrain geometry."""
    vecs = _vecs(spark, n=30, dim=5)
    store = VectorStore(
        spark, str(tmp_path / "pqs"), dtype="pq", pq_m=5, pq_k=100
    )
    incremental_semantic_dedup(vecs, store, threshold=0.9999, n_cells=3)
    codes_before = {
        r.neighbor_id: list(r.codes)
        for r in spark.read.parquet(store._assigned_path()).collect()
    }
    store.delete_ids([4, 9])
    rpt = store.retrain(4)
    assert rpt["rows"] == 28
    after = {
        r.neighbor_id: list(r.codes)
        for r in spark.read.parquet(store._assigned_path()).collect()
    }
    assert after == {
        i: c for i, c in codes_before.items() if i not in (4, 9)
    }
    emb = {r.vec_id: list(r.embedding) for r in vecs.collect()}
    r = incremental_semantic_dedup(
        spark.createDataFrame(
            [(104, emb[4]), (105, emb[5])],
            "vec_id long, embedding array<double>",
        ),
        store, threshold=0.9999,
    )
    assert sorted(x.id for x in r.accepted.collect()) == [104]
    assert {(x.dup_id, x.kept_id) for x in r.rejects.collect()} == {(105, 5)}


# ---------------------------------------------------------- SignatureStore


def test_signature_store_delete_ids(spark, tmp_path):
    store = SignatureStore(spark, str(tmp_path / "sig"))
    b1 = spark.createDataFrame([(1, BASE), (3, OTHER)], DOC_SCHEMA)
    incremental_neardup(b1, store)

    rpt = store.delete_ids([1])
    assert rpt["deleted_rows"] > 0 and rpt["bands_rewritten"] > 0
    assert {r.id for r in store.read().collect()} == {3}

    # near-dup of the deleted doc is novel again; near-dup of the
    # surviving doc still rejects
    b2 = spark.createDataFrame([(10, NEAR), (11, OTHER)], DOC_SCHEMA)
    r = incremental_neardup(b2, store)
    assert sorted(x.id for x in r.accepted.collect()) == [10]
    assert [(d, k) for d, k, _ in r.pairs] == [(11, 3)]

    assert store.delete_ids([999]) == {
        "deleted_rows": 0, "bands_rewritten": 0,
    }
    fresh = SignatureStore(spark, str(tmp_path / "nope"))
    assert fresh.delete_ids([1]) == {
        "deleted_rows": 0, "bands_rewritten": 0,
    }


# ---------------------------------------------------------- ExactHashStore


def test_exact_store_delete_docs_and_hashes(spark, tmp_path):
    from xdump_spark.operators.incremental import content_hashes

    name = f"ret_{uuid.uuid4().hex[:8]}"
    store = ExactHashStore(
        spark, name, n_buckets=4, path=str(tmp_path / name)
    )
    docs = spark.createDataFrame(
        [(1, BASE), (2, OTHER), (3, THIRD)], DOC_SCHEMA
    )
    incremental_exact_dedup(docs, store)

    # forget doc 1 BY CONTENT (normalization included: shouty re-send)
    rpt = store.delete_docs(
        spark.createDataFrame([(0, BASE.upper())], DOC_SCHEMA)
    )
    assert rpt["deleted_rows"] == 1 and rpt["files_rewritten"] > 0

    resend = spark.createDataFrame([(10, BASE), (11, OTHER)], DOC_SCHEMA)
    acc = incremental_exact_dedup(resend, store)
    assert sorted(r.id for r in acc.collect()) == [10]

    # delete_hashes path + no-match short-circuit
    before = set(spark.table(name).inputFiles())
    assert store.delete_docs(
        spark.createDataFrame([(0, "never stored")], DOC_SCHEMA)
    ) == {"deleted_rows": 0, "files_rewritten": 0}
    assert set(spark.table(name).inputFiles()) == before
    rpt = store.delete_hashes(
        content_hashes(
            spark.createDataFrame([(0, THIRD)], DOC_SCHEMA)
        )
    )
    assert rpt["deleted_rows"] == 1
    acc = incremental_exact_dedup(
        spark.createDataFrame([(20, THIRD)], DOC_SCHEMA), store
    )
    assert [r.id for r in acc.collect()] == [20]

    absent = ExactHashStore(
        spark, f"ret_{uuid.uuid4().hex[:8]}", n_buckets=4,
        path=str(tmp_path / "absent"),
    )
    assert absent.delete_docs(docs) == {
        "deleted_rows": 0, "files_rewritten": 0,
    }


def test_exact_store_delete_preserves_bucketed_plan(spark, tmp_path):
    """The post-delete store still joins without shuffling history (the
    bucketed-write plan property compact() also preserves): the
    increment anti-join plans exactly ONE Exchange — the batch's — and
    the history scan stays bucketed."""
    import re

    from xdump_spark.operators.incremental import content_hashes

    name = f"ret_{uuid.uuid4().hex[:8]}"
    store = ExactHashStore(
        spark, name, n_buckets=4, path=str(tmp_path / name)
    )
    docs = spark.createDataFrame(
        [(i, f"doc number {i} text") for i in range(50)], DOC_SCHEMA
    )
    incremental_exact_dedup(docs, store)
    store.delete_docs(docs.filter("doc_id < 5"))
    assert spark.table(name).count() == 45

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        batch = (
            content_hashes(
                spark.createDataFrame(
                    [(100 + i, f"doc number {i} text") for i in range(10)],
                    DOC_SCHEMA,
                )
            )
            .repartition(store.n_buckets, "h1", "h2")
            .groupBy("h1", "h2")
            .agg(F.min("id").alias("id"))
        )
        j = batch.join(store.read(), ["h1", "h2"], "left_anti")
        plan = j._jdf.queryExecution().executedPlan().toString()
        exchanges = re.findall(r"Exchange hashpartitioning\([^)]*\)", plan)
        assert len(exchanges) == 1, plan
        assert "Bucketed: true" in plan, plan
        # docs 0-4 were forgotten, so re-sends of them pass the store
        assert j.count() == 5
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {name}")
