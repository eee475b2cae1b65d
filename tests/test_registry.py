"""Registry invariants for the driver's correctness harness.

Round 2 showed the driver evaluates at most the FIRST 50 ``queries()``
entries in definition order — entries 51-57 were silently never checked.
These tests pin the fix: total ≤ 50, every oracle-backed entry ahead of
every rows-only entry, and the operators pruned OUT of the registry
(approximate LSH variants, the codec decode stub) still execute as
pipelines here so they cannot silently rot.
"""

from __future__ import annotations

from xdump_spark import queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_registry_fits_driver_window():
    names = list(Q._REGISTRY)
    assert len(names) <= 50, (
        f"{len(names)} registry entries exceed the driver's 50-entry "
        "correctness window; merge or prune before adding more"
    )


def test_registry_oracle_entries_first():
    flags = [Q._REGISTRY[n][1] is not None for n in Q._REGISTRY]
    seen_rows_only = False
    for name, has_oracle in zip(Q._REGISTRY, flags):
        if not has_oracle:
            seen_rows_only = True
        else:
            assert not seen_rows_only, (
                f"oracle-backed entry {name!r} is defined after a rows-only "
                "entry; _finalize_registry() must keep oracle entries first"
            )


def test_every_oracle_name_is_a_query():
    assert set(Q.oracle_sql()) <= set(Q.queries())


def test_curation_sql_thresholds_match_rates():
    """The stratified-sample hex cutoffs are hard-coded in the DuckDB
    oracle SQL; they must track _CURATION_RATES via _hex_threshold or
    the two engines silently sample different documents."""
    from xdump_spark.operators.curation import _hex_threshold

    for lang, rate in Q._CURATION_RATES.items():
        expected = _hex_threshold(rate, 4)
        assert f"WHEN '{lang}' THEN '{expected}'" in Q._CURATION_SQL, (
            f"oracle SQL cutoff for {lang!r} does not match rate {rate}"
        )


def test_pruned_builders_still_run(spark):
    """The pruned rows-only builders (not registry entries any more)
    still produce non-empty, stable-schema results at sf0.001."""
    lsh_pairs = Q.embed_neardup_lsh(spark, SF_DIR)
    assert set(lsh_pairs.columns) == {"id_a", "id_b", "cosine_sim"}
    assert lsh_pairs.count() > 0

    topk = Q.knn_cosine_lsh(spark, SF_DIR)
    assert {"query_id", "neighbor_id", "cosine_sim", "rn"} <= set(topk.columns)
    assert topk.count() > 0

    decoded = Q.multimodal_decode_stub(spark, SF_DIR)
    assert decoded.count() > 0

    # pruned r4 (slots went to the oracle-backed dedup_spans / dedup_lines_docs)
    sh = Q.simhash_pairs(spark, SF_DIR)
    assert {"id_a", "id_b", "hamming"} <= set(sh.columns)
    assert sh.count() > 0

    ivf = Q.knn_cosine_ivf(spark, SF_DIR)
    assert {"query_id", "neighbor_id", "cosine_sim"} <= set(ivf.columns)
    assert ivf.count() > 0


def test_evict_stale_drops_dead_session_entries():
    """Cache entries keyed by a dead session's applicationId are evicted
    on the next access, and evicted IVF indexes are unpersisted."""

    class FakeIndex:
        released = False

        def unpersist(self):
            self.released = True

    fake = FakeIndex()
    Q._cat_cache[("dead-app", "/x")] = "stale"
    Q._closure_cache[("dead-app", "/x", "s")] = {}
    Q._ivf_cache[("dead-app", "/x")] = fake
    try:
        Q._evict_stale("live-app")
        assert ("dead-app", "/x") not in Q._cat_cache
        assert ("dead-app", "/x", "s") not in Q._closure_cache
        assert ("dead-app", "/x") not in Q._ivf_cache
        assert fake.released
    finally:
        for cache in (Q._cat_cache, Q._closure_cache, Q._ivf_cache):
            cache.pop(("dead-app", "/x"), None)
            cache.pop(("dead-app", "/x", "s"), None)
