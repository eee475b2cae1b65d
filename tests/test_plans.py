"""Physical-plan regression tests: the optimizations the engine relies on
at scale (predicate pushdown to parquet, column pruning, broadcast of dim /
key-set sides, semi-join planning) must actually appear in the executed
plans — a correct-but-full-scan plan is a scale bug even when results match.
"""

import contextlib
import io

import pytest

import xdump_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = Q.queries()[name](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_no_entry_plans_cartesian_or_row_udf(spark):
    """Registry-wide scale-smell sweep: no entry's physical plan may
    contain a CartesianProduct (unbounded pair blowup) or BatchEvalPython
    (row-at-a-time Python UDF — only Arrow-batched ArrowEvalPython /
    mapInPandas stages are allowed in hot paths). Catches a regression in
    ANY entry, not just the individually-pinned plans below.

    BroadcastNestedLoopJoin is tolerated: it only appears for broadcast
    one-row frames (e.g. the mixture total), which is bounded by the
    broadcast size check."""
    offenders = {}
    for name in Q.queries():
        plan = plan_of(spark, name)
        smells = [
            s
            for s in ("CartesianProduct", "BatchEvalPython")
            if s in plan
        ]
        if smells:
            offenders[name] = smells
    assert not offenders, f"scale smells in plans: {offenders}"


def test_q6_filters_pushed_to_scan(spark):
    plan = plan_of(spark, "tpch_q6")
    assert "PushedFilters" in plan
    # the selective predicates must reach the parquet reader, not a
    # post-scan Filter only
    assert "l_discount" in plan.split("PushedFilters")[1][:400]


def test_q14_broadcasts_dim_and_prunes_columns(spark):
    plan = plan_of(spark, "tpch_q14_promo")
    assert "BroadcastHashJoin" in plan
    # lineitem scan must read only the 3 needed columns
    li_schema = [
        seg for seg in plan.split("ReadSchema: ")[1:] if "l_extendedprice" in seg
    ][0].splitlines()[0]
    assert "l_partkey" in li_schema and "l_discount" in li_schema
    assert "l_comment" not in li_schema and "l_quantity" not in li_schema


def test_semijoin_is_broadcast_left_semi(spark):
    plan = plan_of(spark, "xd_semijoin_supplier")
    assert "LeftSemi" in plan
    assert "Broadcast" in plan


def test_anti_join_planned_left_anti(spark):
    plan = plan_of(spark, "anti_parts_quiet")
    assert "LeftAnti" in plan


def test_q18_preaggregates_before_join(spark):
    plan = plan_of(spark, "tpch_q18_big")
    # the lineitem aggregate (partial + final) must sit BELOW the join with
    # orders: HashAggregate appears before the first SortMergeJoin/
    # BroadcastHashJoin node id referencing o_orderkey
    assert "HashAggregate" in plan
    agg_pos = plan.index("HashAggregate")
    join_pos = min(
        (plan.index(j) for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin") if j in plan),
        default=len(plan),
    )
    assert agg_pos < join_pos or "sum_qty" in plan


def test_q1_partial_aggregation(spark):
    # scan+agg query: map-side partial aggregation (two HashAggregate
    # phases) keeps the shuffle to one row per group per partition
    plan = plan_of(spark, "tpch_q1")
    assert plan.count("HashAggregate") >= 2


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key join without any Exchange —
    the co-located-join property the scale design relies on."""
    import uuid

    from pyspark.sql import functions as F

    from xdump_spark.sources.bucketed import (
        is_shuffle_free_join,
        read_bucketed,
        write_bucketed,
    )

    suffix = uuid.uuid4().hex[:8]
    ta, tb = f"bk_orders_{suffix}", f"bk_lineitem_{suffix}"
    orders = spark.range(0, 10_000).select(
        F.col("id").alias("o_orderkey"), (F.col("id") % 7).alias("o_custkey")
    )
    lineitem = spark.range(0, 30_000).select(
        (F.col("id") % 10_000).alias("l_orderkey"), F.col("id").alias("l_qty")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a sort-merge join: at real scale neither side broadcasts,
        # which is exactly when bucketing pays
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_bucketed(orders, ta, "o_orderkey", n_buckets=8,
                       path=str(tmp_path / ta))
        write_bucketed(lineitem, tb, "l_orderkey", n_buckets=8,
                       path=str(tmp_path / tb))
        a, b = read_bucketed(spark, ta), read_bucketed(spark, tb)
        joined = a.join(b, a.o_orderkey == b.l_orderkey)
        assert is_shuffle_free_join(joined)
        assert joined.count() == 30_000

        # sanity: the same join over non-bucketed frames DOES shuffle
        plain = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        assert not is_shuffle_free_join(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")


def test_salted_closure_materialization_equivalent(spark, employees_catalog):
    """salt_materialize spreads the final semi-join over salt sub-keys
    (operators/skew.py) without changing the selected rows, and the salt
    column really is in the join."""
    from xdump_spark.planner.closure import compute_closure

    seeds = {"employees": "SELECT * FROM employees ORDER BY id DESC LIMIT 2"}
    plain = compute_closure(employees_catalog, partial_tables=seeds, spark=spark)
    salted = compute_closure(
        employees_catalog, partial_tables=seeds, spark=spark, salt_materialize=4
    )
    for t in plain:
        assert {tuple(r) for r in plain[t].collect()} == {
            tuple(r) for r in salted[t].collect()
        }, t
    assert "__salt" in salted["employees"]._jdf.queryExecution().toString()

    # r6: the dict form salts ONLY the named tables (the int form salts
    # every reached table's materialize join — measured 7x overhead on a
    # Zipf decade when the referenced keys are unique)
    scoped = compute_closure(
        employees_catalog, partial_tables=seeds, spark=spark,
        salt_materialize={"employees": 4},
    )
    for t in plain:
        assert {tuple(r) for r in plain[t].collect()} == {
            tuple(r) for r in scoped[t].collect()
        }, t
    assert "__salt" in scoped["employees"]._jdf.queryExecution().toString()
    for t in plain:
        if t != "employees":
            assert "__salt" not in scoped[t]._jdf.queryExecution().toString(), t


def test_q19_disjunct_extracted_to_both_scans(spark):
    """Catalyst must extract each side's union-of-ranges from the
    OR-of-ANDs predicate and push it into that side's parquet scan — a
    disjunctive filter evaluated only post-join re-reads both tables in
    full at scale."""
    plan = plan_of(spark, "tpch_q19_disjunct")
    pushed = plan.split("PushedFilters")
    li_pushed = [s for s in pushed[1:] if "l_quantity" in s.splitlines()[0]]
    part_pushed = [s for s in pushed[1:] if "p_brand" in s.splitlines()[0]]
    assert li_pushed, "lineitem scan lost the quantity-range disjunction"
    assert part_pushed, "part scan lost the brand/size disjunction"
    assert "BroadcastHashJoin" in plan


def test_q10_filters_pushed(spark):
    plan = plan_of(spark, "tpch_q10_returns")
    pushed = plan.split("PushedFilters")
    assert any("l_returnflag,R" in s.splitlines()[0] for s in pushed[1:])
    assert any("o_orderdate" in s.splitlines()[0] for s in pushed[1:])


def test_winnow_single_shuffle_no_udf(spark):
    """The winnowing pipeline must stay JVM-side (no Python evaluation)
    and shuffle once on the document key — both window passes and the
    distinct reuse the doc_id hash partitioning."""
    plan = plan_of(spark, "text_winnow")
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # exactly one exchange: explode + both window passes + the final
    # distinct all reuse the doc_id hash partitioning
    import re

    exchanges = re.findall(r"\(\d+\) Exchange", plan)
    assert len(exchanges) == 1, plan


def _plan_of_df(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_span_dedup_plan_shape(spark):
    """duplicated_spans' scale contract: duplicated-hash detection is
    map-side combined (partial HashAggregate before its exchange), the
    island-merge windows are doc_id-partitioned (an UNPARTITIONED window
    would drag every window row to one task), and nothing leaves the JVM."""
    from xdump_spark.operators.spans import duplicated_spans

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan_of_df(duplicated_spans(docs, k=8))
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan  # pure codegen, no Python at all
    assert plan.count("HashAggregate") >= 4  # partial+final for dup detect
    import re

    # every Window node must be partitioned by doc_id
    for m in re.finditer(r"Arguments: \[[^\]]*windowspecdefinition\(([^,]*),", plan):
        assert "doc_id" in m.group(1), plan


def test_redact_and_normalize_zero_shuffle(spark):
    """The cleaning hot path is a pure projection: no exchange, no Python."""
    from xdump_spark.operators.cleaning import normalize_text, redact_pii

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan_of_df(normalize_text(redact_pii(docs)))
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_deterministic_shuffle_single_range_exchange(spark):
    from xdump_spark.operators.cleaning import deterministic_shuffle

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan_of_df(deterministic_shuffle(docs, seed=3))
    import re

    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    assert "rangepartitioning" in plan, plan


def test_dedup_lines_plan_no_python_no_cartesian(spark):
    """dedup_lines stays JVM-side: line text never shuffles (only hashes
    and indices), no Python evaluation, no cartesian."""
    from xdump_spark.operators.cleaning import dedup_lines

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan_of_df(dedup_lines(docs))
    assert "EvalPython" not in plan and "CartesianProduct" not in plan


def test_build_vocab_bounds_window_with_take_ordered(spark):
    """build_vocab must never window over the unbounded distinct-word
    table: the plan has to bound it first via TakeOrderedAndProject
    (orderBy+limit), with the single-partition row_number Window applied
    only to the ≤max_size survivor set."""
    from xdump_spark.operators.curation import build_vocab

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan_of_df(build_vocab(docs, max_size=1000))
    assert "TakeOrderedAndProject" in plan, plan
    # the Window node must sit ABOVE the TakeOrderedAndProject (applied to
    # the bounded result), i.e. appear before it in the top-down plan text
    assert plan.index("Window") < plan.index("TakeOrderedAndProject"), plan


def test_exact_hash_store_antijoin_never_shuffles_history(spark, tmp_path):
    """The 100 TB contract of ExactHashStore: the increment anti-join
    exchanges ONLY the new batch (one Exchange, partitioned to the
    store's bucket count on the hash cols); the history is read
    pre-bucketed with no Exchange above its scan — so the store can
    grow without bound while per-increment shuffle stays O(|batch|)."""
    import re
    import uuid

    from pyspark.sql import functions as F

    from xdump_spark.operators.incremental import (
        ExactHashStore,
        content_hashes,
        incremental_exact_dedup,
    )

    name = f"seen_{uuid.uuid4().hex[:8]}"
    store = ExactHashStore(spark, name, n_buckets=8,
                           path=str(tmp_path / name))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        b1 = spark.createDataFrame(
            [(i, f"doc {i % 50}") for i in range(100)], "doc_id long, text string"
        )
        assert incremental_exact_dedup(b1, store).count() == 50

        # at real scale neither side broadcasts — force the merge path
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        b2 = spark.createDataFrame(
            [(1000 + i, f"doc {i % 80}") for i in range(160)],
            "doc_id long, text string",
        )
        batch = (
            content_hashes(b2)
            .repartition(store.n_buckets, "h1", "h2")
            .groupBy("h1", "h2")
            .agg(F.min("id").alias("id"))
        )
        j = batch.join(store.read(), ["h1", "h2"], "left_anti")
        plan = j._jdf.queryExecution().executedPlan().toString()
        exchanges = re.findall(r"Exchange hashpartitioning\([^)]*\)", plan)
        assert len(exchanges) == 1, plan
        assert "h1" in exchanges[0] and "h2" in exchanges[0] and ", 8)" in exchanges[0]
        assert "Bucketed: true" in plan, plan
        assert j.count() == 30
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_vector_store_reads_partition_pruned_and_appends_few_files(spark, tmp_path):
    """The r8 store disciplines pinned: (a) `read_cells` plans a
    PartitionFilters prune on `cell` (an increment never scans the
    whole history), (b) the repartition-before-append keeps the file
    pile ~touched-cells-sized per increment instead of tasks×cells
    (SCALE.md r8 measured the unrepartitioned form non-viable:
    14,349 files / rising 16→59 s increments at 200k vectors)."""
    from xdump_spark import fsutil
    from xdump_spark.operators.incremental import (
        VectorStore,
        incremental_semantic_dedup,
    )

    def batch(lo: int):
        return spark.createDataFrame(
            [(lo + i,
              [float((lo + i) % 4 == j) + 0.01 * i for j in range(4)])
             for i in range(40)],
            "vec_id long, embedding array<double>",
        ).repartition(8)  # many upstream tasks: the file-explosion shape

    store = VectorStore(spark, str(tmp_path / "vs"))
    incremental_semantic_dedup(batch(0), store, n_cells=4, threshold=0.999)
    incremental_semantic_dedup(batch(100), store, n_cells=4, threshold=0.999)

    # (b) two increments × ≤4 touched cells: a handful of files, not 8×4×2
    files = fsutil.list_data_files(spark, store._assigned_path())
    assert 0 < len(files) <= 10, len(files)

    # (a) pruned read
    plan = _plan_of_df(store.read_cells([0, 1]))
    assert "PartitionFilters" in plan
    tail = plan.split("PartitionFilters")[1][:200]
    assert "cell" in tail and "dynamicpruning" not in tail


def test_pq_store_read_plans(spark, tmp_path):
    """r10 pq VectorStore plan pins (PLANS.md r10): read_cells scans
    the narrow code table with partition pruning and reconstructs via
    a column-level ArrowEvalPython ABOVE the scan; a cell-only consumer
    (ivf_balance's groupBy) prunes the decode away entirely — no
    Python in the plan, ReadSchema just the partition column."""
    from pyspark.sql import functions as F

    from xdump_spark.operators.incremental import (
        VectorStore,
        incremental_semantic_dedup,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.01/embeddings.parquet"
    ).limit(200)
    store = VectorStore(spark, str(tmp_path / "pq"), dtype="pq")
    incremental_semantic_dedup(emb, store, threshold=0.999, n_cells=4)

    plan = (
        store.read_cells([1, 2])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" in plan          # the decode, above the scan
    assert "codes:array<smallint>" in plan    # narrow on-disk width
    assert "PartitionFilters: [cell IN" in plan or "cell#" in plan.split(
        "PartitionFilters"
    )[1][:80]                                  # pruning reached the scan

    cells_only = store.index().assigned.groupBy("cell").agg(
        F.count("*").alias("n")
    )
    plan2 = cells_only._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan2     # decode pruned away
    assert "ReadSchema: struct<>" in plan2    # partition col only


def test_guard_probe_plan_never_shuffles_history(spark, tmp_path):
    """r11 exact_guard plan pins: probe_hashes scans ONLY the
    (neighbor_id, vh) columns of the store — codes never leave parquet
    — and the history side moves through NO shuffle exchange (the
    batch broadcasts in; the only hash exchange carries the
    batch-sized groupBy)."""
    import re

    from pyspark.sql import functions as F

    from xdump_spark.operators.incremental import (
        VectorStore,
        incremental_semantic_dedup,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.01/embeddings.parquet"
    ).limit(200)
    store = VectorStore(spark, str(tmp_path / "g"), dtype="pq",
                        exact_guard=True)
    incremental_semantic_dedup(emb, store, threshold=0.999, n_cells=4)

    batch = emb.limit(20).select(
        F.col("vec_id").alias("neighbor_id"),
        F.xxhash64(F.col("embedding").cast("array<double>")).alias("vh"),
    ).localCheckpoint(eager=True)
    probe = store.probe_hashes(batch)
    plan = probe._jdf.queryExecution().executedPlan().toString()

    # column pruning: the store scan reads neighbor_id+vh, never codes
    store_scans = [seg for seg in plan.split("ReadSchema: ")[1:]
                   if "vh" in seg[:200]]
    assert store_scans and all(
        "codes" not in seg[:200] for seg in store_scans
    ), plan
    assert "BroadcastExchange" in plan  # the batch side broadcasts
    # the only SHUFFLE exchange is the batch-sized groupBy — the
    # history never repartitions (hashpartitioning appears once)
    shuffles = re.findall(r"Exchange hashpartitioning", plan)
    assert len(shuffles) <= 1, plan
    assert "ArrowEvalPython" not in plan  # no decode on the probe path


def test_aqe_empty_relation_drops_collect_metrics_canary(spark, tmp_path):
    """r13 verdict Next #7: the exchange-free rewrite in
    ``pipeline._forget_corpus_rows`` exists BECAUSE AQE's
    empty-relation propagation replaces the post-shuffle subtree —
    INCLUDING the CollectMetrics node — whenever every read row is
    filtered out (the whole-bucket forget case), so the write action's
    observation comes back as an EMPTY row and ``Observation.get``
    fails (measured on Spark 4.1; PLANS.md r13). This canary pins BOTH
    halves of that premise on the forget path's exact shape
    (basePath'd leaf scan → broadcast-left marker join →
    CollectMetrics → filter → partitioned write). If the with-exchange
    half starts RETURNING the metric after a Spark upgrade, the
    premise changed — re-evaluate the no-exchange constraint (and this
    test) against PLANS.md r13 before trusting either shape."""
    import threading

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    src_dir = str(tmp_path / "corpus")
    (
        spark.range(50)
        .withColumn("_bucket", F.lit(0))
        .withColumn("doc", F.col("id") % 5)
        .write.partitionBy("_bucket").parquet(src_dir)
    )
    rows = spark.read.option("basePath", src_dir).parquet(
        src_dir + "/_bucket=0"
    )
    doomed = F.broadcast(
        spark.createDataFrame([(i,) for i in range(5)], ["doc"])
        .withColumn("_dm", F.lit(1))
    )

    def run(with_exchange: bool):
        obs = Observation()
        marked = rows.join(doomed, "doc", "left").observe(
            obs, F.coalesce(F.sum("_dm"), F.lit(0)).alias("doomed")
        )
        surv = marked.filter(F.col("_dm").isNull()).drop("_dm")
        if with_exchange:
            surv = surv.repartition(F.col("_bucket"))
        surv.write.mode("append").partitionBy("_bucket").parquet(
            str(tmp_path / f"out_{with_exchange}")
        )
        # obs.get on a dropped CollectMetrics raises (empty metrics
        # row); guard with a thread in case a future Spark blocks
        # instead — both count as "metric unavailable"
        result: dict = {}

        def fetch():
            try:
                result["value"] = dict(obs.get)
            except Exception as exc:  # noqa: BLE001 — the measured mode
                result["error"] = exc

        t = threading.Thread(target=fetch, daemon=True)
        t.start()
        t.join(timeout=60)
        return result

    # the shape _forget_corpus_rows ships: metric observed on the write
    assert run(with_exchange=False) == {"value": {"doomed": 50}}
    # the shape it deliberately avoids: the metric is unavailable
    res = run(with_exchange=True)
    assert "value" not in res, (
        "AQE now preserves CollectMetrics through empty-relation "
        f"propagation (observed {res}) — the no-exchange constraint in "
        "_forget_corpus_rows rests on the OLD behavior; re-run the "
        "PLANS.md r13 measurements before changing either."
    )
