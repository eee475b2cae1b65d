"""Preference-pair (DPO/reward) operators: validation rules, pair and
prompt dedup, contradiction detection, length-bias stats, DPO rendering
with response spans, benchmark decontamination — exact values on
crafted pairs, a DuckDB cross-check on pairs assembled from the real
documents table, and no-Python/no-shuffle plan pins."""

import duckdb
import pytest
from pyspark.sql import functions as F

from xdump_spark.operators import preference as P

PAIR_SCHEMA = (
    "pair_id long, prompt array<struct<role:string,content:string>>, "
    "chosen string, rejected string"
)

SF_DIR = "/root/testdata/sf0.001"


def msgs(*turns):
    return [{"role": r, "content": c} for r, c in turns]


@pytest.fixture(scope="module")
def pairs(spark):
    rows = [
        # valid, chosen longer
        (1, msgs(("user", "What is 2+2")), "it is 4 indeed", "5"),
        # valid, multi-turn prompt with system + assistant history
        (2, msgs(("system", "Be terse."), ("user", "hi"),
                 ("assistant", "hello"), ("user", "sum 1 1")), "2", "maybe 3"),
        # canon-duplicate of 1 (case/whitespace only)
        (3, msgs(("user", "what IS   2+2")), "IT IS 4   INDEED", "5"),
        # same responses as 1 but swapped preference -> contradiction
        (4, msgs(("user", "What is 2+2")), "5", "it is 4 indeed"),
        # invalid: prompt ends with assistant
        (5, msgs(("user", "q"), ("assistant", "a")), "x", "y"),
        # invalid: empty chosen
        (6, msgs(("user", "q2")), "   ", "y"),
        # invalid: empty rejected
        (7, msgs(("user", "q3")), "x", None),
        # invalid: identical after normalization
        (8, msgs(("user", "q4")), "Same  ANSWER", "same answer"),
        # invalid: empty prompt
        (9, [], "x", "y"),
        # invalid: bad role in prompt
        (10, msgs(("user", "q5"), ("tool", "t"), ("user", "q6")), "x", "y"),
        # valid, rejected longer
        (11, msgs(("user", "unique prompt")), "short", "a much longer rejected answer"),
    ]
    return spark.createDataFrame(rows, PAIR_SCHEMA)


def test_validate_rules(spark, pairs):
    got = {
        r["pair_id"]: (r["valid"], r["reason"])
        for r in P.validate_pairs(pairs).collect()
    }
    assert got[1] == (True, None)
    assert got[2] == (True, None)
    assert got[3] == (True, None)
    assert got[4] == (True, None)
    assert got[5] == (False, "prompt_not_user_last")
    assert got[6] == (False, "empty_chosen")
    assert got[7] == (False, "empty_rejected")
    assert got[8] == (False, "identical_responses")
    assert got[9] == (False, "empty_prompt")
    assert got[10] == (False, "unknown_role")
    assert got[11] == (True, None)


def test_validate_null_shapes(spark):
    rows = [
        (20, None, "x", "y"),
        (21, [{"role": None, "content": "q"}], "x", "y"),
        (22, [{"role": "user", "content": None}], "x", "y"),
    ]
    df = spark.createDataFrame(rows, PAIR_SCHEMA)
    got = {r["pair_id"]: r["reason"] for r in P.validate_pairs(df).collect()}
    assert got[20] == "empty_prompt"
    assert got[21] == "unknown_role"
    assert got[22] == "empty_content"


def test_dedup_pairs(spark, pairs):
    valid = P.validate_pairs(pairs).filter("valid").drop("valid", "reason")
    kept = {r["pair_id"] for r in P.dedup_pairs(valid).collect()}
    # 3 collapses into 1; 4 (swapped) survives dedup — it is a DIFFERENT
    # preference, contradiction handling's job
    assert kept == {1, 2, 4, 11}


def test_fingerprint_order_sensitivity(spark, pairs):
    fp = {
        r["pair_id"]: (r["h1"], r["h2"])
        for r in P.pair_fingerprint(pairs).collect()
    }
    assert fp[1] == fp[3]
    assert fp[1] != fp[4]


def test_contradicting_pairs(spark, pairs):
    valid = P.validate_pairs(pairs).filter("valid").drop("valid", "reason")
    got = {(r["id_a"], r["id_b"]) for r in P.contradicting_pairs(valid).collect()}
    # 1-4 and 3-4 (3 is canon-equal to 1); never 1-3 (same orientation)
    assert got == {(1, 4), (3, 4)}


def test_cap_per_prompt(spark):
    rows = [
        (i, msgs(("user", "hot prompt")), f"resp {i}", "base") for i in range(10)
    ] + [(100, msgs(("user", "cold prompt")), "a", "b")]
    df = spark.createDataFrame(rows, PAIR_SCHEMA)
    kept = {r["pair_id"] for r in P.cap_per_prompt(df, max_pairs=2).collect()}
    assert kept == {0, 1, 100}  # min ids win, cold prompt untouched


def test_pair_stats_hand_values(spark, pairs):
    got = {r["pair_id"]: r.asDict() for r in P.pair_stats(pairs).collect()}
    s = got[1]
    assert (s["prompt_turns"], s["prompt_tokens"]) == (1, 3)  # "what is 2+2"
    assert (s["chosen_tokens"], s["rejected_tokens"]) == (4, 1)
    assert (s["token_delta"], s["chosen_longer"]) == (3, True)
    s2 = got[2]
    assert (s2["prompt_turns"], s2["prompt_tokens"]) == (4, 7)
    assert (s2["token_delta"], s2["chosen_longer"]) == (1 - 2, False)


def test_pair_stats_keep_passthrough(spark, pairs):
    # keep= appends pass-through columns WITHOUT changing the stats —
    # the one-scan contract the posttrain panel fans validate+stats from
    flagged = P.validate_pairs(pairs)
    plain = {r["pair_id"]: r.asDict() for r in P.pair_stats(flagged).collect()}
    kept = {r["pair_id"]: r.asDict()
            for r in P.pair_stats(flagged, keep=("reason",)).collect()}
    reasons = {r["pair_id"]: r["reason"] for r in flagged.collect()}
    assert set(kept) == set(plain)
    for pid, row in kept.items():
        assert row.pop("reason") == reasons[pid]
        assert row == plain[pid]


def test_length_bias_stats(spark):
    rows = [
        (1, msgs(("user", "q")), "one two three", "one"),
        (2, msgs(("user", "q")), "one two", "one"),
        (3, msgs(("user", "q")), "one", "one two three four five"),
    ]
    df = spark.createDataFrame(rows, PAIR_SCHEMA)
    got = P.length_bias_stats(df)
    assert got["n_pairs"] == 3
    assert got["frac_chosen_longer"] == pytest.approx(2 / 3)
    assert got["mean_token_delta"] == pytest.approx((2 + 1 - 4) / 3)


def test_render_dpo_spans_slice_responses(spark, pairs):
    valid = P.validate_pairs(pairs).filter("valid").drop("valid", "reason")
    out = P.render_dpo(valid).collect()
    for r in out:
        sc, sr = r["span_chosen"], r["span_rejected"]
        assert r["text_chosen"][sc["start"]: sc["end"]] == r["chosen"]
        assert r["text_rejected"][sr["start"]: sr["end"]] == r["rejected"]
    # prompt-history assistant turns are NOT part of the response span
    two = next(r for r in out if r["pair_id"] == 2)
    assert "hello" in two["text_chosen"]
    assert two["text_chosen"][two["span_chosen"]["start"]:] == "2<|im_end|>\n"


def test_render_dpo_plain_template_and_bad_template(spark, pairs):
    one = pairs.filter("pair_id = 1")
    r = P.render_dpo(one, template="plain").collect()[0]
    assert r["text_chosen"] == (
        "user: What is 2+2\n\nassistant: it is 4 indeed\n\n"
    )
    with pytest.raises(ValueError, match="template"):
        P.render_dpo(one, template="nope")


def test_decontaminate_pairs(spark):
    bench = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    )
    rows = [
        # 8-gram overlap in the chosen response -> dropped
        (1, msgs(("user", "tell a story")),
         "the quick brown fox jumps over the lazy dog", "no"),
        # overlap inside the PROMPT -> dropped
        (2, msgs(("user", "quick brown fox jumps over the lazy dog today please")),
         "ok", "no"),
        (3, msgs(("user", "clean prompt")), "clean chosen", "clean rejected"),
    ]
    df = spark.createDataFrame(rows, PAIR_SCHEMA)
    kept = {r["pair_id"] for r in P.decontaminate_pairs(df, bench, n=8).collect()}
    assert kept == {3}


def test_prepare_preference_corpus_e2e(spark, pairs):
    res = P.prepare_preference_corpus(pairs, shuffle_seed=0)
    kept = {r["pair_id"] for r in res.pairs.collect()}
    # dedup drops 3; contradiction handling drops BOTH 1 and 4
    # (3 collapsed into 1, and 1 contradicts 4)
    assert kept == {2, 11}
    assert res.audit["input"] == 11
    assert res.audit["valid"] == 5
    assert res.audit["deduped"] == 4
    assert res.audit["consistent"] == 2
    reasons = {r["pair_id"]: r["reason"] for r in res.rejects.collect()}
    assert len(reasons) == 6 and reasons[9] == "empty_prompt"
    assert res.length_bias["n_pairs"] == 2
    cols = set(res.pairs.columns)
    assert {"text_chosen", "text_rejected", "span_chosen", "span_rejected"} <= cols


def test_prepare_preference_max_per_prompt_and_benchmark(spark):
    bench = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    rows = [
        (1, msgs(("user", "hot prompt")), "good answer one", "bad"),
        (2, msgs(("user", "hot prompt")), "good answer two", "bad"),
        (3, msgs(("user", "hot prompt")), "good answer three", "bad"),
        (4, msgs(("user", "alpha beta gamma delta epsilon zeta eta theta")),
         "leak", "no"),
    ]
    df = spark.createDataFrame(rows, PAIR_SCHEMA)
    res = P.prepare_preference_corpus(
        df, max_per_prompt=1, benchmark=bench, contamination_n=8,
        shuffle_seed=None, length_bias=False,
    )
    assert {r["pair_id"] for r in res.pairs.collect()} == {1}
    assert res.audit["capped"] == 2
    assert res.audit["decontaminated"] == 1
    assert res.length_bias is None


def test_duckdb_cross_check_stats_on_real_docs(spark):
    """pair_stats over pairs assembled from the real documents table,
    cross-checked value-by-value against an independent DuckDB
    computation with the shared tokenizer."""
    from xdump_spark.catalog import load_sf_dir
    from xdump_spark.operators.text import DUCKDB_TOKS_SQL

    docs = load_sf_dir(spark, SF_DIR).tables["documents"].select("doc_id", "text")
    df = docs.select(
        F.col("doc_id").alias("pair_id"),
        F.array(
            F.struct(F.lit("user").alias("role"), F.col("text").alias("content"))
        ).alias("prompt"),
        F.concat(F.lit("chosen: "), F.col("text")).alias("chosen"),
        F.lit("rejected stub").alias("rejected"),
    )
    got = {
        r["pair_id"]: (
            r["prompt_tokens"], r["chosen_tokens"],
            r["rejected_tokens"], r["token_delta"],
        )
        for r in P.pair_stats(df).collect()
    }
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    sql = f"""
    WITH t AS (
      SELECT doc_id, len({DUCKDB_TOKS_SQL}) AS nt,
             len({DUCKDB_TOKS_SQL.replace("text", "'chosen: ' || text")}) AS nc
      FROM documents
    )
    SELECT doc_id, nt, nc, 2 AS nr, nc - 2 AS delta FROM t
    """
    exp = {
        int(r[0]): (int(r[1]), int(r[2]), int(r[3]), int(r[4]))
        for r in con.execute(sql).fetchall()
    }
    assert got == exp


def test_plans_pure_codegen(spark, pairs):
    """Per-pair operators never hit Python and never shuffle; the dedup's
    only Exchange carries narrow hash rows."""
    for frame in (
        P.validate_pairs(pairs),
        P.pair_fingerprint(pairs),
        P.pair_stats(pairs),
        P.render_dpo(pairs),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "Exchange" not in plan
    dd = P.dedup_pairs(pairs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in dd


def test_incremental_pair_dedup_vs_store(spark, tmp_path):
    """Pair dedup as a store increment: canonical duplicates are
    rejected across increments, swapped-orientation pairs are NOT
    (different preference, different fingerprint)."""
    from xdump_spark.operators.incremental import ExactHashStore

    store = ExactHashStore(
        spark, "pair_store_t", n_buckets=4, path=str(tmp_path / "pair_store_t")
    )
    day1 = spark.createDataFrame(
        [(1, msgs(("user", "q")), "good answer", "bad")],
        PAIR_SCHEMA,
    )
    assert {r["id"] for r in P.dedup_pairs_incremental(day1, store).collect()} == {1}
    day2 = spark.createDataFrame(
        [
            (10, msgs(("user", "Q")), "GOOD   answer", "bad"),  # canon dup of 1
            (11, msgs(("user", "q")), "bad", "good answer"),    # swapped: new
        ],
        PAIR_SCHEMA,
    )
    assert {r["id"] for r in P.dedup_pairs_incremental(day2, store).collect()} == {11}


def test_prepare_pairs_with_store_two_drops(spark, tmp_path):
    from xdump_spark.operators.incremental import ExactHashStore

    store = ExactHashStore(
        spark, "pair_front_store_t", n_buckets=4,
        path=str(tmp_path / "pair_front_store_t"),
    )
    day1 = spark.createDataFrame(
        [(1, msgs(("user", "q")), "good", "bad")], PAIR_SCHEMA
    )
    res1 = P.prepare_preference_corpus(
        day1, dedup_store=store, shuffle_seed=None, length_bias=False
    )
    assert res1.pairs.count() == 1
    res1.store_commit()
    day2 = spark.createDataFrame(
        [
            (10, msgs(("user", "Q")), "GOOD", "bad"),   # store dup
            (11, msgs(("user", "q2")), "fine", "meh"),
        ],
        PAIR_SCHEMA,
    )
    res2 = P.prepare_preference_corpus(
        day2, dedup_store=store, shuffle_seed=None, length_bias=False
    )
    assert {r["pair_id"] for r in res2.pairs.collect()} == {11}


def test_pairs_from_message_lists(spark):
    """HF-style full-message-list records convert to the standard shape;
    shape problems are flagged, canonical prefix comparison ignores
    whitespace/case but not roles or content."""
    LIST_SCHEMA = (
        "pair_id long, chosen array<struct<role:string,content:string>>, "
        "rejected array<struct<role:string,content:string>>"
    )
    rows = [
        # clean: shared prompt, different final assistant turns
        (1,
         msgs(("system", "be kind"), ("user", "hi"), ("assistant", "hello!")),
         msgs(("system", "be kind"), ("user", "hi"), ("assistant", "yo"))),
        # whitespace/case prefix difference -> still a match
        (2,
         msgs(("user", "What  Is 2+2"), ("assistant", "4")),
         msgs(("user", "what is 2+2"), ("assistant", "5"))),
        # prefix CONTENT differs -> mismatch
        (3,
         msgs(("user", "q1"), ("assistant", "a")),
         msgs(("user", "q2"), ("assistant", "b"))),
        # rejected ends on a user turn
        (4,
         msgs(("user", "q"), ("assistant", "a")),
         msgs(("user", "q"), ("assistant", "a"), ("user", "more"))),
        # empty list
        (5, msgs(("user", "q"), ("assistant", "a")), []),
    ]
    df = spark.createDataFrame(rows, LIST_SCHEMA)
    out = {r["pair_id"]: r for r in P.pairs_from_message_lists(df).collect()}
    assert out[1]["shape_reason"] is None
    assert [m["role"] for m in out[1]["prompt"]] == ["system", "user"]
    assert (out[1]["chosen"], out[1]["rejected"]) == ("hello!", "yo")
    assert out[2]["shape_reason"] is None
    assert out[2]["chosen"] == "4" and out[2]["rejected"] == "5"
    assert out[3]["shape_reason"] == "prompt_mismatch"
    assert out[3]["prompt"] is None
    assert out[4]["shape_reason"] == "no_final_assistant"
    assert out[5]["shape_reason"] == "empty_messages"
    # the clean rows flow straight into the standard front door
    clean = P.pairs_from_message_lists(df).filter(
        "shape_reason is null").drop("shape_reason")
    res = P.prepare_preference_corpus(clean, shuffle_seed=None, length_bias=False)
    assert {r["pair_id"] for r in res.pairs.collect()} == {1, 2}
    # pure codegen
    plan = P.pairs_from_message_lists(df)._jdf.queryExecution(
        ).executedPlan().toString()
    assert "BatchEvalPython" not in plan and "Exchange" not in plan


# -- pairs_from_ratings (scored-response interchange) -----------------------

RATINGS_SCHEMA_STR = "prompt string, response string, rating double"


@pytest.fixture(scope="module")
def ratings(spark):
    rows = [
        # prompt P1: A=4.0, B=2.0, C=4.0 (tie with A), D blank (dropped)
        ("What is 2+2", "Answer A", 4.0),
        ("what IS   2+2", "Answer B", 2.0),   # canon-same prompt
        ("What is 2+2", "Answer C", 4.0),
        ("What is 2+2", "   ", 5.0),
        # prompt P2: annotator rows for the SAME response average (1+3)/2=2,
        # response E=3.0
        ("Second question", "resp D", 1.0),
        ("Second question", "resp  D", 3.0),  # canon-same response
        ("Second question", "resp E", 3.0),
        # prompt P3: all tied -> no pair
        ("Tied question", "t1", 2.0),
        ("Tied question", "t2", 2.0),
        # null rating dropped
        ("What is 2+2", "Answer Z", None),
    ]
    return spark.createDataFrame(rows, RATINGS_SCHEMA_STR)


def test_ratings_best_vs_worst_hand_values(spark, ratings):
    out = P.pairs_from_ratings(ratings).collect()
    by_prompt = {r["prompt"][0]["content"]: r for r in out}
    # P3 all tied -> dropped; P1 and P2 emit one pair each
    assert len(out) == 2
    p1 = by_prompt["What is 2+2"]
    # tie at 4.0 broken by canonical response text asc -> "Answer A"
    assert p1["chosen"] == "Answer A" and p1["rejected"] == "Answer B"
    assert p1["chosen_rating"] == 4.0 and p1["rejected_rating"] == 2.0
    # prompt is a single user turn wrapped from the string column
    assert [m.asDict() for m in p1["prompt"]] == [
        {"role": "user", "content": "What is 2+2"}
    ]
    p2 = by_prompt["Second question"]
    # annotator average: resp D = (1+3)/2 = 2.0 -> worst; E = 3.0 -> best
    assert p2["chosen"] == "resp E"
    assert p2["rejected"] == "resp  D"  # lexicographic-min surface form
    assert p2["rejected_rating"] == 2.0


def test_ratings_margin_boundaries(spark, ratings):
    # P1 delta = 2.0, P2 delta = 1.0: margin is a STRICT lower bound
    deltas = lambda m: sorted(
        round(r["chosen_rating"] - r["rejected_rating"], 6)
        for r in P.pairs_from_ratings(ratings, margin=m).collect()
    )
    assert deltas(0.0) == [1.0, 2.0]
    assert deltas(1.0) == [2.0]      # 1.0 not > 1.0 -> P2 dropped
    assert deltas(1.99) == [2.0]
    assert deltas(2.0) == []         # 2.0 not > 2.0 -> boundary drops


def test_ratings_all_pairs(spark, ratings):
    out = P.pairs_from_ratings(ratings, policy="all_pairs").collect()
    got = sorted(
        (r["prompt"][0]["content"], r["chosen"], r["rejected"]) for r in out
    )
    # P1: A>B, C>B (A vs C tied -> no pair either direction)
    # P2: E>D; P3 tied -> nothing
    assert got == [
        ("Second question", "resp E", "resp  D"),
        ("What is 2+2", "Answer A", "Answer B"),
        ("What is 2+2", "Answer C", "Answer B"),
    ]
    with pytest.raises(ValueError, match="policy"):
        P.pairs_from_ratings(ratings, policy="nope")


def test_ratings_message_list_prompt_and_duckdb(spark):
    """Message-list prompts pass through; best-vs-worst agrees with a
    DuckDB recomputation of the mean-then-argmax/argmin pipeline."""
    rows = [
        (msgs(("system", "s"), ("user", "q")), "r1", 1.0),
        (msgs(("system", "s"), ("user", "q")), "r2", 5.0),
        (msgs(("system", "s"), ("user", "q")), "r3", 3.0),
    ]
    df = spark.createDataFrame(
        rows,
        "prompt array<struct<role:string,content:string>>, "
        "response string, rating double",
    )
    out = P.pairs_from_ratings(df).collect()
    assert len(out) == 1
    assert [m.asDict() for m in out[0]["prompt"]] == msgs(
        ("system", "s"), ("user", "q")
    )
    assert out[0]["chosen"] == "r2" and out[0]["rejected"] == "r1"
    con = duckdb.connect()
    want = con.execute(
        "select arg_max(r, rating), arg_min(r, rating) from ("
        "  select r, avg(rating) as rating from ("
        "    values ('r1', 1.0), ('r2', 5.0), ('r3', 3.0)) t(r, rating)"
        "  group by r)"
    ).fetchone()
    assert (out[0]["chosen"], out[0]["rejected"]) == want


def test_ratings_front_door_composes(spark, ratings):
    """prepare_preference_corpus(from_ratings=True) runs the converted
    pairs through the full pipeline (validate/dedup/render)."""
    res = P.prepare_preference_corpus(
        ratings, from_ratings=True, audit=True, length_bias=False
    )
    got = res.pairs.collect()
    assert res.audit["input"] == 2 and res.audit["valid"] == 2
    assert {r["chosen"] for r in got} == {"Answer A", "resp E"}
    assert all(r["text_chosen"] and r["text_rejected"] for r in got)
    # deterministic pair ids: stable across a re-conversion
    again = {r["pair_id"] for r in P.pairs_from_ratings(ratings).collect()}
    assert {r["pair_id"] for r in got} == again


def test_streaming_preference_ingest(spark, tmp_path):
    """r7 verdict #5 e2e: two labeling drops + a redelivered drop
    through the streaming ingest — dedup holds across drops via the
    persistent store, within-drop contradictions drop, corrupt/invalid
    quarantine, and the final store contents equal the batch twin's."""
    import json

    from xdump_spark.operators.incremental import ExactHashStore

    inp = tmp_path / "drops"
    inp.mkdir()
    store = ExactHashStore(
        spark, "pref_stream_store_t", n_buckets=4,
        path=str(tmp_path / "pref_stream_store_t"),
    )
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    corrupt = str(tmp_path / "corrupt")
    rejects = str(tmp_path / "rejects")

    def pr(pid, q, ch, rj, src="lab"):
        return {"pair_id": pid, "prompt": [{"role": "user", "content": q}],
                "chosen": ch, "rejected": rj, "source": src}

    def drop(name, rows, junk=False):
        with open(inp / name, "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")
            if junk:
                fh.write("{broken\n")

    def run():
        q = P.streaming_preference_ingest(
            spark, str(inp), store, out, ckpt,
            corrupt_dir=corrupt, rejects_dir=rejects,
        )
        q.awaitTermination(120)

    d1 = [
        pr(1, "pick", "alpha", "beta"),
        pr(2, "bad", "same", "same"),            # invalid
    ]
    drop("day1.jsonl", d1, junk=True)
    run()
    assert {r["pair_id"] for r in spark.read.parquet(out).collect()} == {1}
    assert spark.read.parquet(corrupt).count() == 1
    rej = {r["pair_id"]: r["reason"]
           for r in spark.read.parquet(rejects).collect()}
    assert rej == {2: "identical_responses"}

    d2 = [
        pr(10, "pick", "ALPHA", "beta"),         # store dup of 1 (canon)
        pr(11, "fresh", "yes", "no"),
        pr(12, "flip", "x", "y"),                # within-drop contradiction
        pr(13, "flip", "y", "x"),
    ]
    drop("day2.jsonl", d2)
    run()
    got = {r["pair_id"] for r in spark.read.parquet(out).collect()}
    assert got == {1, 11}  # 10 deduped, 12/13 contradiction-dropped
    row11 = [r for r in spark.read.parquet(out).collect()
             if r["pair_id"] == 11][0]
    assert row11["text_chosen"] and row11["span_chosen"] is not None

    # redelivered drop: same content, new file -> everything already in
    # the store, nothing appended
    drop("day1_redelivered.jsonl", d1)
    run()
    assert spark.read.parquet(out).count() == 2

    # store contents equal the batch twin's (one store serves both)
    twin_store = ExactHashStore(
        spark, "pref_batch_store_t", n_buckets=4,
        path=str(tmp_path / "pref_batch_store_t"),
    )
    all_rows = spark.createDataFrame(
        [(r["pair_id"], r["prompt"], r["chosen"], r["rejected"])
         for r in d1 + d2], PAIR_SCHEMA,
    )
    res = P.prepare_preference_corpus(
        all_rows, dedup_store=twin_store, audit=False, length_bias=False
    )
    res.pairs.count()
    res.store_commit()

    def hashes(s):
        return sorted(
            (r["h1"], r["h2"])
            for r in spark.read.parquet(s.path).select("h1", "h2").collect()
        )

    assert hashes(store) == hashes(twin_store)


def test_pairs_from_ratings_prompt_surface_deterministic(spark):
    """Tied raw responses across annotators with DIFFERENT raw prompt
    surfaces: the surfaced prompt is the struct-min (a pure function of
    the group), not an arbitrary min_by winner — re-runs under any
    partitioning agree."""
    from xdump_spark.operators.preference import pairs_from_ratings

    rows = [
        ("Pick one", "alpha", 3.0),
        ("pick  ONE", "alpha", 1.0),   # same canonical prompt+response, tie on _resp
        ("pick one", "beta", 0.0),
    ]
    df = spark.createDataFrame(rows, "prompt string, response string, rating double")
    outs = set()
    for parts in (1, 7):
        p = pairs_from_ratings(df.repartition(parts)).collect()
        assert len(p) == 1
        outs.add(p[0]["prompt"][0]["content"])
    assert outs == {"Pick one"}  # lexicographic min surface, always


def test_prepare_preference_corpus_precomputed_flagged_identical(spark, pairs):
    """flagged= (r14 driver-side optimization) must be a pure no-op on
    results: passing validate_pairs' own output produces frames
    identical to the internal validation path."""
    base = P.prepare_preference_corpus(pairs, shuffle_seed=0)
    pre = P.prepare_preference_corpus(
        pairs, shuffle_seed=0, flagged=P.validate_pairs(pairs)
    )
    assert sorted(map(tuple, base.pairs.collect())) == sorted(
        map(tuple, pre.pairs.collect())
    )
    assert sorted(map(tuple, base.rejects.collect())) == sorted(
        map(tuple, pre.rejects.collect())
    )
    assert base.audit == pre.audit
