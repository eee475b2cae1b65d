"""Conversation/SFT operators: structural validation, per-role stats,
fingerprint dedup, chat rendering, assistant loss-mask spans — exact
values on crafted conversations, a DuckDB cross-check on conversations
assembled from the real documents table, and no-Python/no-shuffle plan
pins."""

import duckdb
import pytest
from pyspark.sql import functions as F

from xdump_spark.operators import sft

CONV_SCHEMA = (
    "conv_id long, messages array<struct<role:string,content:string>>"
)


def conv(*turns):
    return [{"role": r, "content": c} for r, c in turns]


@pytest.fixture(scope="module")
def convs(spark):
    rows = [
        (1, conv(("system", "Be helpful."), ("user", "Hi there"),
                 ("assistant", "Hello! How can I help?"))),
        (2, conv(("user", "What is 2+2"), ("assistant", "4"),
                 ("user", "and 3+3"), ("assistant", "6"))),
        (3, conv(("user", "dup me"), ("assistant", "ok"))),
        (4, conv(("user", "DUP   me"), ("assistant", "OK"))),  # canon-equal to 3
        (5, conv(("user", "trailing question"), ("assistant", "answer"),
                 ("user", "unanswered"))),
        (6, conv(("user", "fine"), ("tool", "not a chat role"))),
        (7, conv(("user", "fine"), ("assistant", "  "))),
        (8, conv(("user", "a"), ("user", "b"), ("assistant", "c"))),
        (9, conv(("assistant", "i speak first"), ("user", "?"))),
        (10, conv(("user", "sys late"), ("system", "late"), ("assistant", "x"))),
        (11, []),
    ]
    return spark.createDataFrame(rows, CONV_SCHEMA)


def test_stats_hand_values(spark, convs):
    got = {r["conv_id"]: r.asDict() for r in sft.conversation_stats(convs).collect()}
    s = got[1]
    assert (s["n_turns"], s["n_system"], s["n_user"], s["n_assistant"]) == (3, 1, 1, 1)
    assert s["user_tokens"] == 2            # "hi there"
    assert s["assistant_tokens"] == 5       # "hello! how can i help?"
    assert s["total_tokens"] == 2 + 5 + 2   # + "be helpful."
    assert got[2]["n_turns"] == 4 and got[2]["assistant_tokens"] == 2
    assert got[11]["n_turns"] == 0 and got[11]["total_tokens"] == 0


def test_stats_keep_passthrough(spark, convs):
    # keep= appends pass-through columns WITHOUT changing the stats —
    # the one-scan contract the posttrain panel fans validate+stats from
    flagged = sft.validate_conversations(convs)
    plain = {r["conv_id"]: r.asDict() for r in sft.conversation_stats(flagged).collect()}
    kept = {r["conv_id"]: r.asDict() for r in
            sft.conversation_stats(flagged, keep=("reason",)).collect()}
    reasons = {r["conv_id"]: r["reason"] for r in flagged.collect()}
    assert set(kept) == set(plain)
    for cid, row in kept.items():
        assert row.pop("reason") == reasons[cid]
        assert row == plain[cid]


def test_validate_rules(spark, convs):
    got = {
        r["conv_id"]: (r["valid"], r["reason"])
        for r in sft.validate_conversations(convs).collect()
    }
    assert got[1] == (True, None)
    assert got[2] == (True, None)
    assert got[3] == (True, None)
    assert got[5] == (False, "not_assistant_last")
    assert got[6] == (False, "unknown_role")
    assert got[7] == (False, "empty_content")
    assert got[8] == (False, "no_alternation")
    assert got[9] == (False, "no_alternation")
    assert got[10] == (False, "system_not_first")
    assert got[11] == (False, "empty_conversation")
    # relaxed modes lift exactly their rule
    relaxed = {
        r["conv_id"]: r["valid"]
        for r in sft.validate_conversations(
            convs, require_assistant_last=False
        ).collect()
    }
    assert relaxed[5] is True and relaxed[8] is False


def test_validate_null_shapes_rejected(spark):
    """NULL messages array, NULL role, NULL content must all land in
    rejects — three-valued logic must not let them fall through to
    valid (the structurally-broken-but-'valid' hole)."""
    rows = [
        (20, None),
        (21, [{"role": None, "content": "hi"}, {"role": "assistant", "content": "y"}]),
        (22, [{"role": "user", "content": None}, {"role": "assistant", "content": "y"}]),
    ]
    df = spark.createDataFrame(rows, CONV_SCHEMA)
    got = {
        r["conv_id"]: (r["valid"], r["reason"])
        for r in sft.validate_conversations(df).collect()
    }
    assert got[20] == (False, "empty_conversation")
    assert got[21] == (False, "unknown_role")
    assert got[22] == (False, "empty_content")
    # and prepare_sft_corpus routes them to rejects, not the output
    res = sft.prepare_sft_corpus(df)
    assert res.convs.count() == 0 and res.rejects.count() == 3


def test_fingerprint_matches_engine_hash_convention(spark, convs):
    """Conversation fingerprints use the SAME (h1, h2) formula as
    incremental.content_hashes/hash128 — store interop depends on it."""
    from xdump_spark.operators.incremental import hash128

    one = convs.filter("conv_id = 3")
    got = one.transform(sft.conversation_fingerprint).select("h1", "h2").collect()[0]
    canon = "user\x1fdup me\x1eassistant\x1fok"
    h1, h2 = hash128(F.lit(canon))
    exp = spark.range(1).select(h1.alias("h1"), h2.alias("h2")).collect()[0]
    assert (got["h1"], got["h2"]) == (exp["h1"], exp["h2"])


def test_fingerprint_dedup(spark, convs):
    fp = {
        r["conv_id"]: (r["h1"], r["h2"])
        for r in sft.conversation_fingerprint(convs).collect()
    }
    # whitespace/case normalization: 3 and 4 collide, others don't
    assert fp[3] == fp[4]
    assert len({v for k, v in fp.items() if k != 4}) == len(fp) - 1
    kept = {r["conv_id"] for r in sft.dedup_conversations(convs).collect()}
    assert 3 in kept and 4 not in kept and len(kept) == 10
    # role order is part of the canon: swapping roles changes the hash
    swapped = spark.createDataFrame(
        [(30, conv(("assistant", "dup me"), ("user", "ok")))], CONV_SCHEMA
    )
    assert {
        (r["h1"], r["h2"])
        for r in sft.conversation_fingerprint(swapped).collect()
    } != {fp[3]}


def test_render_chatml_and_plain(spark, convs):
    one = convs.filter("conv_id = 1")
    chatml = sft.render_chat(one).collect()[0]["text"]
    assert chatml == (
        "<|im_start|>system\nBe helpful.<|im_end|>\n"
        "<|im_start|>user\nHi there<|im_end|>\n"
        "<|im_start|>assistant\nHello! How can I help?<|im_end|>\n"
    )
    plain = sft.render_chat(one, template="plain").collect()[0]["text"]
    assert plain == (
        "system: Be helpful.\n\nuser: Hi there\n\n"
        "assistant: Hello! How can I help?\n\n"
    )
    with pytest.raises(ValueError, match="template"):
        sft.render_chat(one, template="nope")


def test_assistant_spans_align_with_render(spark, convs):
    """Every span slices exactly the assistant content out of the
    rendered text, for both templates, across all conversations."""
    for template in ("chatml", "plain"):
        out = sft.assistant_spans(
            sft.render_chat(convs, template=template), template=template
        ).collect()
        for r in out:
            contents = [
                m["content"] for m in r["messages"] if m["role"] == "assistant"
            ]
            sliced = [r["text"][s["start"]:s["end"]] for s in r["spans"]]
            assert sliced == contents, (r["conv_id"], template)


def test_plans_pure_codegen(spark, convs):
    for frame in (
        sft.conversation_stats(convs),
        sft.validate_conversations(convs),
        sft.conversation_fingerprint(convs),
        sft.assistant_spans(sft.render_chat(convs)),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "Exchange" not in plan  # all single-Project ops


def test_sql_twins_match_column_forms(spark):
    """The r14 SQL-string twins (built once, parsed JVM-side) must stay
    in lockstep with their Column-API originals — row-for-row equality
    on a corpus crafted to hit the edge cases each rule coalesces:
    NULL content, empty/whitespace content, multi-space runs, mixed
    case, unicode, and a NULL role."""
    from xdump_spark.operators.text import tokens, tokens_sql

    rows = [
        (1, [{"role": "user", "content": "Hi  THERE\t you"}],),
        (2, [{"role": "assistant", "content": None}],),
        (3, [{"role": None, "content": "x"}],),
        (4, [{"role": "user", "content": "   "}],),
        (5, [{"role": "user", "content": "éclair   naïve"}],),
        (6, [],),
        (7, None,),
    ]
    df = spark.createDataFrame(rows, CONV_SCHEMA)

    texts = df.select(
        F.element_at("messages", 1)["content"].alias("text")
    )
    tok = texts.select(
        tokens(F.col("text")).alias("a"),
        F.expr(tokens_sql("text")).alias("b"),
    )
    assert tok.where("NOT (a <=> b)").count() == 0

    ct = df.select(
        sft.canonical_transcript(F.col("messages")).alias("a"),
        F.expr(sft.canonical_transcript_sql("messages")).alias("b"),
    )
    assert ct.where("NOT (a <=> b)").count() == 0


def test_read_conversations_jsonl_quarantine(spark, tmp_path):
    import json

    p = tmp_path / "convs.jsonl"
    good = {
        "conv_id": 1,
        "messages": [
            {"role": "user", "content": "hi"},
            {"role": "assistant", "content": "hello"},
        ],
        "source": "synth",
    }
    wrong_shape = {"completely": "different"}
    p.write_text(
        json.dumps(good) + "\n" + "{not json at all\n" + json.dumps(wrong_shape) + "\n"
    )
    clean, corrupt = sft.read_conversations_jsonl(spark, str(p))
    rows = clean.collect()
    assert len(rows) == 1
    assert rows[0]["conv_id"] == 1
    assert [m["role"] for m in rows[0]["messages"]] == ["user", "assistant"]
    bad = {r["line"] for r in corrupt.collect()}
    assert bad == {"{not json at all", json.dumps(wrong_shape)}


def test_prepare_sft_corpus_end_to_end(spark, convs):
    res = sft.prepare_sft_corpus(convs)
    # valid: 1,2,3,4 — then 4 dedups away against 3
    assert res.audit == {"input": 11, "valid": 4, "deduped": 3}
    out = res.convs.collect()
    assert {r["conv_id"] for r in out} == {1, 2, 3}
    reasons = {r["conv_id"]: r["reason"] for r in res.rejects.collect()}
    assert reasons[6] == "unknown_role" and reasons[11] == "empty_conversation"
    for r in out:
        contents = [m["content"] for m in r["messages"] if m["role"] == "assistant"]
        assert [r["text"][s["start"]:s["end"]] for s in r["spans"]] == contents
    # deterministic order: same seed same order, different seed may differ
    again = [r["conv_id"] for r in sft.prepare_sft_corpus(convs).convs.collect()]
    assert again == [r["conv_id"] for r in out]


def test_duckdb_cross_check_stats_and_dedup(spark):
    """Assemble conversations from the real documents table (5 docs per
    conversation, alternating user/assistant) and cross-check stats,
    fingerprint collisions, and the kept set against DuckDB."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    conv_df = (
        docs.withColumn("conv_id", F.col("doc_id") % 100)
        .withColumn(
            "m",
            F.struct(
                F.when(F.col("doc_id") % 2 == 0, "user")
                .otherwise("assistant")
                .alias("role"),
                F.col("text").alias("content"),
            ),
        )
        .groupBy("conv_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("doc_id"), F.col("m")))
                ),
                lambda x: x["m"],
            ).alias("messages")
        )
    )
    stats = {
        r["conv_id"]: (r["n_turns"], r["user_tokens"], r["assistant_tokens"])
        for r in sft.conversation_stats(conv_df).collect()
    }
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    exp = {
        int(r[0]): (int(r[1]), int(r[2]), int(r[3]))
        for r in con.execute(
            """
            SELECT doc_id % 100 AS conv_id, count(*) AS n_turns,
              sum(CASE WHEN doc_id % 2 = 0
                  THEN len(regexp_split_to_array(trim(lower(text)), '\\s+')) ELSE 0 END),
              sum(CASE WHEN doc_id % 2 <> 0
                  THEN len(regexp_split_to_array(trim(lower(text)), '\\s+')) ELSE 0 END)
            FROM documents WHERE length(trim(text)) > 0 GROUP BY 1
            """
        ).fetchall()
    }
    # empty-text docs count as 0-token turns on the Spark side; DuckDB
    # side excludes them from token sums only (n_turns compared on the
    # non-empty assumption: sf0.001 documents have no empty text)
    assert stats == exp
    # dedup: no two distinct doc-groupings collide
    assert sft.dedup_conversations(conv_df).count() == conv_df.count()


# ---------------------------------------------------------------------------
# token-level loss-mask encoding
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def vocab(spark):
    from xdump_spark.operators.curation import build_vocab

    corpus = spark.createDataFrame(
        [(1, "hello world world"), (2, "ok sum 1 1 2")],
        "doc_id long, text string",
    )
    return build_vocab(corpus)


def test_special_ids_dense_above_vocab(spark, vocab):
    vmax = vocab.agg(F.max("token_id")).first()[0]
    sp = sft.special_token_ids(vocab)
    assert sorted(sp.values()) == [vmax + 1, vmax + 2, vmax + 3, vmax + 4]


def test_encode_hand_values(spark, vocab):
    vmap = {r["tok"]: r["token_id"] for r in vocab.collect()}
    sp = sft.special_token_ids(vocab)
    df = spark.createDataFrame(
        [(1, [{"role": "system", "content": "ok"},
              {"role": "user", "content": "Hello   WORLD"},
              {"role": "assistant", "content": "sum oov"}])],
        CONV_SCHEMA,
    )
    row = sft.encode_conversations(df, vocab).collect()[0]
    exp_ids = [
        sp["im_start_system"], vmap["ok"], sp["im_end"],
        sp["im_start_user"], vmap["hello"], vmap["world"], sp["im_end"],
        sp["im_start_assistant"], vmap["sum"], 0, sp["im_end"],
    ]
    exp_mask = [False] * 7 + [False, True, True, True]
    assert row["input_ids"] == exp_ids
    assert row["loss_mask"] == exp_mask
    assert row["n_tokens"] == 11 and row["n_assistant_tokens"] == 3
    # mask_im_end=False: the assistant end token stops carrying loss
    row2 = sft.encode_conversations(df, vocab, mask_im_end=False).collect()[0]
    assert row2["loss_mask"] == [False] * 7 + [False, True, True, False]


def test_encode_mask_matches_stats(spark, convs, vocab):
    """n_assistant_tokens == conversation_stats.assistant_tokens plus one
    im_end per assistant turn — on every conversation shape."""
    enc = {
        r["conv_id"]: r["n_assistant_tokens"]
        for r in sft.encode_conversations(convs, vocab).collect()
    }
    stats = {
        r["conv_id"]: r["assistant_tokens"] + r["n_assistant"]
        for r in sft.conversation_stats(convs).collect()
    }
    assert enc == stats


def test_encode_unknown_role_unmasked(spark, vocab):
    df = spark.createDataFrame(
        [(1, [{"role": "tool", "content": "x"},
              {"role": "assistant", "content": "ok"}])],
        CONV_SCHEMA,
    )
    row = sft.encode_conversations(df, vocab).collect()[0]
    assert row["input_ids"][0] == 0          # unk start marker
    assert row["loss_mask"][:3] == [False, False, False]
    assert row["n_assistant_tokens"] == 2    # "ok" + its im_end


def test_encode_bad_vocab_raises(spark, convs):
    bad = convs.sparkSession.createDataFrame([("a", 1)], "word string, id int")
    with pytest.raises(ValueError, match="vocab"):
        sft.encode_conversations(convs, bad)


def test_prepare_with_vocab_returns_encoded(spark, convs, vocab):
    res = sft.prepare_sft_corpus(convs, vocab=vocab)
    assert res.encoded is not None
    enc_ids = {r["conv_id"] for r in res.encoded.collect()}
    assert enc_ids == {r["conv_id"] for r in res.convs.collect()}
    plan = res.encoded._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan         # Arrow-batched, not row Python
    assert "BatchEvalPython" not in plan


def test_incremental_conversation_dedup_vs_store(spark, tmp_path):
    """Two daily SFT drops against one persistent ExactHashStore: a
    conversation whose canonical transcript was accepted in increment 1
    is rejected in increment 2 even under different case/whitespace;
    within-batch keep-first holds; genuinely new conversations pass."""
    from xdump_spark.operators.incremental import ExactHashStore

    store = ExactHashStore(
        spark, "conv_store_t", n_buckets=4, path=str(tmp_path / "conv_store_t")
    )
    day1 = spark.createDataFrame(
        [
            (1, conv(("user", "hello there"), ("assistant", "hi"))),
            (2, conv(("user", "HELLO   there"), ("assistant", "HI"))),  # dup of 1
            (3, conv(("user", "unique"), ("assistant", "yes"))),
        ],
        CONV_SCHEMA,
    )
    acc1 = {r["id"] for r in sft.dedup_conversations_incremental(day1, store).collect()}
    assert acc1 == {1, 3}
    day2 = spark.createDataFrame(
        [
            (10, conv(("user", "hello there"), ("assistant", "hi"))),   # store hit
            (11, conv(("user", "brand new"), ("assistant", "ok"))),
            (12, conv(("user", "BRAND new"), ("assistant", "OK"))),     # batch dup
        ],
        CONV_SCHEMA,
    )
    acc2 = {r["id"] for r in sft.dedup_conversations_incremental(day2, store).collect()}
    assert acc2 == {11}
    # the two-increment store equals batch dedup over the concatenation
    both = day1.unionByName(
        day2.withColumnRenamed("conv_id", "conv_id")
    )
    batch_kept = {
        r["conv_id"] for r in sft.dedup_conversations(both).collect()
    }
    assert acc1 | acc2 == batch_kept
    # defer_commit: store untouched until commit()
    day3 = spark.createDataFrame(
        [(20, conv(("user", "deferred"), ("assistant", "x")))], CONV_SCHEMA
    )
    acc3, commit = sft.dedup_conversations_incremental(
        day3, store, defer_commit=True
    )
    assert {r["id"] for r in acc3.collect()} == {20}
    again, commit2 = sft.dedup_conversations_incremental(
        day3, store, defer_commit=True
    )
    assert {r["id"] for r in again.collect()} == {20}  # not yet committed
    commit()
    assert sft.dedup_conversations_incremental(day3, store).count() == 0


def test_pack_encoded_concat_and_grouping(spark, convs, vocab):
    """pack_encoded: per-sequence arrays are the in-order concatenation
    of the members' arrays, groups are IDENTICAL to pack_sequences fed
    the same (id, n_tok) counts, and mask totals are preserved."""
    from pyspark.sql import functions as F
    from xdump_spark.operators.curation import pack_sequences

    enc = sft.encode_conversations(convs, vocab)
    packed = sft.pack_encoded(enc, budget=16, partitions=4).collect()
    by_id = {r["conv_id"]: r for r in enc.collect()}
    for seq in packed:
        exp_ids, exp_mask = [], []
        assert seq["conv_ids"] == sorted(seq["conv_ids"])
        for cid in seq["conv_ids"]:
            exp_ids.extend(by_id[cid]["input_ids"])
            exp_mask.extend(by_id[cid]["loss_mask"])
        assert seq["input_ids"] == exp_ids
        assert seq["loss_mask"] == exp_mask
        assert seq["n_tokens"] == len(exp_ids)
    # exactly-once: every conversation appears in exactly one sequence
    all_members = [cid for s in packed for cid in s["conv_ids"]]
    assert sorted(all_members) == sorted(by_id)
    # mask totals preserved through packing
    total_mask = sum(sum(s["loss_mask"]) for s in packed)
    assert total_mask == sum(sum(r["loss_mask"]) for r in by_id.values())
    # grouping identical to the pretraining packer on the same counts
    counts = enc.select("conv_id", F.col("n_tokens").alias("n_tok"))
    seqs = pack_sequences(
        enc, budget=16, id_col="conv_id", partitions=4, counts=counts
    ).collect()
    exp_groups = {tuple(s["doc_ids"]) for s in seqs}
    got_groups = {tuple(s["conv_ids"]) for s in packed}
    assert got_groups == exp_groups


def test_pack_encoded_mask_shards_roundtrip(spark, convs, vocab, tmp_path):
    """id and mask shards written through the same sink pair up
    byte-for-byte: reading both back reproduces (ids, mask) per seq."""
    from pyspark.sql import functions as F
    from xdump_spark.sources.token_shards import (
        read_binary_shard,
        write_binary_shards,
    )

    enc = sft.encode_conversations(convs, vocab)
    packed = sft.pack_encoded(enc, budget=32, partitions=2)
    ids_dir = str(tmp_path / "ids")
    mask_dir = str(tmp_path / "mask")
    m1 = write_binary_shards(packed, ids_dir, n_shards=2)
    masked = packed.withColumn(
        "mask_ids", F.transform("loss_mask", lambda b: b.cast("int"))
    )
    m2 = write_binary_shards(
        masked, mask_dir, n_shards=2, ids_col="mask_ids", dtype="uint16"
    )
    exp = {r["seq_id"]: (r["input_ids"], r["loss_mask"]) for r in packed.collect()}
    got = {}
    for shard in m1["shards"]:
        for seq_id, ids in read_binary_shard(ids_dir, shard["shard"], m1):
            got[seq_id] = list(ids)
    got_mask = {}
    for shard in m2["shards"]:
        for seq_id, bits in read_binary_shard(mask_dir, shard["shard"], m2):
            got_mask[seq_id] = [bool(b) for b in bits]
    assert set(got) == set(exp) and set(got_mask) == set(exp)
    for seq_id, (ids, mask) in exp.items():
        assert got[seq_id] == list(ids)
        assert got_mask[seq_id] == list(mask)
        assert len(got[seq_id]) == len(got_mask[seq_id])


def test_streaming_sft_ingest_two_drops(spark, tmp_path):
    """Two JSONL drops through the streaming ingest: dedup holds across
    drops via the persistent store, corrupt lines quarantine, invalid
    conversations land in rejects with reasons, and a drained re-run
    (no new files) appends nothing."""
    import json

    from xdump_spark.operators.incremental import ExactHashStore

    inp = tmp_path / "drops"
    inp.mkdir()
    store = ExactHashStore(
        spark, "sft_stream_store_t", n_buckets=4,
        path=str(tmp_path / "sft_stream_store_t"),
    )
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    corrupt = str(tmp_path / "corrupt")
    rejects = str(tmp_path / "rejects")

    def drop(name, rows, junk=False):
        with open(inp / name, "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")
            if junk:
                fh.write("{broken\n")

    def run():
        q = sft.streaming_sft_ingest(
            spark, str(inp), store, out, ckpt,
            corrupt_dir=corrupt, rejects_dir=rejects,
        )
        q.awaitTermination(120)

    c = lambda cid, msgs_, src="a": {
        "conv_id": cid, "messages": [
            {"role": r, "content": t} for r, t in msgs_], "source": src}

    drop("day1.jsonl", [
        c(1, [("user", "hello"), ("assistant", "hi")]),
        c(2, [("user", "tool time"), ("tool", "x")]),          # invalid
    ], junk=True)
    run()
    got1 = {r["conv_id"] for r in spark.read.parquet(out).collect()}
    assert got1 == {1}
    assert spark.read.parquet(corrupt).count() == 1
    rej = {r["conv_id"]: r["reason"] for r in spark.read.parquet(rejects).collect()}
    assert rej == {2: "unknown_role"}

    drop("day2.jsonl", [
        c(10, [("user", "HELLO"), ("assistant", "HI")]),       # store dup of 1
        c(11, [("user", "fresh"), ("assistant", "ok")]),
    ])
    run()
    got2 = {r["conv_id"] for r in spark.read.parquet(out).collect()}
    assert got2 == {1, 11}
    row11 = [r for r in spark.read.parquet(out).collect() if r["conv_id"] == 11][0]
    assert "<|im_start|>user\nfresh" in row11["text"]
    assert [ (s["start"], s["end"]) for s in row11["spans"] ]  # spans present

    run()  # drained: no new files -> nothing appended
    assert spark.read.parquet(out).count() == 2


def test_decontaminate_conversations(spark):
    bench = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    )
    convs = spark.createDataFrame(
        [
            # leak in the USER turn
            (1, conv(("user", "the quick brown fox jumps over the lazy dog"),
                     ("assistant", "nice"))),
            # leak in the ASSISTANT turn
            (2, conv(("user", "tell me"),
                     ("assistant", "quick brown fox jumps over the lazy dog today"))),
            (3, conv(("user", "clean"), ("assistant", "also clean"))),
        ],
        CONV_SCHEMA,
    )
    kept = {
        r["conv_id"]
        for r in sft.decontaminate_conversations(convs, bench, n=8).collect()
    }
    assert kept == {3}
    res = sft.prepare_sft_corpus(convs, benchmark=bench, contamination_n=8)
    assert {r["conv_id"] for r in res.convs.collect()} == {3}
    assert res.audit["decontaminated"] == 1


def test_prepare_sft_with_store_two_drops(spark, tmp_path):
    """prepare_sft_corpus(dedup_store=...): cross-drop dedup through the
    persistent store, commit deferred until the caller invokes it."""
    from xdump_spark.operators.incremental import ExactHashStore

    store = ExactHashStore(
        spark, "sft_front_store_t", n_buckets=4,
        path=str(tmp_path / "sft_front_store_t"),
    )
    day1 = spark.createDataFrame(
        [(1, conv(("user", "alpha"), ("assistant", "a")))], CONV_SCHEMA
    )
    res1 = sft.prepare_sft_corpus(day1, dedup_store=store, shuffle_seed=None)
    assert res1.convs.count() == 1 and res1.audit["deduped"] == 1
    # store not committed yet: the same drop still passes
    assert sft.prepare_sft_corpus(
        day1, dedup_store=store, shuffle_seed=None
    ).convs.count() == 1
    res1.store_commit()
    day2 = spark.createDataFrame(
        [
            (10, conv(("user", "ALPHA"), ("assistant", "A"))),  # store dup
            (11, conv(("user", "beta"), ("assistant", "b"))),
        ],
        CONV_SCHEMA,
    )
    res2 = sft.prepare_sft_corpus(day2, dedup_store=store, shuffle_seed=None)
    assert {r["conv_id"] for r in res2.convs.collect()} == {11}


def test_prepare_sft_corpus_precomputed_flagged_identical(spark, convs):
    """flagged= (r14 driver-side optimization) must be a pure no-op on
    results: passing validate_conversations' own output produces frames
    identical to the internal validation path."""
    base = sft.prepare_sft_corpus(convs, shuffle_seed=0)
    pre = sft.prepare_sft_corpus(
        convs, shuffle_seed=0, flagged=sft.validate_conversations(convs)
    )
    assert sorted(map(tuple, base.convs.collect())) == sorted(
        map(tuple, pre.convs.collect())
    )
    assert sorted(map(tuple, base.rejects.collect())) == sorted(
        map(tuple, pre.rejects.collect())
    )
    assert base.audit == pre.audit
