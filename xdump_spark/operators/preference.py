"""Preference-pair (DPO / reward-model) data operators.

The third data surface of a training pipeline, after pretraining text
and SFT conversations: PREFERENCE PAIRS — a prompt (messages array, the
same ``array<struct<role,content>>`` shape sft.py works on) plus two
candidate assistant responses, ``chosen`` and ``rejected``. The
operators here validate pair structure, fingerprint-dedup pairs and
prompts, measure the length bias a reward signal can silently leak,
render both sides to training strings under the SFT chat templates, and
screen prompts/responses against an eval benchmark. Everything is pure
Spark codegen over struct arrays and strings — the only shuffles are
the dedup aggregates (narrow (h1, h2, id) rows) and the optional
per-prompt cap (the skew-robust two-pass top-k).

Design sources are public preference-data conventions: the
prompt/chosen/rejected interchange shape used by the open DPO stacks
(Rafailov et al. 2023), response-level dedup, and length-bias
diagnostics (Singhal et al. 2023, "A Long Way to Go: Investigating
Length Correlations in RLHF"). No reference analog (the reference
engine `/root/reference` has no text pipeline).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xdump_spark.operators.sft import (
    DEFAULT_ROLES,
    _TEMPLATES,
    assistant_spans,
    canonical_transcript,
    norm_content,
    render_chat,
    validate_conversations,
)
from xdump_spark.operators.text import tokens

# section separator between (prompt, chosen, rejected) in the pair
# fingerprint — one C0 step above the transcript's field/turn separators
_SECTION_SEP = "\x1d"

# the standard preference interchange shape as a JSONL schema
PREFERENCE_SCHEMA = T.StructType(
    [
        T.StructField("pair_id", T.LongType()),
        T.StructField(
            "prompt",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("role", T.StringType()),
                        T.StructField("content", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("chosen", T.StringType()),
        T.StructField("rejected", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


# the scored-response interchange (HelpSteer/UltraFeedback shape):
# one row per (prompt, response, rating); prompt as a plain string
# (pairs_from_ratings wraps it into a single user turn)
RATINGS_SCHEMA = T.StructType(
    [
        T.StructField("prompt", T.StringType()),
        T.StructField("response", T.StringType()),
        T.StructField("rating", T.DoubleType()),
        T.StructField("source", T.StringType()),
    ]
)


def read_preference_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Read a preference-pair dump (one JSON object per line, the
    prompt/chosen/rejected interchange) → (clean, corrupt) under the
    JSONL source's quarantine contract; structural validation is
    :func:`validate_pairs`' job, same split as the SFT reader."""
    from xdump_spark.sources.jsonl import read_jsonl_corpus

    return read_jsonl_corpus(spark, path, schema or PREFERENCE_SCHEMA)


def pairs_from_message_lists(
    df: DataFrame,
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
    id_col: str = "pair_id",
) -> DataFrame:
    """Convert the OTHER common preference interchange — ``chosen`` /
    ``rejected`` as FULL message lists (shared prompt turns + one final
    assistant turn each, the HF-datasets convention) — into the engine's
    standard (prompt, chosen, rejected) shape. Adds ``shape_reason``
    (null when converted cleanly): ``empty_messages`` (either list
    empty/NULL), ``no_final_assistant`` (either list's last turn is not
    an assistant turn), ``prompt_mismatch`` (the two prefixes differ
    under the canonical transcript — whitespace/case differences do NOT
    mismatch, role or content changes do; a mismatched record has no
    well-defined prompt, so prompt is NULL). Pure codegen, one Project —
    filter on ``shape_reason IS NULL`` before :func:`validate_pairs`."""
    ch, rj = F.col(chosen_col), F.col(rejected_col)

    def prefix(c: Column) -> Column:
        return F.slice(c, 1, F.size(c) - 1)

    def last_is_assistant(c: Column) -> Column:
        return F.coalesce(
            F.element_at(c, -1)["role"] == "assistant", F.lit(False)
        )

    empty = (
        ch.isNull() | rj.isNull() | (F.size(ch) == 0) | (F.size(rj) == 0)
    )
    mismatch = canonical_transcript(prefix(ch)) != canonical_transcript(
        prefix(rj)
    )
    reason = (
        F.when(empty, "empty_messages")
        .when(~last_is_assistant(ch) | ~last_is_assistant(rj), "no_final_assistant")
        .when(mismatch, "prompt_mismatch")
        .otherwise(F.lit(None).cast("string"))
    )
    out = df.withColumn("shape_reason", reason)
    keep = [c for c in df.columns if c not in (chosen_col, rejected_col)]
    return out.select(
        *keep,
        F.when(F.col("shape_reason").isNull(), prefix(ch)).alias("prompt"),
        F.when(
            F.col("shape_reason").isNull(), F.element_at(ch, -1)["content"]
        ).alias(chosen_col),
        F.when(
            F.col("shape_reason").isNull(), F.element_at(rj, -1)["content"]
        ).alias(rejected_col),
        "shape_reason",
    )


def pairs_from_ratings(
    df: DataFrame,
    prompt_col: str = "prompt",
    response_col: str = "response",
    rating_col: str = "rating",
    policy: str = "best_vs_worst",
    margin: float = 0.0,
    id_col: str = "pair_id",
    n_salt: int = 16,
) -> DataFrame:
    """Convert the SCORED-RESPONSE interchange — one row per (prompt,
    response, rating), the HelpSteer/UltraFeedback collection shape —
    into standard (pair_id, prompt, chosen, rejected) pairs.

    Semantics, all deterministic:

    * A string ``prompt_col`` is treated as a single user turn; a
      message-list prompt passes through. Prompts group under the
      canonical transcript (whitespace/case differences merge).
    * Multiple rows for the same (prompt, canonical response) — e.g.
      one row per annotator — average: the response's score is the MEAN
      rating; its surface form is the lexicographic min raw text.
    * ``policy="best_vs_worst"``: one pair per prompt — highest-rated
      response vs lowest-rated (rating ties broken by canonical
      response text asc, so re-runs pick the same sides).
    * ``policy="all_pairs"``: every ordered pair with
      ``rating_chosen - rating_rejected > margin``.
    * A pair is emitted only when the rating delta is STRICTLY greater
      than ``margin`` — with the 0.0 default, ties are dropped (a tied
      pair carries no preference signal).

    Output adds ``chosen_rating`` / ``rejected_rating`` and a
    deterministic 64-bit ``id_col`` (xxhash64 of the canonical
    (prompt, chosen, rejected) identity — the same identity
    :func:`pair_fingerprint` hashes, so dedup downstream agrees).

    Scale shape: ratings reduce under one narrow (prompt-hash,
    response-hash) aggregate; best_vs_worst picks sides with the
    skew-robust two-pass top-k (``skew.topk_per_key``), so a prompt
    ranked against 100k sampled responses cannot straggle one task.
    ``all_pairs`` on such a prompt emits O(n²) REAL pairs by request —
    prefer best_vs_worst + ``cap_per_prompt`` at collection scale."""
    from xdump_spark.operators.incremental import hash128
    from xdump_spark.operators.skew import topk_per_key

    if policy not in ("best_vs_worst", "all_pairs"):
        raise ValueError(
            f"policy must be best_vs_worst|all_pairs, got {policy!r}"
        )
    pt = df.schema[prompt_col].dataType
    parr = (
        F.array(
            F.struct(
                F.lit("user").alias("role"),
                F.col(prompt_col).alias("content"),
            )
        )
        if isinstance(pt, T.StringType)
        else F.col(prompt_col)
    )
    h1, h2 = hash128(canonical_transcript(parr))
    base = df.select(
        h1.alias("_p1"),
        h2.alias("_p2"),
        parr.alias("_prompt"),
        F.col(response_col).alias("_resp"),
        norm_content(F.col(response_col)).alias("_nresp"),
        F.col(rating_col).cast("double").alias("_rating"),
    ).filter(F.col("_rating").isNotNull() & ~_blank(F.col("_resp")))
    scored = base.groupBy("_p1", "_p2", "_nresp").agg(
        F.avg("_rating").alias("_rating"),
        F.min("_resp").alias("_resp"),
        # struct-min, not min_by: min_by is arbitrary on _resp ties
        # (two annotators, same raw response, different raw prompt
        # surface) — the struct compares (_resp, _prompt) lexically so
        # the surfaced prompt is a pure function of the group
        F.min(F.struct(F.col("_resp"), F.col("_prompt")))["_prompt"].alias(
            "_prompt"
        ),
    )
    if policy == "best_vs_worst":
        best = topk_per_key(
            scored, ["_p1", "_p2"],
            [F.col("_rating").desc(), F.col("_nresp").asc()],
            k=1, n_salt=n_salt,
        ).drop("rn")
        worst = topk_per_key(
            scored, ["_p1", "_p2"],
            [F.col("_rating").asc(), F.col("_nresp").asc()],
            k=1, n_salt=n_salt,
        ).drop("rn")
        joined = best.alias("c").join(worst.alias("r"), ["_p1", "_p2"])
    else:
        c, r = scored.alias("c"), scored.alias("r")
        joined = c.join(
            r,
            (F.col("c._p1") == F.col("r._p1"))
            & (F.col("c._p2") == F.col("r._p2")),
        )
    out = joined.filter(
        F.col("c._rating") - F.col("r._rating") > F.lit(float(margin))
    )
    pid = F.xxhash64(
        F.concat_ws(
            _SECTION_SEP,
            canonical_transcript(F.col("c._prompt")),
            F.col("c._nresp"),
            F.col("r._nresp"),
        )
    )
    return out.select(
        pid.alias(id_col),
        F.col("c._prompt").alias(prompt_col),
        F.col("c._resp").alias("chosen"),
        F.col("r._resp").alias("rejected"),
        F.col("c._rating").alias("chosen_rating"),
        F.col("r._rating").alias("rejected_rating"),
    )


def _blank(c: Column) -> Column:
    return c.isNull() | (F.trim(c) == "")


def validate_pairs(
    df: DataFrame,
    prompt_col: str = "prompt",
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
    allowed_roles: tuple = DEFAULT_ROLES,
    require_alternation: bool = True,
) -> DataFrame:
    """Structural validation for preference pairs: adds ``valid`` and a
    ``reason`` column naming the FIRST failed rule (null when valid).

    Rules, in check order: the prompt passes the conversation rules
    (``sft.validate_conversations`` with ``require_assistant_last=False``
    — its ``empty_conversation`` surfaces as ``empty_prompt`` here); the
    prompt's last turn is a user turn (the responses ARE the next
    assistant turn); chosen non-blank; rejected non-blank; chosen and
    rejected differ after canonical normalization (an identical pair
    carries zero preference signal and poisons a DPO loss with a 0
    margin). Pure codegen, no shuffle."""
    flagged = validate_conversations(
        df,
        conv_col=prompt_col,
        allowed_roles=allowed_roles,
        require_alternation=require_alternation,
        require_assistant_last=False,
    )
    roles = F.transform(F.col(prompt_col), lambda m: m["role"])
    ends_user = F.coalesce(F.element_at(roles, -1) == "user", F.lit(False))
    prompt_reason = F.when(
        F.col("reason") == "empty_conversation", "empty_prompt"
    ).otherwise(F.col("reason"))
    reason = F.coalesce(
        prompt_reason,
        F.when(~ends_user, "prompt_not_user_last")
        .when(_blank(F.col(chosen_col)), "empty_chosen")
        .when(_blank(F.col(rejected_col)), "empty_rejected")
        .when(
            norm_content(F.col(chosen_col)) == norm_content(F.col(rejected_col)),
            "identical_responses",
        ),
    )
    return (
        flagged.withColumn("_pair_reason", reason)
        .drop("reason", "valid")
        .withColumnRenamed("_pair_reason", "reason")
        .withColumn("valid", F.col("reason").isNull())
    )


def pair_fingerprint(
    df: DataFrame,
    prompt_col: str = "prompt",
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
) -> DataFrame:
    """Canonical 128-bit pair fingerprint: the prompt's canonical
    transcript and the two normalized responses joined with a U+001D
    section separator, hashed through the engine-wide
    ``incremental.hash128`` convention (store-interoperable, like doc
    and conversation dedup). Adds ``h1``/``h2``. The CHOSEN/REJECTED
    ORDER is part of the identity: the same two responses with swapped
    preference are a contradicting pair, not a duplicate — catching
    those is :func:`contradicting_pairs`' job."""
    from xdump_spark.operators.incremental import hash128

    canon = F.concat_ws(
        _SECTION_SEP,
        canonical_transcript(F.col(prompt_col)),
        norm_content(F.col(chosen_col)),
        norm_content(F.col(rejected_col)),
    )
    h1, h2 = hash128(canon)
    return df.withColumn("h1", h1).withColumn("h2", h2)


def dedup_pairs(
    df: DataFrame,
    prompt_col: str = "prompt",
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
    id_col: str = "pair_id",
) -> DataFrame:
    """Keep the min-id pair per canonical (prompt, chosen, rejected)
    fingerprint. One shuffle of narrow (h1, h2, id) rows with
    map-side-combined min, then a semi-join back by id — the struct
    payload never shuffles on the hash key (the dedup_conversations
    plan shape)."""
    fp = pair_fingerprint(
        df, prompt_col=prompt_col, chosen_col=chosen_col, rejected_col=rejected_col
    )
    keep = fp.groupBy("h1", "h2").agg(F.min(id_col).alias(id_col))
    return df.join(keep.select(id_col), id_col, "left_semi")


def dedup_pairs_incremental(
    df: DataFrame,
    store,
    prompt_col: str = "prompt",
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
    id_col: str = "pair_id",
    defer_commit: bool = False,
):
    """Pair dedup as an INCREMENT against a persistent
    ``incremental.ExactHashStore`` — accepted iff the canonical
    (prompt, chosen, rejected) fingerprint was never accepted in any
    prior increment or under a smaller id in this batch. Same contract,
    commit discipline, and one-exchange plan as doc-level
    ``incremental_exact_dedup`` (see ``incremental_hash_dedup``)."""
    from xdump_spark.operators.incremental import incremental_hash_dedup

    batch = pair_fingerprint(
        df, prompt_col=prompt_col, chosen_col=chosen_col, rejected_col=rejected_col
    ).select(F.col(id_col).alias("id"), "h1", "h2")
    return incremental_hash_dedup(batch, store, defer_commit=defer_commit)


def contradicting_pairs(
    df: DataFrame,
    prompt_col: str = "prompt",
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
    id_col: str = "pair_id",
) -> DataFrame:
    """Pairs whose (prompt, response-set) appears with BOTH orderings —
    (A preferred over B) and (B preferred over A) for the same prompt:
    direct label noise that cancels to zero gradient at best and teaches
    inconsistency at worst. Returns (id_a, id_b) with id_a < id_b, one
    row per contradicting id pair.

    The key is order-INSENSITIVE ((prompt, least(c, r), greatest(c, r)))
    while the match requires opposite orientations, so exact duplicates
    (same orientation — dedup's job) are excluded. One narrow
    (key, orient, id) shuffle; a self-join on the unordered key."""
    from xdump_spark.operators.incremental import hash128

    c = norm_content(F.col(chosen_col))
    r = norm_content(F.col(rejected_col))
    key = F.concat_ws(
        _SECTION_SEP,
        canonical_transcript(F.col(prompt_col)),
        F.least(c, r),
        F.greatest(c, r),
    )
    h1, h2 = hash128(key)
    narrow = df.select(
        h1.alias("h1"),
        h2.alias("h2"),
        (c < r).alias("orient"),
        F.col(id_col).alias("id"),
    )
    a, b = narrow.alias("a"), narrow.alias("b")
    return (
        a.join(
            b,
            (F.col("a.h1") == F.col("b.h1"))
            & (F.col("a.h2") == F.col("b.h2"))
            & (F.col("a.orient") != F.col("b.orient"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )


def cap_per_prompt(
    df: DataFrame,
    max_pairs: int = 1,
    prompt_col: str = "prompt",
    id_col: str = "pair_id",
    n_salt: int = 16,
) -> DataFrame:
    """At most ``max_pairs`` pairs per canonical prompt (min-id wins —
    deterministic). A hot prompt (one question ranked against hundreds
    of sampled responses — the normal RLHF collection shape) dominates
    the gradient; capping rebalances. Skew-robust: the per-prompt top-k
    runs as skew.topk_per_key's two bounded window passes, so a
    100k-response prompt cannot straggle one task."""
    from xdump_spark.operators.incremental import hash128
    from xdump_spark.operators.skew import topk_per_key

    h1, h2 = hash128(canonical_transcript(F.col(prompt_col)))
    keyed = df.select(
        F.col(id_col).alias("id"), h1.alias("_p1"), h2.alias("_p2")
    )
    kept = topk_per_key(
        keyed, ["_p1", "_p2"], [F.col("id").asc()], k=max_pairs, n_salt=n_salt
    ).select(F.col("id").alias(id_col))
    return df.join(kept, id_col, "left_semi")


def pair_stats(
    df: DataFrame,
    prompt_col: str = "prompt",
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
    id_col: str = "pair_id",
    keep: tuple = (),
) -> DataFrame:
    """Per-pair shape: (id, prompt_turns, prompt_tokens, chosen_tokens,
    rejected_tokens, token_delta, chosen_longer). One Project — the
    aggregate over the prompt array and the two token counts run in a
    single narrow map stage.

    ``keep`` passes input columns through beside the stats (r15, same
    contract as ``sft.conversation_stats``): one pass for stats plus
    other per-row columns instead of one corpus scan per projection."""
    return df.select(
        F.col(id_col),
        F.size(F.col(prompt_col)).cast("long").alias("prompt_turns"),
        F.aggregate(
            F.col(prompt_col),
            F.lit(0).cast("long"),
            lambda acc, m: acc + F.size(tokens(m["content"])),
        ).alias("prompt_tokens"),
        F.size(tokens(F.col(chosen_col))).cast("long").alias("chosen_tokens"),
        F.size(tokens(F.col(rejected_col))).cast("long").alias("rejected_tokens"),
        (
            F.size(tokens(F.col(chosen_col))) - F.size(tokens(F.col(rejected_col)))
        ).cast("long").alias("token_delta"),
        (
            F.size(tokens(F.col(chosen_col))) > F.size(tokens(F.col(rejected_col)))
        ).alias("chosen_longer"),
        *[F.col(c) for c in keep],
    )


def length_bias_stats(
    df: DataFrame,
    prompt_col: str = "prompt",
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
    id_col: str = "pair_id",
) -> dict:
    """Corpus-level length-bias diagnostic (one aggregation job):
    ``n_pairs``, ``frac_chosen_longer`` (0.5 ≈ unbiased; reward models
    trained on >0.6 corpora learn length, Singhal et al. 2023),
    ``mean_token_delta``, ``p50_token_delta`` (approx quantile — a
    diagnostic, not a protocol value)."""
    stats = pair_stats(
        df,
        prompt_col=prompt_col,
        chosen_col=chosen_col,
        rejected_col=rejected_col,
        id_col=id_col,
    )
    row = stats.agg(
        F.count("*").alias("n"),
        F.avg(F.col("chosen_longer").cast("double")).alias("frac"),
        F.avg("token_delta").alias("mean_d"),
        F.percentile_approx("token_delta", 0.5).alias("p50_d"),
    ).first()
    return {
        "n_pairs": int(row["n"]),
        "frac_chosen_longer": float(row["frac"] or 0.0),
        "mean_token_delta": float(row["mean_d"] or 0.0),
        "p50_token_delta": float(row["p50_d"] or 0.0),
    }


def render_dpo(
    df: DataFrame,
    prompt_col: str = "prompt",
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
    template: str = "chatml",
) -> DataFrame:
    """Render both sides for a DPO/reward trainer: adds ``text_chosen``
    and ``text_rejected`` (prompt + the response as one final assistant
    turn, under the SFT chat template) plus ``span_chosen`` /
    ``span_rejected`` — the char span struct<start,end> of the RESPONSE
    content inside its rendered string (the DPO loss masks everything
    but the response; prompt-history assistant turns stay masked, which
    is why this takes the LAST span, not all of them). Pure codegen,
    two Projects."""
    if template not in _TEMPLATES:
        raise ValueError(f"unknown template {template!r}; one of {sorted(_TEMPLATES)}")

    def full(resp_col: str) -> Column:
        tail = F.array(
            F.struct(
                F.lit("assistant").alias("role"), F.col(resp_col).alias("content")
            )
        )
        return F.concat(F.col(prompt_col), tail)

    out = df.withColumn("_full_c", full(chosen_col)).withColumn(
        "_full_r", full(rejected_col)
    )
    out = render_chat(out, conv_col="_full_c", template=template, out_col="text_chosen")
    out = render_chat(out, conv_col="_full_r", template=template, out_col="text_rejected")
    out = assistant_spans(out, conv_col="_full_c", template=template)
    out = out.withColumn("span_chosen", F.element_at("spans", -1)).drop("spans")
    out = assistant_spans(out, conv_col="_full_r", template=template)
    out = out.withColumn("span_rejected", F.element_at("spans", -1)).drop("spans")
    return out.drop("_full_c", "_full_r")


def pair_text(
    df: DataFrame,
    prompt_col: str = "prompt",
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
) -> Column:
    """All pair text as one whitespace-joined string column — the
    contamination-screen input (prompt contents + both responses: a
    benchmark question leaking through ANY of them is contamination)."""
    return F.concat_ws(
        " ",
        F.array_join(
            F.transform(F.col(prompt_col), lambda m: m["content"]), " "
        ),
        F.col(chosen_col),
        F.col(rejected_col),
    )


def decontaminate_pairs(
    df: DataFrame,
    benchmark: DataFrame,
    prompt_col: str = "prompt",
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
    id_col: str = "pair_id",
    n: int = 8,
    min_shared: int = 1,
) -> DataFrame:
    """Drop pairs sharing ≥ ``min_shared`` distinct word ``n``-grams with
    any benchmark document, screening :func:`pair_text` (prompt + both
    responses). Reuses curation.contamination_screen: benchmark grams
    dedup'd + broadcast, pair side a narrow explode — the pair corpus
    never shuffles."""
    from xdump_spark.operators.curation import contamination_screen

    # contamination_screen grams BOTH sides under one (id_col, text_col)
    # naming — feed it its defaults (the benchmark frame's shape) and map
    # the pair ids back afterwards
    flat = df.select(
        F.col(id_col).alias("doc_id"),
        pair_text(
            df, prompt_col=prompt_col, chosen_col=chosen_col, rejected_col=rejected_col
        ).alias("text"),
    )
    hits = contamination_screen(
        flat, benchmark, n=n, min_shared=min_shared
    ).select(F.col("doc_id").alias(id_col))
    return df.join(hits, id_col, "left_anti")


def streaming_preference_ingest(
    spark: SparkSession,
    input_dir: str,
    store,
    out_dir: str,
    checkpoint_dir: str,
    corrupt_dir: str | None = None,
    rejects_dir: str | None = None,
    template: str = "chatml",
    schema: T.StructType | None = None,
    trigger: dict | None = None,
    drop_contradictions: bool = True,
):
    """Continuous preference-pair ingestion: labeling-drop JSONL files
    LANDING in ``input_dir`` stream through parse → ``validate_pairs``
    → pair-fingerprint dedup against the persistent ``store``
    (ExactHashStore) → within-drop contradiction drop → DPO render →
    append to ``out_dir`` parquet. Unreadable lines quarantine to
    ``corrupt_dir``, invalid pairs (with reasons) to ``rejects_dir``.

    The preference twin of ``sft.streaming_sft_ingest``, same restart
    discipline: the file-stream checkpoint remembers consumed files,
    the bucketed hash store carries pair-dedup history across restarts
    AND across batch runs (one store serves ``prepare_preference_corpus
    (dedup_store=...)`` and this stream — a drop ingested here dedups
    against yesterday's CLI run), and output parquet is written BEFORE
    the store commit so a crash can only duplicate (dedupable by
    pair_id), never lose.

    Contradiction scope matches the batch front door applied per drop:
    both sides of an opposite-orientation pair WITHIN one drop are
    dropped (their fingerprints still commit to the dedup store, as in
    the batch twin, so redelivery cannot resurrect them). A
    contradiction SPLIT ACROSS drops is not detected — the ordered pair
    fingerprints differ, so the store accepts both; screen accumulated
    output with :func:`contradicting_pairs` on a maintenance cadence if
    cross-drop label noise matters. ``trigger`` defaults to
    ``{"availableNow": True}`` (drain-and-stop)."""
    from xdump_spark.sources.jsonl import parse_jsonl_lines

    raw = spark.readStream.text(input_dir)
    use_schema = schema or PREFERENCE_SCHEMA

    def _do_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        pairs, corrupt = parse_jsonl_lines(batch_df, use_schema)
        if corrupt_dir is not None:
            corrupt.write.mode("append").parquet(corrupt_dir)
        flagged = validate_pairs(pairs)
        rejects = flagged.filter(~F.col("valid")).select("pair_id", "reason")
        if rejects_dir is not None:
            rejects.write.mode("append").parquet(rejects_dir)
        cur = flagged.filter(F.col("valid")).drop("valid", "reason")
        accepted, commit = dedup_pairs_incremental(
            cur, store, defer_commit=True
        )
        survivors = cur.join(
            accepted.withColumnRenamed("id", "pair_id"), "pair_id",
            "left_semi",
        )
        if drop_contradictions:
            both = contradicting_pairs(survivors)
            bad = (
                both.select(F.col("id_a").alias("pair_id"))
                .unionByName(both.select(F.col("id_b").alias("pair_id")))
                .distinct()
            )
            survivors = survivors.join(bad, "pair_id", "left_anti")
        out = render_dpo(survivors, template=template)
        out.write.mode("append").parquet(out_dir)
        commit()

    writer = raw.writeStream.foreachBatch(_do_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    trig = trigger or {"availableNow": True}
    return writer.trigger(**trig).start()


@dataclass
class PreferenceResult:
    """prepare_preference_corpus output: the training-ready frame plus
    rejects, the per-stage audit, and the length-bias diagnostic."""

    pairs: DataFrame                    # valid, deduped, capped, rendered
    rejects: DataFrame                  # (id, reason) for invalid rows
    audit: dict = field(default_factory=dict)
    length_bias: dict | None = None
    contradictions: DataFrame | None = None  # (id_a, id_b) dropped pairs
    store_commit: object | None = None       # call AFTER writing output
    splits: dict | None = None               # name -> DataFrame (if splits)


def prepare_preference_corpus(
    pairs: DataFrame,
    prompt_col: str = "prompt",
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
    id_col: str = "pair_id",
    template: str = "chatml",
    allowed_roles: tuple = DEFAULT_ROLES,
    require_alternation: bool = True,
    dedup: bool = True,
    dedup_store=None,
    drop_contradictions: bool = True,
    max_per_prompt: int | None = None,
    benchmark: DataFrame | None = None,
    contamination_n: int = 8,
    shuffle_seed: int | None = 0,
    audit: bool = True,
    length_bias: bool = True,
    from_ratings: bool = False,
    response_col: str = "response",
    rating_col: str = "rating",
    rating_policy: str = "best_vs_worst",
    rating_margin: float = 0.0,
    splits: dict[str, float] | None = None,
    split_seed: int = 0,
    flagged: DataFrame | None = None,
) -> PreferenceResult:
    """One-call preference preparation: validate → (reject with reasons)
    → pair dedup → drop BOTH sides of contradicting pairs → optional
    per-prompt cap → optional benchmark decontamination → render both
    sides (+ response spans) → reproducible shuffle, plus the corpus
    length-bias diagnostic. Mirrors prepare_sft_corpus' contract: stages
    that would mutate rendered text are absent, filter-only gates
    compose downstream.

    ``from_ratings=True`` accepts the scored-response interchange
    instead (one row per (prompt, response, rating)) and converts it
    through :func:`pairs_from_ratings` under ``rating_policy`` /
    ``rating_margin`` before the normal pipeline; ``chosen_col`` /
    ``rejected_col`` then name the CONVERTED columns (leave default).
    ``splits`` partitions the final frame with the deterministic
    ``cleaning.hash_split`` on ``id_col`` (same contract as the SFT and
    pretraining front doors); ``result.splits`` maps name → frame.

    ``flagged``: the output of :func:`validate_pairs` over ``pairs``
    under the SAME validation kwargs, if the caller already built it —
    same contract (and same driver-side motivation) as
    ``prepare_sft_corpus``'s ``flagged``. Ignored when
    ``from_ratings=True`` (the converted frame differs from the
    caller's input).

    NOTE — eager work at build time: when any of ``dedup`` (without a
    store), ``drop_contradictions``, or ``max_per_prompt`` is active
    (the default), the builder runs ONE Spark job immediately — an
    eager localCheckpoint of the narrow (id + hash keys) frame the
    gates share (r14; the lazy form re-derived the full validate +
    canonical-transcript lineage per gate, 10 corpus scans at sf0.1).
    Callers that construct the frame without ever executing it pay
    that one narrow pass."""
    if from_ratings:
        pairs = pairs_from_ratings(
            pairs,
            prompt_col=prompt_col,
            response_col=response_col,
            rating_col=rating_col,
            policy=rating_policy,
            margin=rating_margin,
            id_col=id_col,
        )
        flagged = None  # the converted frame is not the caller's input
    kw = dict(prompt_col=prompt_col, chosen_col=chosen_col, rejected_col=rejected_col)
    if flagged is None:
        flagged = validate_pairs(
            pairs,
            allowed_roles=allowed_roles,
            require_alternation=require_alternation,
            **kw,
        )
    rejects = flagged.filter(~F.col("valid")).select(id_col, "reason")
    cur = flagged.filter(F.col("valid")).drop("valid", "reason")
    counts: dict = {}
    if audit:
        row = flagged.agg(
            F.count("*").alias("n"),
            F.sum(F.col("valid").cast("long")).alias("v"),
        ).first()
        counts["input"] = int(row["n"])
        counts["valid"] = int(row["v"] or 0)

    # Every id-set gate below (batch dedup, contradiction drop, the
    # per-prompt cap) keys on hashes of the SAME canonical texts. Built
    # independently, each gate re-derives the full validate + canonical-
    # transcript lineage per self-join branch — the panel's plan showed
    # 10 corpus scans / 106 regexp_replace evaluations, and the pair
    # front door measured 4.5-7.7 s to materialize at sf0.1 (r14). One
    # narrow pass now computes every needed key and eagerly checkpoints
    # (id + up to 7 hash/bool columns, ~50 B/row — scale-safe where
    # checkpointing the full text frame would not be); the gates then
    # run id-algebra on the checkpointed frame and the full-text lineage
    # executes once more for the final render. Results are identical:
    # the same keys feed the same groupBy/join logic.
    batch_dedup = dedup and dedup_store is None
    keys = None
    if batch_dedup or drop_contradictions or max_per_prompt is not None:
        from xdump_spark.operators.incremental import hash128

        c = norm_content(F.col(chosen_col))
        r = norm_content(F.col(rejected_col))
        pt = canonical_transcript(F.col(prompt_col))
        fp1, fp2 = hash128(F.concat_ws(_SECTION_SEP, pt, c, r))
        ck1, ck2 = hash128(
            F.concat_ws(_SECTION_SEP, pt, F.least(c, r), F.greatest(c, r))
        )
        pp1, pp2 = hash128(pt)
        keys = cur.select(
            F.col(id_col).alias("id"),
            fp1.alias("_f1"), fp2.alias("_f2"),
            ck1.alias("_c1"), ck2.alias("_c2"), (c < r).alias("_orient"),
            pp1.alias("_p1"), pp2.alias("_p2"),
        ).localCheckpoint(eager=True)

    store_commit = None
    if dedup and dedup_store is not None:
        # daily-drop mode — see dedup_pairs_incremental; commit deferred
        # into the result (call result.store_commit() after the output
        # is durably written)
        accepted, store_commit = dedup_pairs_incremental(
            cur, dedup_store, id_col=id_col, defer_commit=True, **kw
        )
        cur = cur.join(
            accepted.withColumnRenamed("id", id_col), id_col, "left_semi"
        )
        if keys is not None:
            keys = keys.join(
                accepted.withColumnRenamed("id", id_col)
                .select(F.col(id_col).alias("id")),
                "id", "left_semi",
            )
        if audit:
            cur = cur.persist()
            counts["deduped"] = cur.count()
    elif dedup:
        # keep the min-id pair per canonical fingerprint — the
        # dedup_pairs contract, driven off the checkpointed keys
        keep = keys.groupBy("_f1", "_f2").agg(F.min("id").alias("id"))
        kept_ids = keep.select("id")
        cur = cur.join(
            kept_ids.withColumnRenamed("id", id_col), id_col, "left_semi"
        )
        keys = keys.join(kept_ids, "id", "left_semi")
        if audit:
            cur = cur.persist()
            counts["deduped"] = cur.count()
    both = None
    if drop_contradictions:
        # contradicting_pairs' self-join, over the checkpointed keys
        a, b = keys.alias("a"), keys.alias("b")
        both = a.join(
            b,
            (F.col("a._c1") == F.col("b._c1"))
            & (F.col("a._c2") == F.col("b._c2"))
            & (F.col("a._orient") != F.col("b._orient"))
            & (F.col("a.id") < F.col("b.id")),
        ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        bad_ids = both.select(F.col("id_a").alias(id_col)).unionByName(
            both.select(F.col("id_b").alias(id_col))
        ).distinct()
        cur = cur.join(bad_ids, id_col, "left_anti")
        keys = keys.join(
            bad_ids.withColumnRenamed(id_col, "id"), "id", "left_anti"
        )
        if audit:
            counts["consistent"] = cur.count()
    if max_per_prompt is not None:
        # cap_per_prompt's skew-robust top-k, driven off the keys frame
        from xdump_spark.operators.skew import topk_per_key

        kept = topk_per_key(
            keys.select("id", "_p1", "_p2"),
            ["_p1", "_p2"], [F.col("id").asc()], k=max_per_prompt, n_salt=16,
        ).select(F.col("id").alias(id_col))
        cur = cur.join(kept, id_col, "left_semi")
        if audit:
            counts["capped"] = cur.count()
    if benchmark is not None:
        cur = decontaminate_pairs(
            cur, benchmark, id_col=id_col, n=contamination_n, **kw
        )
        if audit:
            counts["decontaminated"] = cur.count()
    bias = length_bias_stats(cur, id_col=id_col, **kw) if length_bias else None
    cur = render_dpo(cur, template=template, **kw)
    if shuffle_seed is not None:
        from xdump_spark.operators.cleaning import deterministic_shuffle

        cur = deterministic_shuffle(cur, seed=shuffle_seed, id_col=id_col)
    split_frames = None
    if splits is not None:
        from xdump_spark.operators.cleaning import hash_split

        split_frames = hash_split(cur, splits, seed=split_seed, id_col=id_col)
        if audit:
            for name, f in split_frames.items():
                counts[f"split_{name}"] = f.count()
    return PreferenceResult(
        pairs=cur, rejects=rejects, audit=counts, length_bias=bias,
        contradictions=both, store_commit=store_commit, splits=split_frames,
    )
