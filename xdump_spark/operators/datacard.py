"""Data card: the corpus datasheet as one JSON-safe dict.

"Datasheets for Datasets" (Gebru et al. 2021) / the model-card appendix
every LLM release ships: what's in the corpus, from where, in which
languages, and what the quality signals look like. (The reference
engine's nearest analog is its dump manifest of table row counts,
xdump/base.py:128-142; this is the corpus-level generalization.)

Composition of existing single-pass pieces — each one a single
map-side-combined aggregation whose result is sources/langs/metrics-
sized, never corpus-sized:

1. quality_feature_frame → profile_table: every quality/repetition
   signal's count/mean/stddev/min/max + requested quantiles in ONE
   fused aggregation (GK sketches keep quantiles in the same pass);
2. compression_ratio_frame → profile_table (r6): per-doc zlib
   redundancy, one Arrow pass + one fused aggregation;
3. readability_frame → profile_table (r6): Flesch reading ease, pure
   codegen + one fused aggregation;
4. mixture_stats: per-source doc/token counts and token shares;
5. the language distribution groupBy;
6. (optional, r6) dsir_score → profile_table when a ``dsir_model`` is
   supplied: the importance log-weight distribution against the
   caller's target corpus model.

Each numbered item is an independent narrow-transform → fused-agg
pipeline over the corpus (no joins between the signal frames — a
doc_id join would shuffle the corpus just to co-locate columns that
are immediately reduced away).

The returned dict is plain data (json.dumps-able) — the artifact a
pipeline run attaches next to its output corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xdump_spark.operators.classifier import QUALITY_FEATURES, quality_feature_frame
from xdump_spark.operators.curation import compression_ratio_frame, mixture_stats
from xdump_spark.operators.profile import profile_table
from xdump_spark.operators.text import readability_frame


def _profile_into(
    signals: dict, frame: DataFrame, columns: list[str], quantiles
) -> None:
    """Run profile_table on ``frame`` and merge (column → metric → value)
    into ``signals`` — one fused aggregation per call."""
    for r in profile_table(frame, columns=columns, quantiles=quantiles).collect():
        signals.setdefault(r["column"], {})[r["metric"]] = (
            None if r["value"] is None else float(r["value"])
        )


def data_card(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str | None = "source",
    lang_col: str | None = "lang",
    url_col: str | None = "url",
    top_domains: int = 20,
    quantiles: tuple[float, ...] = (0.1, 0.5, 0.9),
    dsir_model=None,
    ngram_lm=None,
) -> dict:
    """Build the corpus data card.

    ``source_col``/``lang_col``/``url_col`` sections are skipped (not
    errored) when the column is absent or the argument is None — crawl
    snapshots before language-ID have no lang column, and the card
    should still render. ``dsir_model`` (a ``dsir.DSIRModel``, optional) adds the
    importance log-weight distribution — the datasheet readers use to
    judge how target-like the corpus is. ``ngram_lm`` (an
    ``lm.NgramLM``, optional) adds the reference-LM perplexity
    distribution — the CCNet-style fluency axis of the datasheet.
    """
    cols = set(docs.columns)
    for required in (text_col, id_col):
        if required not in cols:
            raise ValueError(f"column {required!r} not in corpus")

    feats = quality_feature_frame(docs, text_col=text_col, id_col=id_col)
    signals: dict[str, dict[str, float]] = {}
    _profile_into(signals, feats, list(QUALITY_FEATURES), quantiles)
    n_docs = int(signals["n_tokens"]["count"] or 0)
    # totals derivable from the same pass: Σ tokens = mean·count
    n_tokens = int(round((signals["n_tokens"]["mean"] or 0) * n_docs))
    n_chars = int(round((signals["n_chars"]["mean"] or 0) * n_docs))

    # r6 signal families (VERDICT r5 #6): redundancy and readability
    # belong in the published datasheet alongside the r4 quality signals
    _profile_into(
        signals,
        compression_ratio_frame(docs, text_col=text_col, id_col=id_col),
        ["compression_ratio"],
        quantiles,
    )
    _profile_into(
        signals,
        readability_frame(docs, text_col=text_col, id_col=id_col),
        ["flesch"],
        quantiles,
    )

    card: dict = {
        "n_docs": n_docs,
        "n_tokens": n_tokens,
        "n_chars": n_chars,
        "signals": signals,
    }

    if dsir_model is not None:
        from xdump_spark.operators.dsir import dsir_score

        dsir_signals: dict[str, dict[str, float]] = {}
        _profile_into(
            dsir_signals,
            dsir_score(docs, dsir_model, text_col=text_col, id_col=id_col),
            ["dsir_logw"],
            quantiles,
        )
        card["dsir"] = dsir_signals["dsir_logw"]

    if ngram_lm is not None:
        from xdump_spark.operators.lm import lm_score

        lm_signals: dict[str, dict[str, float]] = {}
        _profile_into(
            lm_signals,
            lm_score(docs, ngram_lm, text_col=text_col, id_col=id_col),
            ["mean_surprisal", "ppl"],
            quantiles,
        )
        card["lm"] = {
            "surprisal": lm_signals["mean_surprisal"],
            "ppl": lm_signals["ppl"],
        }

    if source_col and source_col in cols:
        card["sources"] = [
            {
                "source": r[source_col],
                "n_docs": int(r["n_docs"]),
                "n_tokens": int(r["n_tokens"]),
                "token_share": float(r["token_share"]),
            }
            for r in mixture_stats(docs, part_col=source_col, text_col=text_col)
            .orderBy(F.desc("n_tokens"), source_col)
            .collect()
        ]
    if lang_col and lang_col in cols:
        per = (
            docs.groupBy(lang_col)
            .agg(F.count("*").alias("n_docs"))
            .orderBy(F.desc("n_docs"), lang_col)
            .collect()
        )
        total = sum(r["n_docs"] for r in per) or 1
        card["languages"] = [
            {
                "lang": r[lang_col],
                "n_docs": int(r["n_docs"]),
                "doc_share": round(r["n_docs"] / total, 6),
            }
            for r in per
        ]
    if url_col and url_col in cols:
        # Domain concentration (r6): the datasheet question a crawl
        # corpus must answer — how much of it is a handful of hosts?
        # One groupBy on the derived registrable domain; the top-k is
        # a TakeOrderedAndProject, never a full sort.
        from xdump_spark.operators.web import with_domain

        dom = with_domain(docs.select(url_col), url_col, out_col="_dc_dom")
        per_dom = (
            dom.groupBy("_dc_dom").agg(F.count("*").alias("n_docs"))
        )
        agg = per_dom.agg(
            F.count("*").alias("n_domains"),
            F.sum("n_docs").alias("n_rows"),
        ).collect()[0]
        top = (
            per_dom.orderBy(F.desc("n_docs"), "_dc_dom")
            .limit(top_domains)
            .collect()
        )
        total = int(agg["n_rows"] or 0) or 1  # sum over zero rows is NULL
        card["domains"] = {
            # n_domains counts the NULL (unparseable/IP) group if present
            "n_distinct": int(agg["n_domains"]),
            "top": [
                {
                    "domain": r["_dc_dom"],
                    "n_docs": int(r["n_docs"]),
                    "doc_share": round(r["n_docs"] / total, 6),
                }
                for r in top
            ],
        }
    return card


def conversation_card(
    convs: DataFrame,
    conv_col: str = "messages",
    id_col: str = "conv_id",
    quantiles: tuple[float, ...] = (0.1, 0.5, 0.9),
) -> dict:
    """Datasheet for an SFT conversations corpus: counts and totals,
    per-role turn/token budget distributions (one fused profile pass
    over conversation_stats' single-Project frame), the validation
    reason breakdown (what a curation run WOULD reject and why), and the
    canonical-fingerprint duplicate rate. Three aggregation jobs total —
    publishable for a 10 B-conversation corpus."""
    from xdump_spark.operators.sft import (
        conversation_fingerprint,
        conversation_stats,
        validate_conversations,
    )

    budget_cols = [
        "n_turns", "n_system", "n_user", "n_assistant",
        "user_tokens", "assistant_tokens", "total_tokens",
    ]
    signals: dict[str, dict[str, float]] = {}
    _profile_into(
        signals,
        conversation_stats(convs, conv_col=conv_col, id_col=id_col),
        budget_cols,
        quantiles,
    )
    n_convs = int(signals["n_turns"]["count"] or 0)
    reasons = {
        r["reason"]: int(r["n"])
        for r in validate_conversations(convs, conv_col=conv_col)
        .groupBy("reason")
        .agg(F.count("*").alias("n"))
        .collect()
        if r["reason"] is not None
    }
    dup = conversation_fingerprint(convs, conv_col=conv_col).agg(
        F.count("*").alias("n"),
        F.countDistinct("h1", "h2").alias("uniq"),
    ).collect()[0]
    n = int(dup["n"] or 0)
    return {
        "n_convs": n_convs,
        "n_tokens": int(round((signals["total_tokens"]["mean"] or 0) * n_convs)),
        "budgets": signals,
        "invalid": {"n": sum(reasons.values()), "reasons": reasons},
        "duplicates": {
            "n_duplicate": n - int(dup["uniq"] or 0),
            "duplicate_share": round((n - int(dup["uniq"] or 0)) / n, 6) if n else 0.0,
        },
    }


def preference_card(
    pairs: DataFrame,
    prompt_col: str = "prompt",
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
    id_col: str = "pair_id",
    quantiles: tuple[float, ...] = (0.1, 0.5, 0.9),
) -> dict:
    """Datasheet for a preference-pair corpus: counts, per-pair token
    distributions, the validation reason breakdown, the pair-fingerprint
    duplicate rate, the contradiction count (opposite-orientation pairs
    — direct label noise), and the corpus length-bias diagnostic
    (frac_chosen_longer ≈ 0.5 is unbiased; Singhal et al. 2023)."""
    from xdump_spark.operators.preference import (
        contradicting_pairs,
        length_bias_stats,
        pair_fingerprint,
        pair_stats,
        validate_pairs,
    )

    kw = dict(prompt_col=prompt_col, chosen_col=chosen_col, rejected_col=rejected_col)
    signals: dict[str, dict[str, float]] = {}
    _profile_into(
        signals,
        pair_stats(pairs, id_col=id_col, **kw),
        ["prompt_turns", "prompt_tokens", "chosen_tokens",
         "rejected_tokens", "token_delta"],
        quantiles,
    )
    reasons = {
        r["reason"]: int(r["n"])
        for r in validate_pairs(pairs, **kw)
        .groupBy("reason")
        .agg(F.count("*").alias("n"))
        .collect()
        if r["reason"] is not None
    }
    dup = pair_fingerprint(pairs, **kw).agg(
        F.count("*").alias("n"),
        F.countDistinct("h1", "h2").alias("uniq"),
    ).collect()[0]
    n = int(dup["n"] or 0)
    return {
        "n_pairs": n,
        "tokens": signals,
        "invalid": {"n": sum(reasons.values()), "reasons": reasons},
        "duplicates": {
            "n_duplicate": n - int(dup["uniq"] or 0),
            "duplicate_share": round((n - int(dup["uniq"] or 0)) / n, 6) if n else 0.0,
        },
        "n_contradicting": int(
            contradicting_pairs(pairs, id_col=id_col, **kw).count()
        ),
        "length_bias": length_bias_stats(pairs, id_col=id_col, **kw),
    }
