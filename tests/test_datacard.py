"""Data-card tests (operators/datacard.py + the datacard CLI
subcommand): exact totals/shares on a crafted corpus, DuckDB
cross-check on real testdata, graceful section skipping."""

import json

import duckdb
import pytest

from xdump_spark.operators.datacard import data_card


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "one two three four", "en", "web"),
        (2, "five six", "en", "web"),
        (3, "sept huit neuf", "fr", "books"),
        (4, "zehn", "de", "books"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_data_card_exact_values(spark, corpus):
    card = data_card(corpus)
    assert card["n_docs"] == 4
    assert card["n_tokens"] == 10
    assert card["n_chars"] == sum(len(t) for t in
                                  ("one two three four", "five six", "sept huit neuf", "zehn"))
    src = {s["source"]: s for s in card["sources"]}
    assert src["web"]["n_docs"] == 2 and src["web"]["n_tokens"] == 6
    assert src["books"]["n_tokens"] == 4
    assert src["web"]["token_share"] == pytest.approx(0.6, abs=1e-6)
    langs = {l["lang"]: l for l in card["languages"]}
    assert langs["en"]["n_docs"] == 2 and langs["en"]["doc_share"] == 0.5
    # signal stats exist for every feature, with the quantile metrics
    assert set(card["signals"]) >= {"n_tokens", "ttr", "punct_ratio"}
    assert {"mean", "p10", "p50", "p90"} <= set(card["signals"]["n_tokens"])
    assert card["signals"]["n_tokens"]["mean"] == pytest.approx(2.5)
    # plain data: must serialize
    json.dumps(card)


def test_data_card_skips_absent_sections(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    card = data_card(docs)
    assert "sources" not in card and "languages" not in card
    assert card["n_docs"] == 1 and card["n_tokens"] == 3
    with pytest.raises(ValueError, match="not in corpus"):
        data_card(docs, text_col="missing")


def test_data_card_real_testdata_vs_duckdb(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    card = data_card(docs)
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    n_docs, n_tokens, n_chars, n_langs, n_sources = con.execute(
        r"""select count(*),
                  sum(len(regexp_split_to_array(trim(text), '\s+'))),
                  sum(length(text)),
                  count(distinct lang), count(distinct source)
           from documents"""
    ).fetchone()
    assert card["n_docs"] == n_docs
    assert card["n_tokens"] == n_tokens
    assert card["n_chars"] == n_chars
    assert len(card["languages"]) == n_langs
    assert len(card["sources"]) == n_sources
    assert sum(s["n_docs"] for s in card["sources"]) == n_docs
    share_sum = sum(s["token_share"] for s in card["sources"])
    assert share_sum == pytest.approx(1.0, abs=1e-3)

    # r6 sections: redundancy + readability, cross-checked against an
    # INDEPENDENT driver-side recomputation from the same parquet (zlib
    # is outside DuckDB's SQL surface; the texts come back via DuckDB)
    import re
    import zlib

    texts = [t for (t,) in con.execute("select text from documents").fetchall()]
    ratios = [
        len(zlib.compress(t.encode(), 6)) / len(t.encode()) if t else 1.0
        for t in texts
    ]
    assert card["signals"]["compression_ratio"]["count"] == n_docs
    assert card["signals"]["compression_ratio"]["mean"] == pytest.approx(
        sum(ratios) / len(ratios), abs=1e-4
    )
    assert {"p10", "p50", "p90"} <= set(card["signals"]["compression_ratio"])

    def flesch_ref(t):
        words = t.strip().lower().split()
        n_sent = max(len(re.split(r"[.!?]+", t.strip())) - 1, 1)
        syl = sum(
            max(len(re.split("[aeiouy]+", re.sub("e$", "", w))) - 1, 1)
            for w in words
        )
        if not words:
            return None
        return 206.835 - 1.015 * (len(words) / n_sent) - 84.6 * (syl / len(words))

    refs = [f for f in (flesch_ref(t) for t in texts) if f is not None]
    assert card["signals"]["flesch"]["mean"] == pytest.approx(
        sum(refs) / len(refs), abs=1e-2
    )


def test_data_card_dsir_section(spark):
    from xdump_spark.operators.dsir import dsir_score, fit_dsir

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    target = docs.filter("lang = 'en'")
    model = fit_dsir(target, docs)
    card = data_card(docs, dsir_model=model)
    assert {"mean", "p50", "count"} <= set(card["dsir"])
    assert card["dsir"]["count"] == docs.count()
    # the section must equal an independent aggregation of dsir_score
    got_mean = (
        dsir_score(docs, model).agg({"dsir_logw": "avg"}).collect()[0][0]
    )
    assert card["dsir"]["mean"] == pytest.approx(got_mean, abs=1e-6)
    json.dumps(card)
    # and the default card has no dsir section
    assert "dsir" not in data_card(docs)


def test_datacard_cli(spark, tmp_path):
    from xdump_spark.cli import build_parser, run

    out = tmp_path / "card.json"
    args = build_parser().parse_args(
        ["datacard", "-i", "/root/testdata/sf0.001/documents.parquet", "-o", str(out)]
    )
    assert run(args, spark) == 0
    card = json.loads(out.read_text())
    assert card["n_docs"] == 500 and "sources" in card


def test_data_card_domain_section(spark):
    """A url column yields the domain-concentration section: distinct
    registrable domains (NULL bucket included), top list sorted by doc
    count with exact shares; section absent without the column."""
    rows = [
        (1, "t one", "http://a.example.com/x"),
        (2, "t two", "http://b.example.com/y"),       # same registrable dom
        (3, "t three", "https://other.org/z"),
        (4, "t four", "not a url"),
        (5, "t five", "http://other.org/w"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, url string")
    card = data_card(docs, source_col=None, lang_col=None)
    d = card["domains"]
    assert d["n_distinct"] == 3            # example.com, other.org, NULL
    top = {e["domain"]: e for e in d["top"]}
    assert top["example.com"]["n_docs"] == 2
    assert top["other.org"]["n_docs"] == 2
    assert top[None]["n_docs"] == 1
    assert abs(top["example.com"]["doc_share"] - 0.4) < 1e-9

    no_url = data_card(docs.drop("url"), source_col=None, lang_col=None)
    assert "domains" not in no_url
    # top_domains caps the list
    capped = data_card(docs, source_col=None, lang_col=None, top_domains=1)
    assert len(capped["domains"]["top"]) == 1
    assert json.dumps(card)  # stays JSON-safe with a None domain key


def test_data_card_empty_corpus_with_url_col(spark):
    """Zero rows + a url column: the domain section must not crash on
    the NULL sum (int(None))."""
    empty = spark.createDataFrame([], "doc_id long, text string, url string")
    card = data_card(empty, source_col=None, lang_col=None)
    assert card["n_docs"] == 0
    assert card["domains"] == {"n_distinct": 0, "top": []}


def test_conversation_card(spark):
    from xdump_spark.operators.datacard import conversation_card

    convs = spark.createDataFrame(
        [
            (1, [{"role": "user", "content": "a b"},
                 {"role": "assistant", "content": "c d e"}]),
            (2, [{"role": "user", "content": "A   b"},
                 {"role": "assistant", "content": "C d E"}]),   # dup of 1
            (3, [{"role": "user", "content": "x"},
                 {"role": "tool", "content": "t"}]),            # invalid
        ],
        "conv_id long, messages array<struct<role:string,content:string>>",
    )
    card = conversation_card(convs)
    assert card["n_convs"] == 3
    assert card["n_tokens"] == 5 + 5 + 2
    assert card["budgets"]["assistant_tokens"]["mean"] == pytest.approx(2.0)
    assert card["invalid"] == {"n": 1, "reasons": {"unknown_role": 1}}
    assert card["duplicates"] == {"n_duplicate": 1, "duplicate_share": round(1 / 3, 6)}


def test_preference_card(spark):
    from xdump_spark.operators.datacard import preference_card

    pairs = spark.createDataFrame(
        [
            (1, [{"role": "user", "content": "q"}], "one two three", "one"),
            (2, [{"role": "user", "content": "q"}], "one", "one two three"),  # contra of 1
            (3, [{"role": "user", "content": "Q"}], "ONE two  three", "one"), # dup of 1
            (4, [{"role": "user", "content": "bad"}], "same", "same"),        # invalid
        ],
        "pair_id long, prompt array<struct<role:string,content:string>>, "
        "chosen string, rejected string",
    )
    card = preference_card(pairs)
    assert card["n_pairs"] == 4
    assert card["invalid"] == {"n": 1, "reasons": {"identical_responses": 1}}
    assert card["duplicates"]["n_duplicate"] == 1
    # contradictions: (1,2) and (3,2) — 3 is canon-equal to 1
    assert card["n_contradicting"] == 2
    assert card["length_bias"]["n_pairs"] == 4
    assert card["tokens"]["chosen_tokens"]["mean"] == pytest.approx((3 + 1 + 3 + 1) / 4)
