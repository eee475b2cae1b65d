"""Web/URL operators: parse, canonicalize, registrable domain, URL
dedup, per-domain caps — crafted hand-checkable URLs plus idempotence
and plan-shape assertions."""

import pytest
from pyspark.sql import functions as F

from xdump_spark.operators.web import (
    domain_cap,
    normalize_urls,
    parse_urls,
    registrable_domain,
    url_dedup,
    with_domain,
)

URLS = [
    (1, "http://Example.COM/a/b?x=1&y=2"),
    (2, "https://user:pw@sub.example.co.uk:8443/path?z=9#frag"),
    (3, "http://example.com:80/a/b?y=2&x=1#other"),       # normalizes == 1
    (4, "https://example.com"),                            # empty path
    (5, "not a url at all"),
    (6, "ftp://files.example.org/pub/file.txt"),
    (7, "http://192.168.0.1:8080/admin"),
    (8, "http://localhost/x"),
]


@pytest.fixture(scope="module")
def urls(spark):
    return spark.createDataFrame(URLS, "doc_id long, url string")


def test_parse_urls_components(spark, urls):
    rows = {r.doc_id: r for r in parse_urls(urls).collect()}
    r1 = rows[1]
    assert (r1.url_scheme, r1.url_host, r1.url_port, r1.url_path, r1.url_query) == (
        "http", "example.com", None, "/a/b", "x=1&y=2"
    )
    r2 = rows[2]
    assert (r2.url_scheme, r2.url_host, r2.url_port, r2.url_path, r2.url_query) == (
        "https", "sub.example.co.uk", 8443, "/path", "z=9"
    )
    r4 = rows[4]
    assert (r4.url_scheme, r4.url_host, r4.url_path, r4.url_query) == (
        "https", "example.com", None, None
    )
    r5 = rows[5]
    assert (r5.url_scheme, r5.url_host, r5.url_port, r5.url_path, r5.url_query) == (
        None, None, None, None, None
    )
    assert rows[6].url_scheme == "ftp" and rows[6].url_host == "files.example.org"
    assert rows[7].url_host == "192.168.0.1" and rows[7].url_port == 8080


def test_normalize_urls_canonical_and_idempotent(spark, urls):
    normed = normalize_urls(urls)
    vals = {r.doc_id: r.url_norm for r in normed.collect()}
    # case, default port, fragment, param order all collapse
    assert vals[1] == vals[3] == "http://example.com/a/b?x=1&y=2"
    assert vals[2] == "https://sub.example.co.uk:8443/path?z=9"
    assert vals[4] == "https://example.com/"
    assert vals[5] is None
    # idempotence: normalizing the normalized column is a fixpoint
    again = {
        r.doc_id: r.n2
        for r in normalize_urls(
            normed.withColumnRenamed("url_norm", "u1"), "u1", out_col="n2"
        ).collect()
    }
    for k, v in vals.items():
        assert again[k] == v, k


def test_registrable_domain_rules(spark):
    hosts = [
        ("news.example.co.uk", "example.co.uk"),
        ("a.b.example.com", "example.com"),
        ("example.com", "example.com"),
        ("co.uk", None),            # the suffix itself
        ("192.168.0.1", None),      # IP literal
        ("localhost", None),        # no dot
        ("deep.sub.site.com.au", "site.com.au"),
    ]
    df = spark.createDataFrame(hosts, "host string, want string")
    out = df.withColumn("got", registrable_domain(F.col("host"))).collect()
    for r in out:
        assert r.got == r.want, r.host


def test_with_domain_and_url_dedup(spark, urls):
    doms = {r.doc_id: r.domain for r in with_domain(urls).collect()}
    assert doms[1] == "example.com" and doms[2] == "example.co.uk"
    assert doms[5] is None and doms[7] is None and doms[8] is None

    kept = sorted(r.doc_id for r in url_dedup(urls).collect())
    # 3 normalizes onto 1 and loses (min id); unparseable 5 is KEPT
    assert kept == [1, 2, 4, 5, 6, 7, 8]
    # schema untouched (helper columns dropped)
    assert url_dedup(urls).columns == ["doc_id", "url"]


def test_domain_cap_bounds_every_domain(spark):
    rows = [(i, f"http://hot.example.com/p{i}") for i in range(40)]
    rows += [(100 + i, f"http://site{i}.org/x") for i in range(5)]
    rows += [(200 + i, "garbage url") for i in range(10)]     # NULL group
    df = spark.createDataFrame(rows, "doc_id long, url string")
    capped = domain_cap(df, cap=3)
    counts = (
        with_domain(capped)
        .groupBy("domain")
        .count()
        .collect()
    )
    for r in counts:
        assert r["count"] <= 3, r
    # determinism
    a = sorted(r.doc_id for r in domain_cap(df, cap=3).collect())
    b = sorted(r.doc_id for r in domain_cap(df, cap=3).collect())
    assert a == b
    assert capped.columns == ["doc_id", "url"]


def test_web_ops_stay_codegen(spark, urls):
    """No Python evaluation anywhere: parse/normalize/domain are pure
    column expressions."""
    for frame in (parse_urls(urls), normalize_urls(urls), with_domain(urls)):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "Exchange" not in plan  # narrow: no shuffle at all


def test_pipeline_url_stages(spark, tmp_path):
    """url_dedup + domain_cap ride prepare_training_corpus (and the
    curate config) ahead of every text stage; missing URL column fails
    loudly."""
    import json

    from xdump_spark.config import curate_from_config
    from xdump_spark.pipeline import prepare_training_corpus

    rows = [
        (1, "shared article body text here", "http://Example.com/a?x=1"),
        (2, "shared article body text here", "http://example.com:80/a?x=1"),  # re-crawl of 1
        (3, "distinct text three", "http://example.com/b"),
        (4, "distinct text four", "http://example.com/c"),
        (5, "distinct text five", "http://other.org/z"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, url string")
    res = prepare_training_corpus(
        docs, span_k=None, min_tokens=1, dedup_urls=True, domain_cap=2
    )
    kept = {r.doc_id for r in res.corpus.collect()}
    assert 5 in kept and 2 not in kept           # re-crawl gone
    assert len([d for d in kept if d in (1, 3, 4)]) == 2  # example.com capped
    assert res.audit["url_deduped"] == 4
    assert res.audit["domain_capped"] == 3

    with pytest.raises(ValueError, match="url"):
        prepare_training_corpus(
            docs.drop("url"), span_k=None, dedup_urls=True
        )

    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    cfg = {
        "input": src, "output": str(tmp_path / "out"),
        "span_k": None, "min_tokens": 1,
        "dedup_urls": True, "domain_cap": 2,
    }
    p = tmp_path / "c.json"
    p.write_text(json.dumps(cfg))
    res2 = curate_from_config(spark, str(p))
    assert res2.audit["url_deduped"] == 4
    assert res2.audit["domain_capped"] == 3


def test_normalize_urls_matches_stdlib_reference(spark):
    """Independent-implementation cross-check: the codegen
    canonicalization equals a urllib.parse-based reference on a
    generated URL population (mixed case, ports, params, fragments,
    userinfo)."""
    from urllib.parse import urlsplit

    def ref_norm(u):
        try:
            s = urlsplit(u.strip())
        except ValueError:
            return None
        if not s.scheme or not s.hostname:
            return None
        scheme = s.scheme.lower()
        host = s.hostname.lower()
        port = s.port
        if (scheme, port) in (("http", 80), ("https", 443)):
            port = None
        out = f"{scheme}://{host}"
        if port is not None:
            out += f":{port}"
        out += s.path if s.path else "/"
        if s.query:
            out += "?" + "&".join(sorted(s.query.split("&")))
        return out

    import random

    rng = random.Random(7)
    urls = []
    for i in range(300):
        scheme = rng.choice(["http", "HTTP", "https", "HtTpS"])
        user = rng.choice(["", "u@", "u:p@"])
        host = rng.choice(
            ["Example.com", "a.B.example.ORG", "x-y.example.co.uk", "example.net"]
        )
        port = rng.choice(["", ":80", ":443", ":8080", ":1234"])
        path = rng.choice(["", "/", "/a", "/a/b%20c", "/p.html"])
        q = rng.choice(["", "?b=2&a=1", "?a=1", "?z&y&x"])
        frag = rng.choice(["", "#f", "#a/b"])
        urls.append((i, f"{scheme}://{user}{host}{port}{path}{q}{frag}"))
    df = spark.createDataFrame(urls, "doc_id long, url string")
    got = {r.doc_id: r.url_norm for r in normalize_urls(df).collect()}
    for i, u in urls:
        assert got[i] == ref_norm(u), (u, got[i], ref_norm(u))


# --------------------------------------------- r7 full PSL fidelity ----


def test_registrable_domain_psl_wildcard_exception(spark):
    """The publicsuffix.org algorithm's own canonical cases (test_psl.txt
    shapes) over a rule set with normal, wildcard and exception rules:
    exception prevails, else longest match, else the implicit '*'."""
    from xdump_spark.operators.web import registrable_domain

    rules = (
        "com", "co.uk",
        "jp", "ac.jp", "kyoto.jp", "ide.kyoto.jp", "*.kobe.jp", "!city.kobe.jp",
        "*.ck", "!www.ck",
        "us", "ak.us", "k12.ak.us",
    )
    cases = [
        # (host, expected registrable domain) — from the official test
        ("com", None), ("example.com", "example.com"),
        ("www.example.com", "example.com"),
        ("jp", None), ("test.jp", "test.jp"), ("www.test.jp", "test.jp"),
        ("ac.jp", None), ("test.ac.jp", "test.ac.jp"),
        ("www.test.ac.jp", "test.ac.jp"),
        ("kyoto.jp", None), ("test.kyoto.jp", "test.kyoto.jp"),
        ("ide.kyoto.jp", None), ("b.ide.kyoto.jp", "b.ide.kyoto.jp"),
        ("a.b.ide.kyoto.jp", "b.ide.kyoto.jp"),
        ("c.kobe.jp", None), ("b.c.kobe.jp", "b.c.kobe.jp"),
        ("a.b.c.kobe.jp", "b.c.kobe.jp"),
        ("city.kobe.jp", "city.kobe.jp"),
        ("www.city.kobe.jp", "city.kobe.jp"),
        ("ck", None), ("test.ck", None), ("b.test.ck", "b.test.ck"),
        ("a.b.test.ck", "b.test.ck"),
        ("www.ck", "www.ck"), ("www.www.ck", "www.ck"),
        ("us", None), ("test.us", "test.us"), ("www.test.us", "test.us"),
        ("ak.us", None), ("test.ak.us", "test.ak.us"),
        ("www.test.ak.us", "test.ak.us"),
        ("k12.ak.us", None), ("test.k12.ak.us", "test.k12.ak.us"),
        ("www.test.k12.ak.us", "test.k12.ak.us"),
    ]
    df = spark.createDataFrame(cases, "host string, want string")
    got = df.withColumn("got", registrable_domain(F.col("host"), rules))
    for r in got.collect():
        assert r.got == r.want, (r.host, r.got, r.want)
    # pure codegen: no Python evaluation node anywhere in the plan
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_load_psl_sections():
    from xdump_spark.operators.web import load_psl

    text = "\n".join([
        "// The PSL",
        "",
        "// ===BEGIN ICANN DOMAINS===",
        "com",
        "// comment inside",
        "*.ck",
        "!www.ck",
        "// ===END ICANN DOMAINS===",
        "// ===BEGIN PRIVATE DOMAINS===",
        "github.io",
        "// ===END PRIVATE DOMAINS===",
    ])
    assert load_psl(text) == ("com", "*.ck", "!www.ck", "github.io")
    assert load_psl(text, "icann") == ("com", "*.ck", "!www.ck")
    assert load_psl(text, "private") == ("github.io",)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="sections"):
        load_psl(text, "nope")


def test_read_psl_and_domain_cap_with_psl(spark, tmp_path):
    """A PSL snapshot file drives domain_cap: wildcard suffixes make
    each *.ck label its own publisher, the exception keeps www.ck one."""
    from xdump_spark.operators.web import domain_cap, read_psl, with_domain

    psl = tmp_path / "psl.dat"
    psl.write_text("// snapshot\ncom\n*.ck\n!www.ck\n")
    rules = read_psl(spark, str(psl))
    assert rules == ("com", "*.ck", "!www.ck")

    rows = [(i, f"http://sub{i}.hot.example.com/x") for i in range(10)]
    rows += [(100 + i, f"http://a{i}.foo.ck/x") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    capped = domain_cap(df, cap=2, multi_suffixes=rules)
    doms = (
        with_domain(capped, multi_suffixes=rules)
        .groupBy("domain").count().collect()
    )
    by = {r.domain: r["count"] for r in doms}
    # all ten example.com subdomains are ONE publisher, capped to 2;
    # a{i}.foo.ck are six DIFFERENT registrable domains (wildcard), all kept
    assert by["example.com"] == 2
    assert sum(v for d, v in by.items() if d and d.endswith("foo.ck")) == 6
