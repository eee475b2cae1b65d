"""Web/URL column operators: parse, canonicalize, registrable domain,
per-domain caps.

A crawl-scale corpus is keyed by URL long before it is keyed by text:
dedup-by-URL removes re-crawls for free, per-DOMAIN caps stop a single
boilerplate-heavy host from dominating the mixture (C4 and RefinedWeb
both cap or weight by host), and the registrable domain is the unit
crawl curation reasons about (two subdomains of one site are one
publisher). The reference engine has no URL surface (it dumps
relational rows); this module is the corpus-side extension, same
posture as operators/text.py.

Everything here is pure Catalyst column expressions (regexp / split /
array ops — zero Python, zero shuffles except the cap's bounded
window), so the operators run inside WholeStageCodegen at any corpus
size. Parsing follows the RFC 3986 reference regex (appendix B)
restricted to the http(s) shapes a crawl sees; it never throws — rows
that don't look like URLs get NULL components, the same per-row
degradation contract as the codecs.

Registrable-domain extraction ("example.co.uk" → "example.co.uk", not
"co.uk") needs the Public Suffix List at full fidelity; shipping and
refreshing the 10k-rule PSL is a deployment choice, so
``registrable_domain`` takes a ``multi_suffixes`` collection (defaults
to the ~40 highest-traffic multi-part suffixes) and applies the
longest-match rule over it — callers with the real PSL pass it in and
get full fidelity from the same expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# RFC 3986 appendix-B reference pattern, anchored, with the pieces this
# module consumes. Java regex (Spark) — group numbers, not names, so the
# same pattern string also runs under RE2 in tests' DuckDB cross-checks.
_URL_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)(/[^?#]*)?(\?[^#]*)?(#.*)?$"

# Default multi-part public suffixes: the high-traffic tail of the PSL.
# NOT the full list (see module docstring) — pass the real PSL's
# multi-part rules for full fidelity.
DEFAULT_MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gen.in", "ac.in", "gov.in",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "co.kr", "or.kr", "ac.kr", "go.kr",
    "com.mx", "org.mx", "com.ar", "com.tr", "com.tw", "com.sg",
    "co.za", "org.za", "co.nz", "org.nz", "govt.nz",
)


def _authority_host(auth: Column) -> Column:
    """authority → lowercase host: strip userinfo@ and :port. IPv6
    literals ([::1]) keep their brackets (they have no registrable
    domain and ports follow the bracket)."""
    no_user = F.regexp_replace(auth, r"^[^@\[\]]*@", "")
    no_port = F.when(
        no_user.startswith("["),
        F.regexp_extract(no_user, r"^(\[[^\]]*\])", 1),
    ).otherwise(F.regexp_replace(no_user, r":\d*$", ""))
    return F.lower(no_port)


def parse_urls(
    df: DataFrame, url_col: str = "url", prefix: str = "url_"
) -> DataFrame:
    """Add ``{prefix}scheme/host/port/path/query`` columns parsed from
    ``url_col``. Non-URL rows yield NULL in every component (regexp
    misses return '' which is normalized to NULL here); the input column
    is left untouched."""
    u = F.trim(F.col(url_col))

    def grp(i: int) -> Column:
        g = F.regexp_extract(u, _URL_RE, i)
        return F.when(g != "", g)

    auth = grp(2)
    port = F.regexp_extract(
        F.regexp_replace(auth, r"^[^@\[\]]*@", ""), r":(\d+)$", 1
    )
    q = grp(4)  # includes the leading '?'
    return (
        df.withColumn(f"{prefix}scheme", F.lower(grp(1)))
        .withColumn(f"{prefix}host", _authority_host(auth))
        .withColumn(f"{prefix}port", F.when(port != "", port).cast("int"))
        .withColumn(f"{prefix}path", grp(3))
        .withColumn(
            f"{prefix}query", F.when(q.isNotNull(), F.substring(q, 2, 1 << 30))
        )
    )


def normalize_urls(
    df: DataFrame, url_col: str = "url", out_col: str = "url_norm"
) -> DataFrame:
    """Canonical URL for exact URL-dedup: lowercase scheme+host, default
    ports dropped (80 for http, 443 for https), fragment dropped, empty
    path → '/', query parameters SORTED bytewise (param order is not
    semantic for the dedup purpose; '?' dropped when the query is
    empty). Non-URL rows → NULL.

    Sorting query params uses split → sort_array → array_join — still
    pure codegen. Two crawls of ``http://X/a?b=1&c=2`` and
    ``HTTP://x:80/a?c=2&b=1#frag`` normalize identically.
    """
    parsed = parse_urls(df, url_col, prefix="__nu_")
    scheme, host = F.col("__nu_scheme"), F.col("__nu_host")
    port, path, query = F.col("__nu_port"), F.col("__nu_path"), F.col("__nu_query")
    default_port = ((scheme == "http") & (port == 80)) | (
        (scheme == "https") & (port == 443)
    )
    port_part = F.when(
        port.isNotNull() & ~default_port, F.concat(F.lit(":"), port.cast("string"))
    ).otherwise(F.lit(""))
    path_part = F.coalesce(path, F.lit("/"))
    sorted_q = F.array_join(
        F.sort_array(F.split(query, "&")), "&"
    )
    query_part = F.when(
        query.isNotNull() & (query != ""), F.concat(F.lit("?"), sorted_q)
    ).otherwise(F.lit(""))
    norm = F.when(
        scheme.isNotNull() & host.isNotNull() & (host != ""),
        F.concat(scheme, F.lit("://"), host, port_part, path_part, query_part),
    )
    return parsed.withColumn(out_col, norm).drop(
        "__nu_scheme", "__nu_host", "__nu_port", "__nu_path", "__nu_query"
    )


def registrable_domain(
    host: Column, multi_suffixes=DEFAULT_MULTI_SUFFIXES
) -> Column:
    """host → registrable domain: the public suffix plus one label
    ("news.example.co.uk" → "example.co.uk", "a.b.example.com" →
    "example.com"). Longest-match over ``multi_suffixes`` (see module
    docstring), else the last two labels. NULL for hosts with no dot,
    IP literals, and IPv6 brackets — capping by a raw IP is the
    caller's policy call, not a domain."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, -2, 2), ".")
    last3 = F.array_join(F.slice(labels, -3, 3), ".")
    last4 = F.array_join(F.slice(labels, -4, 4), ".")
    # suffix set as a literal array once; membership via array_contains
    sfx = F.array(*[F.lit(s) for s in multi_suffixes])
    is_ip = host.rlike(r"^\d+\.\d+\.\d+\.\d+$") | host.startswith("[")
    return (
        F.when(host.isNull() | is_ip | (n < 2), F.lit(None))
        # host IS a multi-part suffix (e.g. "co.uk") → no registrable domain
        .when(F.array_contains(sfx, host), F.lit(None))
        .when((n >= 4) & F.array_contains(sfx, last3), last4)
        .when((n >= 3) & F.array_contains(sfx, last2), last3)
        .otherwise(last2)
    )


def with_domain(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "domain",
    multi_suffixes=DEFAULT_MULTI_SUFFIXES,
) -> DataFrame:
    """Add the registrable-domain column for ``url_col``."""
    parsed = parse_urls(df, url_col, prefix="__wd_")
    out = parsed.withColumn(
        out_col, registrable_domain(F.col("__wd_host"), multi_suffixes)
    )
    return out.drop("__wd_scheme", "__wd_host", "__wd_port", "__wd_path", "__wd_query")


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the min-id row per normalized URL (re-crawl removal — the
    cheapest dedup pass, run before any text-based one). Rows whose URL
    does not parse are KEPT (no URL evidence of duplication).

    ONE pass: skew.topk_per_key(k=1) over the canonical URL, with
    unparseable rows given a unique ``\\x00``-prefixed key (cannot
    collide with a real URL, whose canonical form starts with a scheme
    letter) so they all survive without forming a hot NULL window
    partition. The first cut was groupBy(min id) + self-semi-join —
    correct, but the self-join shape re-evaluated the regex-heavy
    normalize tree three times with no exchange reuse: 87 s for 15 M
    URLs vs 11 s for this plan (measured, SCALE.md r6). topk_per_key
    also means a billion re-crawls of ONE url cannot pin a task."""
    from xdump_spark.operators.skew import topk_per_key

    normed = normalize_urls(df, url_col, out_col="__ud_norm")
    part = F.coalesce(
        F.col("__ud_norm"),
        F.concat(F.lit("\x00"), F.col(id_col).cast("string")),
    )
    kept = topk_per_key(
        normed.withColumn("__ud_part", part), "__ud_part",
        [F.asc(id_col)], k=1,
    )
    return kept.drop("rn", "__ud_part", "__ud_norm")


def domain_cap(
    df: DataFrame,
    cap: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    multi_suffixes=DEFAULT_MULTI_SUFFIXES,
    salt_partitions: int = 64,
) -> DataFrame:
    """Keep at most ``cap`` docs per registrable domain, deterministic
    hash order — curation.source_cap's two-phase salted top-k over the
    derived domain column, so one mega-host (the Zipf head of every
    crawl) cannot pin a task. Docs with no registrable domain (bad
    URLs, IPs) form their own NULL group and are capped together —
    at crawl scale that group is exactly the spam you want bounded."""
    from xdump_spark.operators.curation import source_cap

    with_dom = with_domain(df, url_col, out_col="__dc_domain",
                           multi_suffixes=multi_suffixes)
    return source_cap(
        with_dom, cap, part_col="__dc_domain", id_col=id_col,
        salt_partitions=salt_partitions,
    ).drop("__dc_domain")
