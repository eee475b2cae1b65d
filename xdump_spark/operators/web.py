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
``registrable_domain`` takes a rule collection (defaults to the ~40
highest-traffic multi-part suffixes) and applies FULL publicsuffix.org
semantics over it — normal, wildcard (``*.ck``) and exception
(``!www.ck``) rules, exception-prevails + longest-match (r7).
``load_psl``/``read_psl`` parse a real PSL snapshot into that
collection, so callers get full fidelity from the same pure-codegen
expression.
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


def _psl_partition(rules) -> tuple[dict, dict, dict]:
    """Split a PSL rule collection into {n_labels: [rule]} maps for
    normal / wildcard / exception rules. Single-label NORMAL rules are
    dropped: they are behaviorally identical to the PSL's implicit
    ``*`` fallback (public suffix = last label), so the expression
    stays small even when fed the full ~9k-rule list."""
    normal: dict[int, list] = {}
    wild: dict[int, list] = {}
    exc: dict[int, list] = {}
    for raw in rules:
        r = str(raw).strip().lower()
        if not r or r.startswith("//"):
            continue
        if r.startswith("!"):
            y = r[1:]
            exc.setdefault(y.count(".") + 1, []).append(y)
        elif r.startswith("*."):
            x = r[2:]
            wild.setdefault(x.count(".") + 1, []).append(x)
        elif "." in r:
            normal.setdefault(r.count(".") + 1, []).append(r)
    return normal, wild, exc


def registrable_domain(
    host: Column, multi_suffixes=DEFAULT_MULTI_SUFFIXES
) -> Column:
    """host → registrable domain: the public suffix plus one label
    ("news.example.co.uk" → "example.co.uk", "a.b.example.com" →
    "example.com"). NULL for hosts with no dot, IP literals, IPv6
    brackets — capping by a raw IP is the caller's policy call, not a
    domain — and for hosts that ARE a public suffix.

    Full publicsuffix.org rule semantics (r7): ``multi_suffixes`` may
    contain normal rules ("co.uk"), wildcard rules ("*.ck" — every
    label under ck is itself a public suffix) and exception rules
    ("!www.ck" — carved out of a wildcard; www.ck IS registrable). A
    matching exception prevails outright; otherwise the matching rule
    with the most labels wins; with no match the public suffix is the
    last label (the PSL's implicit ``*`` rule). Pass the real PSL via
    :func:`load_psl`/:func:`read_psl` for full fidelity — the defaults
    are the high-traffic multi-part tail only.

    Still one pure-codegen expression: the rule set is partitioned BY
    LABEL COUNT at build time, so matching is a fixed chain of
    ``isin`` lookups (Catalyst compiles large literal sets to hashed
    InSet) over the last-k label joins — no UDF, no shuffle, any
    corpus size."""
    normal, wild, exc = _psl_partition(multi_suffixes)
    labels = F.split(host, r"\.")
    n = F.size(labels)

    def lastk(k: int) -> Column:
        # slice(-k, k) on a shorter array yields [] -> "" -> no match
        return F.array_join(F.slice(labels, -k, k), ".")

    is_ip = host.rlike(r"^\d+\.\d+\.\d+\.\d+$") | host.startswith("[")

    # public-suffix LABEL COUNT, by PSL precedence
    ps = F.when(host.isNull() | is_ip | (n < 2), F.lit(None).cast("int"))
    for k in sorted(exc, reverse=True):  # exceptions prevail outright
        ps = ps.when((n >= k) & lastk(k).isin(exc[k]), F.lit(k - 1))
    # then the longest matching rule; a wildcard with a k-label base is
    # an (k+1)-label match
    cand = sorted({*normal} | {k + 1 for k in wild}, reverse=True)
    for l in cand:
        cond = F.lit(False)
        if l in normal:
            cond = cond | ((n >= l) & lastk(l).isin(normal[l]))
        if (l - 1) in wild:
            cond = cond | ((n >= l) & lastk(l - 1).isin(wild[l - 1]))
        ps = ps.when(cond, F.lit(l))
    ps_len = ps.otherwise(F.lit(1))  # implicit "*": last label

    reg_len = ps_len + F.lit(1)
    return F.when(
        n >= reg_len,
        F.array_join(
            F.slice(labels, -reg_len, reg_len.cast("int")), "."
        ),
    )


def load_psl(text: str, sections: str = "all") -> tuple:
    """Parse a Public Suffix List snapshot (the
    https://publicsuffix.org/list/public_suffix_list.dat format) into a
    rule tuple for :func:`registrable_domain`. Comments (``//``) and
    blank lines are dropped; rules keep their ``*.``/``!`` markers.
    ``sections``: ``"all"`` | ``"icann"`` | ``"private"`` (the file's
    ``===BEGIN/END ICANN|PRIVATE DOMAINS===`` markers — crawl curation
    usually wants ``"icann"``: the private section splits hosting
    platforms like github.io into per-user "publishers")."""
    if sections not in ("all", "icann", "private"):
        raise ValueError(f"sections must be all|icann|private, got {sections!r}")
    rules, current = [], None
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("//"):
            if "===BEGIN ICANN DOMAINS===" in line:
                current = "icann"
            elif "===BEGIN PRIVATE DOMAINS===" in line:
                current = "private"
            elif "===END" in line:
                current = None
            continue
        if not line:
            continue
        if sections == "all" or current == sections:
            rules.append(line.lower())
    return tuple(rules)


def read_psl(spark, path: str, sections: str = "all") -> tuple:
    """:func:`load_psl` over a PSL snapshot file at any
    Spark-readable path (local, ``hdfs://``, ``s3a://`` — Hadoop FS,
    not ``open()``, per the repo's driver-side IO policy)."""
    from xdump_spark import fsutil

    return load_psl(fsutil.read_text(spark, path), sections)


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
