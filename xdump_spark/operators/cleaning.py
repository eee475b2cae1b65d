"""Text cleaning for training corpora: PII redaction, normalization, and
reproducible corpus shuffling.

The standard pre-tokenization hygiene stages of an LLM data pipeline
(C4-style cleanup, Raffel et al. 2020 §2.2; PII scrubbing as in public
CC-pipeline implementations). Everything is JVM-side regex/array codegen
— no Python UDFs — so the hot path stays inside whole-stage codegen and
scales as a narrow per-row map with zero shuffles (the shuffle in
:func:`deterministic_shuffle` is the point of that operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, java_regex, replacement) applied IN ORDER — order is load-bearing:
# SSNs and cards are digit runs a greedy phone pattern would also match, so
# they redact first and the phone pass never sees them. Patterns favor
# precision over recall (a redactor that eats ordinary numbers corrupts the
# corpus); recall beyond these shapes is a model problem, not a regex one.
DEFAULT_PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"(?<!\d)\d{3}-\d{2}-\d{4}(?!\d)", "<SSN>"),
    ("card", r"(?<!\d)(?:\d{4}[ -]){3}\d{4}(?!\d)", "<CARD>"),
    (
        "ipv4",
        r"(?<!\d)(?:(?:25[0-5]|2[0-4]\d|1?\d?\d)\.){3}(?:25[0-5]|2[0-4]\d|1?\d?\d)(?!\d)",
        "<IP>",
    ),
    (
        "phone",
        r"(?<![\w.-])\+?\d{1,3}[ .-]\(?\d{2,4}\)?[ .-]\d{3,4}(?:[ .-]\d{2,4})?(?![\w.-])",
        "<PHONE>",
    ),
]


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """Replace PII-shaped substrings with typed placeholder tokens.

    Rewrites ``text_col`` in place and adds one ``n_<name>`` count column
    per pattern (how many redactions that category made — the per-doc
    audit trail a compliance review asks for). Counts are measured on the
    text as seen by that pattern (after earlier categories redacted), so
    a digit run is counted by exactly one category.

    Scale: a pure per-row projection — no shuffle, no UDF; ~5 compiled
    Java regexes per row is the entire cost.
    """
    pats = DEFAULT_PII_PATTERNS if patterns is None else patterns
    out = df.withColumn("_red", F.col(text_col))
    for name, pat, tok in pats:
        out = out.withColumn(f"n_{name}", F.regexp_count(F.col("_red"), F.lit(pat)))
        out = out.withColumn("_red", F.regexp_replace("_red", pat, tok))
    return out.withColumn(text_col, F.col("_red")).drop("_red")


def normalize_text(
    df: DataFrame, text_col: str = "text", lowercase: bool = False
) -> DataFrame:
    """Canonicalize whitespace and strip C0/C1 control characters.

    - control chars (except the whitespace the next step handles) -> removed
    - any whitespace run (space, tab, newline, NBSP et al.) -> one space
    - leading/trailing whitespace -> trimmed
    - optional lowercasing (off by default: case is signal for most
      downstream filters — langid, NER-ish heuristics)

    Idempotent: normalize(normalize(x)) == normalize(x). Unicode NFC/NFKC
    normalization is deliberately out of scope (no JVM-builtin Spark
    expression exists; a Pandas-UDF variant belongs next to the multimodal
    decode stubs if ever needed). Pure projection, zero shuffles.
    """
    t = F.col(text_col)
    t = F.regexp_replace(t, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F]", "")
    # \p{IsWhite_Space} is the Unicode property (catches NBSP U+00A0,
    # NNBSP U+202F, ideographic space...); Java's \s is ASCII-only.
    t = F.trim(F.regexp_replace(t, r"[\p{IsWhite_Space}]+", " "))
    if lowercase:
        t = F.lower(t)
    return df.withColumn(text_col, t)


_HTML_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # LAST: otherwise "&amp;lt;" would double-decode
]


def strip_markup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Remove HTML/XML tags and decode the common entities — the markup
    hygiene web-crawl text needs before any token-level stage.

    Deliberately NOT a parser: `<script>/<style>` elements lose their
    tags but keep their text (full DOM handling is an extraction concern
    upstream of this engine); comments and well-formed tags (including
    attributes spanning whitespace) are removed, stray ``<`` that never
    closes is left alone. Entities decode in fixed order with ``&amp;``
    last, so double-encoded text single-decodes (the C4 behavior).
    Pure projection, zero shuffles.
    """
    t = F.col(text_col)
    t = F.regexp_replace(t, r"<!--.*?-->", " ")  # comments (non-greedy, DOTALL off)
    t = F.regexp_replace(t, r"</?[A-Za-z][^>]*>", " ")
    for ent, rep in _HTML_ENTITIES:
        t = F.regexp_replace(t, ent, rep)
    return df.withColumn(text_col, t)


def c4_line_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 3,
    require_terminal_punct: bool = True,
    drop_markers: tuple[str, ...] = ("lorem ipsum", "javascript"),
) -> DataFrame:
    """C4-style line-level filtering (Raffel et al. 2020 §2.2): keep only
    lines with >= min_words words and (optionally) terminal punctuation;
    drop the whole document if any retained line carries a boilerplate
    marker. Adds ``n_lines_kept``/``n_lines_dropped``; documents whose
    every line fails are removed.

    Array codegen per row (split → filter → exists → concat) — zero
    shuffles, same deployment shape as the other cleaning stages.
    """
    lines = F.split(F.col(text_col), r"\n")
    n_words = lambda l: F.size(F.split(F.trim(l), r"\s+"))  # noqa: E731
    keep = lambda l: (  # noqa: E731
        (F.length(F.trim(l)) > 0)
        & (n_words(l) >= min_words)
        & (
            F.trim(l).rlike(r"[.!?\"']$")
            if require_terminal_punct
            else F.lit(True)
        )
    )
    kept = F.filter(lines, keep)

    def _has_marker(l):
        cond = F.lit(False)
        for m in drop_markers:
            cond = cond | F.lower(l).contains(m)
        return cond

    marker_hit = F.exists(kept, _has_marker) if drop_markers else F.lit(False)
    out = (
        df.withColumn("_kept", kept)
        .withColumn("n_lines_kept", F.size("_kept"))
        .withColumn("n_lines_dropped", F.size(lines) - F.size("_kept"))
        .filter((F.size("_kept") > 0) & ~marker_hit)
        .withColumn(text_col, F.concat_ws("\n", "_kept"))
        .drop("_kept")
    )
    return out


def dedup_lines(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Global exact LINE dedup (the C4 rule: a line occurring more than
    once in the corpus is kept once, at its first occurrence): every
    other occurrence is removed and documents are reassembled with their
    remaining lines in order. Docs left with zero lines drop. Adds
    ``n_lines_removed``.

    First occurrence = globally smallest (doc_id, line_idx) — the same
    deterministic min-owner convention as spans.strip_duplicated_spans.
    Whitespace-trimmed comparison; blank lines are ignored (neither
    deduped nor counted).

    Scale: lines explode narrow (doc_id, idx, xxhash64×2 of the trimmed
    line — text itself never shuffles); owner detection is one
    map-side-combinable groupBy on the hash; the only other exchange is
    the per-doc reassembly groupBy. Line text is re-sliced from the
    original document at rebuild, so hash collisions can only merge
    IDENTICAL-hash lines (128-bit pair, ~zero at any real scale).
    """
    lines_arr = F.split(F.col(text_col), r"\n")
    base = df.select(F.col(id_col).alias("_did"), lines_arr.alias("_lines"))
    hashed = F.transform(
        "_lines",
        lambda l: F.struct(
            F.xxhash64(F.lit(1), F.trim(l)).alias("h1"),
            F.xxhash64(F.lit(2), F.trim(l)).alias("h2"),
            (F.length(F.trim(l)) == 0).alias("blank"),
        ),
    )
    occ = (
        base.select("_did", F.posexplode(hashed).alias("idx", "h"))
        .select("_did", "idx", "h.h1", "h.h2", "h.blank")
        .filter(~F.col("blank"))
    )
    owners = occ.groupBy("h1", "h2").agg(F.min(F.struct("_did", "idx")).alias("own"))
    removable = (
        occ.join(owners, ["h1", "h2"])
        .filter(~((F.col("_did") == F.col("own._did")) & (F.col("idx") == F.col("own.idx"))))
        .groupBy("_did")
        .agg(F.collect_set("idx").alias("_cut"))
    )
    joined = df.join(
        removable, df[id_col] == removable["_did"], "left"
    )
    keep_idx = F.filter(
        F.sequence(F.lit(0), F.size(lines_arr) - F.lit(1)),
        lambda i: ~F.array_contains(F.coalesce(F.col("_cut"), F.array().cast("array<int>")), i),
    )
    rebuilt = F.concat_ws(
        "\n", F.transform(keep_idx, lambda i: F.element_at(lines_arr, i + F.lit(1)))
    )
    out_cols = [
        F.when(F.col("_cut").isNull(), F.col(text_col)).otherwise(rebuilt).alias(c)
        if c == text_col
        else F.col(c)
        for c in df.columns
    ]
    n_removed = F.coalesce(F.size("_cut"), F.lit(0)).alias("n_lines_removed")
    out = joined.select(*out_cols, n_removed)
    # drop docs with no non-whitespace text left (F.trim strips only
    # spaces — a doc of blank lines would survive as "\n" otherwise)
    return out.filter(
        F.length(F.regexp_replace(F.col(text_col), r"[\p{IsWhite_Space}]", "")) > 0
    )


def deterministic_shuffle(
    df: DataFrame,
    seed: int = 0,
    id_col: str = "doc_id",
    partitions: int | None = None,
) -> DataFrame:
    """Pseudo-random but REPRODUCIBLE global ordering for training runs.

    Orders by (xxhash64(seed, id), id): uniform over the hash space —
    statistically indistinguishable from a shuffle for consumption order —
    yet a pure function of (seed, ids), so re-runs, restarts, and
    different cluster sizes or input partitionings all produce the same
    total order (``rand()``-based shuffles guarantee none of that). The
    id tie-break makes the order total even across hash collisions.

    Cost: one range-partitioned sort (the unavoidable shuffle — a global
    order IS a range exchange). Range-boundary sampling only moves
    part-file cut points; the concatenated row order is unaffected. Pass
    ``partitions`` to pin the output file count for the corpus sink.
    """
    key = F.xxhash64(F.lit(seed), F.col(id_col))
    if partitions is not None:
        return df.repartitionByRange(partitions, key, F.col(id_col)).sortWithinPartitions(
            key, F.col(id_col)
        )
    return df.orderBy(key, F.col(id_col))


def blocklist_filter(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    mode: str = "token",
    case_sensitive: bool = False,
) -> DataFrame:
    """C4-style blocklist gate (Raffel et al. 2020 §2.2 drop any page
    containing a word from a banned-word list): the input frame plus
    ``n_blocklist_hits`` (distinct matched terms) and ``blocked``. The
    caller filters on ``~blocked``; keeping the count makes the gate
    auditable (the data-card number).

    * ``mode="token"``: a term matches as a whole whitespace token —
      ``array_intersect`` between the token array and the broadcast
      literal term array, pure codegen, O(tokens + terms) per row.
    * ``mode="substring"``: a term matches anywhere — one ``contains``
      per term, O(terms × len) per row; the C4 list semantics for
      multi-word phrases. Prefer ``token`` unless phrases are needed.

    Scale: zero shuffles, one narrow pass; the term list rides in the
    plan as a literal array (fine to ~10⁴ terms — beyond that, explode
    tokens and broadcast-join a terms table instead). ``blocked`` is
    pushdown-barrier-wrapped: a ``filter(~blocked)`` stays above the
    projection rather than re-inlining the token machinery per term
    (see sizing.pushdown_barrier).
    """
    from xdump_spark.operators.sizing import pushdown_barrier

    if mode not in ("token", "substring"):
        raise ValueError(f"mode must be 'token' or 'substring', got {mode!r}")
    if not terms:
        raise ValueError("empty blocklist")
    canon = sorted(set(terms)) if case_sensitive else sorted({t.lower() for t in terms})
    t = F.col(text_col) if case_sensitive else F.lower(F.col(text_col))
    arr = F.array(*[F.lit(x) for x in canon])
    if mode == "token":
        toks = F.split(F.trim(t), r"\s+")
        hits = F.size(F.array_intersect(F.array_distinct(toks), arr))
    else:
        hits = F.size(F.filter(arr, lambda term: t.contains(term)))
    return df.withColumn("n_blocklist_hits", hits).withColumn(
        "blocked", pushdown_barrier(F.col("n_blocklist_hits") > 0)
    )


def hash_split(
    df: DataFrame,
    fractions: dict[str, float],
    seed: int = 0,
    id_col: str = "doc_id",
) -> dict[str, DataFrame]:
    """Deterministic disjoint corpus split (train/val/test):
    ``fractions`` maps split name → fraction (must sum to 1). Assignment
    is a pure function of (seed, id) — ``pmod(xxhash64(seed, id), 10^6)``
    against cumulative cutoffs — so re-runs, restarts, cluster layouts,
    and DIFFERENT DOWNSTREAM FILTERS all agree on membership: a doc
    dropped from train by a later gate can never migrate into val
    (``randomSplit`` guarantees none of that — it resamples per
    execution and per partitioning). Pure codegen, zero shuffle, one
    filter per split over the same frame; splits are exactly disjoint
    and exhaustive by construction."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be non-negative")
    resolution = 1_000_000
    bucket = F.pmod(F.xxhash64(F.lit(seed), F.col(id_col)), F.lit(resolution))
    out: dict[str, DataFrame] = {}
    lo = 0
    names = list(fractions)
    for i, name in enumerate(names):
        # last split takes the remainder so rounding can't orphan buckets
        hi = resolution if i == len(names) - 1 else lo + int(
            round(fractions[name] * resolution)
        )
        out[name] = df.filter((bucket >= lo) & (bucket < hi))
        lo = hi
    return out
