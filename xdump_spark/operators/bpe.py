"""Trained byte-pair-encoding tokenizer: subword ids for training shards.

Sennrich et al. 2016 ("Neural Machine Translation of Rare Words with
Subword Units"): learn a ranked list of symbol-pair merges from word
frequencies, then encode any word by applying the merges in rank order.
This upgrades the toolkit's word-level ``build_vocab``/``tokenize_frame``
path to the subword granularity real LLM pipelines tokenize at — no OOV
explosion on rare words, vocabulary size chosen up front.

Division of labor at 100 TB (the same fit/score split as the classifier,
surprisal models and PQ codebook):

* TRAIN: merges are learned from the WORD-FREQUENCY TABLE, not the
  corpus — one map-side-combined groupBy gets (word, count), the top
  ``max_words`` rows come to the driver (bounded: frequency-ranked,
  deterministic tie-break), and the classic incremental pair-statistics
  merge loop runs in pure Python. The corpus never moves.
* ENCODE: the merge table is a broadcast dict; encoding is one
  Arrow-batched pandas_udf pass with a per-executor word cache (word →
  subword ids memoized — Zipf means the cache hits almost always).
  Zero shuffles, order-preserving, same plan shape as tokenize_frame.

Determinism: merge selection breaks count ties by the pair's lexical
order (subword-nmt leaves this to dict order); id assignment is sorted.
Two fits of the same table are bit-identical, any cluster, any run.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: end-of-word marker appended to each word's last symbol (subword-nmt
#: convention — lets "est</w>" in "lowest" differ from "est" in "estimate")
EOW = "</w>"
UNK_ID = 0
# Per-worker encode-memo bound: the Zipf head fits comfortably under 1M
# entries and absorbs nearly all lookups; the unbounded tail must not
# accumulate in a long-lived Python worker.
ENCODE_MEMO_CAP = 1_000_000


#: byte-fallback tokens <0x00>..<0xFF> (SentencePiece convention): always
#: ids 1..256 when ``byte_fallback`` is on, so any UTF-8 byte encodes.
BYTE_TOKENS = tuple(f"<0x{b:02X}>" for b in range(256))


@dataclass(frozen=True)
class BPETokenizer:
    """A trained merge table + vocabulary. Plain data (JSON round-trip).

    ``pretok`` names the pre-tokenizer the table was trained under and
    the encode paths must reuse: ``"whitespace"`` (lowercased whitespace
    words + ``</w>``, the original mode) or ``"gpt2"`` (case-preserving
    ``text.BPE_SPLIT_PATTERN`` pre-tokens with their leading space kept
    as part of the token — no end-of-word marker; decode is plain
    concatenation). ``byte_fallback`` (gpt2 mode only) reserves ids
    1..256 for ``BYTE_TOKENS`` and decomposes unknown characters into
    UTF-8 bytes at encode time, making encode TOTAL — required for
    unsegmented scripts where held-out text always contains unseen
    characters."""

    merges: tuple  # ((left, right), ...) in application order
    vocab: tuple   # ((token, id), ...); id 0 reserved for <unk>
    pretok: str = "whitespace"
    byte_fallback: bool = False

    def merge_ranks(self) -> dict:
        return {pair: i for i, pair in enumerate(self.merges)}

    def vocab_map(self) -> dict:
        return dict(self.vocab)

    def to_dict(self) -> dict:
        return {
            "merges": [list(p) for p in self.merges],
            "vocab": [[t, i] for t, i in self.vocab],
            "pretok": self.pretok,
            "byte_fallback": self.byte_fallback,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "BPETokenizer":
        return cls(
            merges=tuple((a, b) for a, b in d["merges"]),
            vocab=tuple((t, int(i)) for t, i in d["vocab"]),
            pretok=d.get("pretok", "whitespace"),
            byte_fallback=bool(d.get("byte_fallback", False)),
        )


def _word_symbols(word: str, eow: bool = True) -> tuple:
    if not eow:
        return tuple(word)
    return tuple(word[:-1]) + (word[-1] + EOW,)


def _check_mode(pretok: str, byte_fallback: bool) -> None:
    if pretok not in ("whitespace", "gpt2"):
        raise ValueError(f"pretok must be whitespace|gpt2, got {pretok!r}")
    if byte_fallback and pretok != "gpt2":
        raise ValueError(
            "byte_fallback requires pretok='gpt2' (the </w> marker of "
            "whitespace mode has no byte decomposition)"
        )


def _pretokens_py(text: str, pretok: str) -> list[str]:
    """The Python-side pre-token stream both encode paths share."""
    if pretok == "whitespace":
        return text.strip().lower().split()
    from xdump_spark.operators.text import gpt2_pretokens

    return gpt2_pretokens(text)


def _apply_merges(word: str, ranks: dict, eow: bool = True) -> list[str]:
    """Encode one word: repeatedly merge the best-ranked adjacent pair.
    The loop is O(len² · log) worst case but words are short; callers
    memoize per word (Zipf)."""
    syms = list(_word_symbols(word, eow))
    while len(syms) > 1:
        best, best_rank = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        syms[best : best + 2] = [syms[best] + syms[best + 1]]
    return syms


def bpe_train(
    corpus: DataFrame,
    vocab_size: int = 8192,
    text_col: str = "text",
    max_words: int = 100_000,
    min_count: int = 1,
    pretok: str = "whitespace",
    byte_fallback: bool = False,
) -> BPETokenizer:
    """Learn the merge table from the corpus's word-frequency table.

    ``vocab_size`` bounds |base symbols| + |merges| + 1 (<unk>); training
    stops early when no pair repeats. ``max_words`` caps the driver-side
    table (top by frequency, ties by word — the head of the Zipf curve
    carries virtually all pair mass, the standard approximation).

    ``pretok="gpt2"`` trains over ``text.BPE_SPLIT_PATTERN`` pre-tokens
    instead of lowercased whitespace words: case-preserving, leading
    space kept as a symbol, no ``</w>``. This is the mode for
    multilingual/unsegmented-script corpora — whitespace "words" in
    Chinese/Japanese/Thai are entire clauses, so the frequency head is
    all-unique and merges memorize clauses; gpt2 pre-tokens at least
    split scripts, digits, and punctuation and let merges learn reusable
    character n-grams. Combine with ``byte_fallback=True`` so unseen
    characters encode as UTF-8 ``BYTE_TOKENS`` (encode total, zero OOV,
    exact round-trip decode). A merged token could in principle collide
    with a ``<0xNN>`` literal; byte ids are reserved FIRST (1..256) so
    bytes always decode, the SentencePiece posture.
    """
    from xdump_spark.operators.text import bpe_tokens, tokens

    _check_mode(pretok, byte_fallback)
    eow = pretok == "whitespace"
    tok_expr = (
        tokens(F.col(text_col)) if eow else bpe_tokens(F.col(text_col))
    )
    rows = (
        corpus.select(F.explode(tok_expr).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
        # top-N via sort+limit: Spark plans TakeOrderedAndProject — a
        # per-partition top-N then a merge of N-row heads. A row_number
        # window here would drag the ENTIRE word table through one
        # partition at 100 TB.
        .orderBy(F.desc("n"), "word")
        .limit(max_words)
        .collect()
    )
    if not rows:
        raise ValueError("cannot train BPE on an empty corpus")
    words = {
        r["word"]: (list(_word_symbols(r["word"], eow)), int(r["n"]))
        for r in rows
    }

    # incremental pair statistics: pair -> total count, pair -> {word set}
    pair_count: dict = {}
    pair_words: dict = {}

    def add_word_pairs(wd: str, sign: int) -> None:
        syms, n = words[wd]
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_count[p] = pair_count.get(p, 0) + sign * n
            if sign > 0:
                pair_words.setdefault(p, set()).add(wd)

    for wd in words:
        add_word_pairs(wd, +1)

    base = sorted({s for syms, _ in words.values() for s in syms})
    n_merges = max(0, vocab_size - len(base) - 1)
    merges: list = []
    # lazy-invalidation max-heap: a linear best-pair scan per merge is
    # O(n_merges × |pairs|) — minutes at an 8k vocab over 100k words.
    # Heap order (-count, pair) also encodes the deterministic tie-break
    # (equal counts → lexicographically smallest pair).
    import heapq

    heap = [(-c, p) for p, c in pair_count.items() if c > 0]
    heapq.heapify(heap)

    def push(p) -> None:
        c = pair_count.get(p, 0)
        if c > 0:
            heapq.heappush(heap, (-c, p))

    for _ in range(n_merges):
        best = None
        while heap:
            negc, p = heapq.heappop(heap)
            if pair_count.get(p, 0) == -negc:  # else stale entry
                best = p
                break
        if best is None or pair_count[best] < 2:
            break  # nothing repeats — further merges memorize noise
        merges.append(best)
        merged = best[0] + best[1]
        touched: set = set()
        for wd in list(pair_words.get(best, ())):
            syms, n = words[wd]
            if best[0] not in syms:  # stale entry after earlier rewrites
                continue
            for i in range(len(syms) - 1):
                touched.add((syms[i], syms[i + 1]))
            add_word_pairs(wd, -1)
            i, out = 0, []
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wd] = (out, n)
            add_word_pairs(wd, +1)
            for i in range(len(out) - 1):
                touched.add((out[i], out[i + 1]))
        pair_count.pop(best, None)
        pair_words.pop(best, None)
        touched.discard(best)
        for p in touched:
            push(p)  # refresh heap entries for every count we changed

    toks = sorted(set(base) | {a + b for a, b in merges})
    if byte_fallback:
        # bytes own ids 1..256; learned tokens follow (0 = <unk>, unused
        # in practice — encode is total)
        bset = set(BYTE_TOKENS)
        vocab = tuple((t, i + 1) for i, t in enumerate(BYTE_TOKENS)) + tuple(
            (t, i + 257) for i, t in enumerate(t for t in toks if t not in bset)
        )
    else:
        vocab = tuple((t, i + 1) for i, t in enumerate(toks))  # 0 = <unk>
    return BPETokenizer(
        merges=tuple(merges), vocab=vocab, pretok=pretok,
        byte_fallback=byte_fallback,
    )


def _sym_ids(vmap: dict, s: str, byte_fallback: bool) -> list[int]:
    got = vmap.get(s)
    if got is not None:
        return [got]
    if byte_fallback:
        return [b + 1 for b in s.encode("utf-8")]  # byte ids are 1..256
    return [UNK_ID]


def bpe_encode(text: str, tok: BPETokenizer) -> list[int]:
    """Pure-Python single-string encode (the reference for tests and
    driver-side uses); pre-tokenization follows ``tok.pretok`` —
    lowercase whitespace words, or the gpt2 pre-token scanner."""
    ranks = tok.merge_ranks()
    vmap = tok.vocab_map()
    eow = tok.pretok == "whitespace"
    out: list[int] = []
    for word in _pretokens_py(text, tok.pretok):
        for s in _apply_merges(word, ranks, eow):
            out.extend(_sym_ids(vmap, s, tok.byte_fallback))
    return out


def bpe_decode(ids: list[int], tok: BPETokenizer) -> str:
    rev = {i: t for t, i in tok.vocab}
    if tok.pretok == "whitespace":
        return "".join(rev.get(i, "�") for i in ids).replace(EOW, " ").strip()
    # gpt2 mode: plain concatenation; byte-token runs decode as UTF-8
    byte_ids = set(range(1, 257)) if tok.byte_fallback else set()
    parts: list[str] = []
    buf = bytearray()
    for i in ids:
        if i in byte_ids:
            buf.append(i - 1)
            continue
        if buf:
            parts.append(buf.decode("utf-8", errors="replace"))
            buf = bytearray()
        parts.append(rev.get(i, "�"))
    if buf:
        parts.append(buf.decode("utf-8", errors="replace"))
    return "".join(parts)


def bpe_encode_frame(
    df: DataFrame,
    tok: BPETokenizer,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, ids array<int>, n_bpe_tokens, n_oov): order-preserving
    subword encode. Same shape/contract as tokenize_frame — broadcast
    merge table, one Arrow-batched narrow pass, zero shuffles — plus a
    per-worker word→ids memo (Zipf: the cache absorbs almost every
    lookup, so the merge loop runs once per DISTINCT word per Python
    worker process, not once per occurrence). The memo lives at closure
    level, OUTSIDE the udf body, so it survives across Arrow batches
    within one worker — a dict created inside the body would be rebuilt
    per batch and never amortize anything. The memo is size-capped
    (ENCODE_MEMO_CAP): distinct-word count is unbounded at corpus scale
    (the Zipf TAIL dominates distinct counts), so an uncapped dict in a
    long-lived worker grows without limit; past the cap we stop
    inserting — the Zipf HEAD, which absorbs nearly all lookups, is
    already resident."""
    sc = df.sparkSession.sparkContext
    b_ranks = sc.broadcast(tok.merge_ranks())
    b_vmap = sc.broadcast(tok.vocab_map())
    pretok, byte_fb = tok.pretok, tok.byte_fallback
    eow = pretok == "whitespace"
    cache: dict = {}  # deserialized once per worker, shared across batches

    @F.pandas_udf("array<int>")
    def encode(texts: pd.Series) -> pd.Series:
        ranks, vmap = b_ranks.value, b_vmap.value

        def word_ids(wd: str) -> list[int]:
            got = cache.get(wd)
            if got is None:
                got = [
                    i
                    for s in _apply_merges(wd, ranks, eow)
                    for i in _sym_ids(vmap, s, byte_fb)
                ]
                if len(cache) < ENCODE_MEMO_CAP:
                    cache[wd] = got
            return got

        def enc(t):
            # null/empty only — anything else goes through the SAME
            # pre-tokenizer as the reference (a str.strip() guard here
            # would drop NBSP-only texts the gpt2 scanner tokenizes,
            # breaking frame == reference parity)
            if not t:
                return []
            out: list[int] = []
            for wd in _pretokens_py(t, pretok):
                out.extend(word_ids(wd))
            return out

        return texts.map(enc)

    out = df.select(F.col(id_col), encode(F.col(text_col)).alias("ids"))
    return out.select(
        id_col,
        "ids",
        F.size("ids").alias("n_bpe_tokens"),
        F.size(F.filter("ids", lambda i: i == F.lit(UNK_ID))).alias("n_oov"),
    )


def bpe_training_shards(
    df: DataFrame,
    tok: BPETokenizer,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(seq_id, input_ids array<int>, n_docs, n_tokens) — training shards
    in SUBWORD units: the curation.training_shards terminal stage with
    the trained BPE encoder in place of the word-level vocabulary.
    Packing runs on ``n_bpe_tokens`` (the budget bounds what the model
    actually sees, not whitespace word counts), and ``n_tokens`` ==
    ``len(input_ids)`` exactly because the same encode fills the packs.

    Scale shape is identical to training_shards: one narrow Arrow encode
    pass, one bucket groupBy to pack, one doc_id equi-join + seq_id
    groupBy to assemble — per-sequence state bounded by the budget.
    """
    from xdump_spark.operators.curation import pack_sequences

    # leaf-column source guards the Spark 4.1 pandas-UDF extraction bug
    # in join+aggregate shapes (see training_shards)
    src = df.select(F.col(id_col), F.col(text_col)).localCheckpoint(eager=True)
    enc = bpe_encode_frame(src, tok, text_col=text_col, id_col=id_col)
    enc = enc.localCheckpoint(eager=True)  # two consumers: counts + join
    counts = enc.select(F.col(id_col), F.col("n_bpe_tokens").alias("n_tok"))
    packs = pack_sequences(src, budget, text_col=text_col, id_col=id_col, counts=counts)
    slots = packs.select(
        "seq_id", "n_docs", F.posexplode("doc_ids").alias("slot", "_doc")
    )
    ids = enc.select(F.col(id_col).alias("_doc"), "ids")
    return (
        slots.join(ids, "_doc")
        .groupBy("seq_id")
        .agg(
            F.first("n_docs").alias("n_docs"),
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("slot", "ids"))),
                    lambda x: x.ids,
                )
            ).alias("input_ids"),
        )
        .select(
            "seq_id",
            "input_ids",
            "n_docs",
            F.size("input_ids").cast("long").alias("n_tokens"),
        )
    )
