"""Unigram-LM subword tokenizer (SentencePiece-style), the EM sibling of
operators/bpe.py.

Implements the unigram language-model tokenizer of Kudo 2018
("Subword Regularization", arXiv:1804.10959, the algorithm behind
SentencePiece's default model): a vocabulary of pieces with
log-probabilities, trained by EM over all segmentations and pruned by
loss contribution; encoding is the Viterbi-best segmentation.

Scale discipline (same contract as bpe_train / build_vocab / fit_*):

* The corpus-side work is ONE map-side-combined word-frequency groupBy
  bounded by ``orderBy(desc n).limit(max_words)`` (TakeOrderedAndProject
  — never a global window over the unbounded word table). The Zipf head
  carries virtually all piece mass; this is the standard approximation.
* EM + pruning run on the DRIVER over that bounded table — fit cost is
  independent of corpus size, like every learned fit in this repo.
* Everything is deterministic: seed-piece selection, EM, pruning, and
  tie-breaks are all (count, lexical) ordered; refits are bit-identical.
* Distributed encode (``unigram_encode_frame``) broadcasts the piece
  table and runs Viterbi in ONE Arrow-batched pass with a closure-level
  per-worker word memo — zero shuffles, corpus stays narrow.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import pandas as pd  # module-level: pandas_udf resolves type hints via module globals

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNK_ID = 0
# Per-worker encode-memo bound (same rationale as bpe.ENCODE_MEMO_CAP).
ENCODE_MEMO_CAP = 1_000_000
_UNK_PENALTY = 20.0  # logprob charged per unknown character


@dataclass(frozen=True)
class UnigramTokenizer:
    """pieces: tuple of (piece, logprob), id order = tuple order + 1
    (id 0 = <unk>). With ``byte_fallback`` ids 1..256 are reserved for
    ``bpe.BYTE_TOKENS`` and pieces start at 257; ``pretok`` follows the
    same modes as :class:`bpe.BPETokenizer` (``"whitespace"`` |
    ``"gpt2"``)."""

    pieces: tuple
    pretok: str = "whitespace"
    byte_fallback: bool = False

    def piece_logprobs(self) -> dict:
        return {p: lp for p, lp in self.pieces}

    def vocab_map(self) -> dict:
        off = 257 if self.byte_fallback else 1
        return {p: i + off for i, (p, _) in enumerate(self.pieces)}

    def to_dict(self) -> dict:
        return {
            "pieces": [[p, lp] for p, lp in self.pieces],
            "pretok": self.pretok,
            "byte_fallback": self.byte_fallback,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "UnigramTokenizer":
        return cls(
            pieces=tuple((p, float(lp)) for p, lp in d["pieces"]),
            pretok=d.get("pretok", "whitespace"),
            byte_fallback=bool(d.get("byte_fallback", False)),
        )


# ------------------------------------------------------------ lattice ------
def _viterbi(word: str, logp: dict, max_len: int) -> tuple[list[str], float]:
    """Best segmentation of ``word`` under piece log-probs. Unknown
    single characters are allowed at a fixed penalty so encoding is
    total. Ties break toward FEWER pieces, then lexicographically
    earlier piece at each boundary (deterministic)."""
    n = len(word)
    # best[i] = (score, n_pieces, pieces tuple) for word[:i]
    best: list = [None] * (n + 1)
    best[0] = (0.0, 0, ())
    for i in range(1, n + 1):
        cand = None
        for j in range(max(0, i - max_len), i):
            if best[j] is None:
                continue
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j != 1:
                    continue
                lp = -_UNK_PENALTY
            sc = best[j][0] + lp
            state = (sc, best[j][1] + 1, best[j][2] + (piece,))
            if (
                cand is None
                or sc > cand[0]
                or (sc == cand[0] and state[1] < cand[1])
                or (sc == cand[0] and state[1] == cand[1] and piece < cand[2][-1])
            ):
                cand = state
        best[i] = cand
    assert best[n] is not None
    return list(best[n][2]), best[n][0]


def _forward_backward(word: str, logp: dict, max_len: int) -> tuple[dict, float]:
    """Expected piece counts over ALL segmentations of ``word`` (E-step)
    and the word's total log-likelihood, via log-domain forward/backward
    over the segmentation lattice."""
    n = len(word)
    NEG = float("-inf")

    def ladd(a: float, b: float) -> float:
        if a == NEG:
            return b
        if b == NEG:
            return a
        m = a if a > b else b
        return m + math.log1p(math.exp(-abs(a - b)))

    edges = []  # (j, i, piece, lp)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j != 1:
                    continue
                lp = -_UNK_PENALTY
            edges.append((j, i, piece, lp))
    fwd = [NEG] * (n + 1)
    fwd[0] = 0.0
    for j, i, _, lp in edges:  # edges are sorted by i then j: forward ok
        if fwd[j] != NEG:
            fwd[i] = ladd(fwd[i], fwd[j] + lp)
    bwd = [NEG] * (n + 1)
    bwd[n] = 0.0
    for j, i, _, lp in reversed(edges):
        if bwd[i] != NEG:
            bwd[j] = ladd(bwd[j], lp + bwd[i])
    total = fwd[n]
    counts: dict = {}
    if total == NEG:
        return counts, NEG
    for j, i, piece, lp in edges:
        if fwd[j] == NEG or bwd[i] == NEG:
            continue
        post = math.exp(fwd[j] + lp + bwd[i] - total)
        if post > 0.0:
            counts[piece] = counts.get(piece, 0.0) + post
    return counts, total


# ------------------------------------------------------------- training ----
def unigram_train(
    corpus: DataFrame,
    vocab_size: int = 8192,
    text_col: str = "text",
    max_words: int = 100_000,
    min_count: int = 1,
    max_piece_len: int = 8,
    seed_factor: int = 4,
    em_iters: int = 4,
    prune_frac: float = 0.25,
    pretok: str = "whitespace",
    byte_fallback: bool = False,
) -> UnigramTokenizer:
    """Train the unigram LM on the corpus's bounded word-frequency table.

    Pipeline (all deterministic): seed vocabulary = every substring of
    the frequent words up to ``max_piece_len`` scored by count·len, top
    ``seed_factor·vocab_size`` (single characters always kept) → EM
    (``em_iters`` rounds of forward-backward expected counts) →
    iterative pruning by loss contribution in ``prune_frac`` steps with
    an EM round after each, down to ``vocab_size``.

    ``pretok="gpt2"`` fits over case-preserving ``BPE_SPLIT_PATTERN``
    pre-tokens (the unsegmented-script mode — see ``bpe.bpe_train``);
    ``byte_fallback=True`` (gpt2 only) makes encode total by
    decomposing unknown characters into UTF-8 byte tokens."""
    from xdump_spark.operators.bpe import _check_mode
    from xdump_spark.operators.text import bpe_tokens, tokens

    _check_mode(pretok, byte_fallback)
    tok_expr = (
        tokens(F.col(text_col)) if pretok == "whitespace"
        else bpe_tokens(F.col(text_col))
    )
    rows = (
        corpus.select(F.explode(tok_expr).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
        .orderBy(F.desc("n"), "word")
        .limit(max_words)
        .collect()
    )
    if not rows:
        raise ValueError("cannot train a unigram tokenizer on an empty corpus")
    words = [(r["word"], int(r["n"])) for r in rows]

    # ---- seed: substring counts (count·len scoring, chars protected)
    sub_score: dict = {}
    chars: set = set()
    for w, n in words:
        chars.update(w)
        for ln in range(1, min(max_piece_len, len(w)) + 1):
            for s in range(len(w) - ln + 1):
                piece = w[s : s + ln]
                sub_score[piece] = sub_score.get(piece, 0.0) + n * ln
    seed_n = max(vocab_size * seed_factor, len(chars))
    ranked = sorted(sub_score.items(), key=lambda kv: (-kv[1], kv[0]))
    pieces = {p for p, _ in ranked[:seed_n]} | chars
    # uniform-ish init from substring scores
    tot = sum(sub_score[p] for p in pieces)
    logp = {p: math.log(sub_score[p] / tot) for p in pieces}

    def em_round(cur: dict) -> tuple[dict, float]:
        exp: dict = {}
        ll = 0.0
        for w, n in words:
            c, wll = _forward_backward(w, cur, max_piece_len)
            ll += n * wll
            for p, v in c.items():
                if p in cur:  # unk char edges don't re-enter the vocab
                    exp[p] = exp.get(p, 0.0) + n * v
        total = sum(exp.values())
        log_total = math.log(total)
        new: dict = {}
        for p in cur:
            e = exp.get(p, 0.0)
            if e > 0.0:
                # log-space ratio: e/total can underflow to 0.0 for
                # near-dead pieces while log(e) is still finite
                new[p] = math.log(e) - log_total
            elif len(p) == 1:
                # protect characters so encoding stays total
                new[p] = -50.0
            # multi-char pieces with zero expected count drop out
        return new, ll

    for _ in range(em_iters):
        logp, _ = em_round(logp)

    # ---- prune to vocab_size by loss contribution
    while len(logp) > vocab_size:
        # contribution of piece p ≈ expected count · logprob gap when
        # removed; the standard cheap proxy is the expected count itself
        exp: dict = {p: 0.0 for p in logp}
        for w, n in words:
            c, _ = _forward_backward(w, logp, max_piece_len)
            for p, v in c.items():
                if p in exp:
                    exp[p] += n * v
        removable = sorted(
            (p for p in logp if len(p) > 1),
            key=lambda p: (exp[p], p),
        )
        n_drop = min(
            max(1, int(len(logp) * prune_frac)), len(logp) - vocab_size, len(removable)
        )
        if n_drop <= 0:
            break
        for p in removable[:n_drop]:
            del logp[p]
        logp, _ = em_round(logp)

    ordered = sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))
    return UnigramTokenizer(
        pieces=tuple((p, round(lp, 10)) for p, lp in ordered),
        pretok=pretok, byte_fallback=byte_fallback,
    )


# -------------------------------------------------------------- encode -----
def _piece_ids(vmap: dict, p: str, byte_fallback: bool) -> list[int]:
    got = vmap.get(p)
    if got is not None:
        return [got]
    if byte_fallback:
        return [b + 1 for b in p.encode("utf-8")]  # byte ids are 1..256
    return [UNK_ID]


def unigram_encode(text: str, tok: UnigramTokenizer) -> list[int]:
    """Pure-Python reference encode: Viterbi-best pieces per pre-token
    (the distributed frame encode must agree exactly). Pre-tokenization
    follows ``tok.pretok``; with ``byte_fallback`` unknown characters
    emit UTF-8 byte tokens, so encode is total."""
    from xdump_spark.operators.bpe import _pretokens_py

    logp = tok.piece_logprobs()
    vmap = tok.vocab_map()
    max_len = max((len(p) for p in logp), default=1)
    out: list[int] = []
    for w in _pretokens_py(text, tok.pretok):
        for p in _viterbi(w, logp, max_len)[0]:
            out.extend(_piece_ids(vmap, p, tok.byte_fallback))
    return out


def unigram_decode(ids: list[int], tok: UnigramTokenizer) -> str:
    off = 257 if tok.byte_fallback else 1
    rev = {i + off: p for i, (p, _) in enumerate(tok.pieces)}
    if not tok.byte_fallback:
        return "".join(rev.get(i, "�") for i in ids)
    parts: list[str] = []
    buf = bytearray()
    for i in ids:
        if 1 <= i <= 256:
            buf.append(i - 1)
            continue
        if buf:
            parts.append(buf.decode("utf-8", errors="replace"))
            buf = bytearray()
        parts.append(rev.get(i, "�"))
    if buf:
        parts.append(buf.decode("utf-8", errors="replace"))
    return "".join(parts)


def unigram_encode_frame(
    df: DataFrame,
    tok: UnigramTokenizer,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, ids array<int>, n_pieces, n_oov): order-preserving Viterbi
    encode — broadcast piece table, one Arrow-batched narrow pass, zero
    shuffles, closure-level per-worker word memo (same contracts as
    bpe_encode_frame)."""
    from xdump_spark.operators.bpe import _pretokens_py

    sc = df.sparkSession.sparkContext
    b_logp = sc.broadcast(tok.piece_logprobs())
    b_vmap = sc.broadcast(tok.vocab_map())
    max_len = max((len(p) for p, _ in tok.pieces), default=1)
    pretok, byte_fb = tok.pretok, tok.byte_fallback
    cache: dict = {}  # deserialized once per worker, shared across batches

    @F.pandas_udf("array<int>")
    def encode(texts: pd.Series) -> pd.Series:
        logp, vmap = b_logp.value, b_vmap.value

        def word_ids(wd: str) -> list:
            got = cache.get(wd)
            if got is None:
                got = [
                    i
                    for p in _viterbi(wd, logp, max_len)[0]
                    for i in _piece_ids(vmap, p, byte_fb)
                ]
                if len(cache) < ENCODE_MEMO_CAP:
                    cache[wd] = got
            return got

        def enc(t):
            # null/empty only — see bpe_encode_frame: a str.strip()
            # guard would diverge from the reference on NBSP-only text
            if not t:
                return []
            out: list = []
            for wd in _pretokens_py(t, pretok):
                out.extend(word_ids(wd))
            return out

        return texts.map(enc)

    out = df.select(F.col(id_col), encode(F.col(text_col)).alias("ids"))
    return out.select(
        id_col,
        "ids",
        F.size("ids").alias("n_pieces"),
        F.size(F.filter("ids", lambda i: i == F.lit(UNK_ID))).alias("n_oov"),
    )
