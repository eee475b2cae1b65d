"""Quality classifier: sample-fit linear model, distributed codegen scoring.

The CCNet / GPT-3 / LLaMA-style quality-filter stage: a small linear
classifier is trained to separate reference text ("pages Wikipedia would
cite") from crawl noise, then applied to every document as a keep/drop
score. (The reference engine has no learned operators; this extends its
curation surface — cf. its seed-SQL row selection, xdump/base.py:87-106 —
with the standard learned selection step of LLM data pipelines.)

The 100 TB split this module enforces:

* FIT runs on a bounded, DETERMINISTIC sample collected to the driver —
  a linear model over ~8 scalar features saturates at thousands of rows,
  not terabytes, and the md5-bucket sample means a pipeline re-run
  refits the identical model (no rand(), no order dependence, zero-init
  full-batch gradient descent).
* SCORE is one narrow whole-stage-codegen projection — the trained
  weights become a literal arithmetic expression, so the corpus pass has
  no Python UDF, no shuffle, no state, and pushes column pruning to the
  scan. Plan shape is pinned in tests.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from xdump_spark.operators.text import LANG_MARKERS, punct_count, tokens

#: The standard feature set: quality_frame's surface signals plus
#: repetition_frame's Gopher-style repetition signals, in one projection.
QUALITY_FEATURES = (
    "n_chars",
    "n_tokens",
    "mean_token_len",
    "punct_ratio",
    "stopword_ratio",
    "ttr",
    "top_token_frac",
    "dup_bigram_frac",
)


def _raw_exprs(text_col: str) -> dict[str, Column]:
    """The expensive intermediates, pinned to real columns first: lambda
    bodies referencing a split(...) column re-evaluate it per element."""
    t = F.col(text_col)
    return {
        "_len": F.length(t).cast("long"),
        "_t": tokens(t),
        "_punct": punct_count(t).cast("long"),
        "_nsp": F.length(F.regexp_replace(F.trim(F.lower(t)), r"\s+", "")),
    }


def _bigrams_expr() -> Column:
    n = F.size("_t")
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(" ", F.element_at("_t", i), F.element_at("_t", i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _feature_exprs() -> dict[str, Column]:
    """QUALITY_FEATURES name → Column, referencing the pinned raw
    columns (_len/_t/_punct/_nsp/_bg). Single source of truth for both
    the standalone feature frame and the in-place scoring stage."""
    en = F.array(*[F.lit(w) for w in LANG_MARKERS["en"]])
    n = F.size("_t")
    distinct = F.array_distinct(F.col("_t"))
    n_dist = F.size(distinct)
    top_freq = F.array_max(
        F.transform(distinct, lambda x: F.size(F.filter(F.col("_t"), lambda y: y == x)))
    )
    return {
        "n_chars": F.col("_len").cast("double"),
        "n_tokens": n.cast("double"),
        "mean_token_len": F.round(
            F.when(n > 0, F.col("_nsp") / n).otherwise(F.lit(0.0)), 6
        ),
        "punct_ratio": F.round(
            F.when(F.col("_len") > 0, F.col("_punct") / F.col("_len")).otherwise(F.lit(0.0)),
            6,
        ),
        "stopword_ratio": F.round(
            F.when(
                n > 0,
                F.size(F.filter(F.col("_t"), lambda x: F.array_contains(en, x))) / n,
            ).otherwise(F.lit(0.0)),
            6,
        ),
        "ttr": F.round(F.when(n > 0, n_dist / n).otherwise(F.lit(0.0)), 6),
        "top_token_frac": F.round(F.when(n > 0, top_freq / n).otherwise(F.lit(0.0)), 6),
        "dup_bigram_frac": F.when(
            F.size("_bg") > 0,
            F.round(1 - F.size(F.array_distinct("_bg")) / F.size("_bg"), 6),
        ).otherwise(F.lit(0.0)),
    }


def quality_feature_frame(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, *QUALITY_FEATURES) in ONE narrow pass.

    Semantically the union of text.quality_frame and
    curation.repetition_frame — but computed as a single projection:
    joining those two frames on the id would shuffle the whole corpus
    just to glue columns that come from the same row. Unlike
    repetition_frame, empty/blank docs are KEPT (all-zero features):
    a classifier must score every document, not silently drop some.

    Scale: zero shuffles, whole-stage codegen, one scan; the per-doc
    top-frequency pass is O(distinct × tokens) per row — scan-bound.
    """
    from xdump_spark.operators.sizing import spread

    raw = _raw_exprs(text_col)
    pre = spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), *[e.alias(name) for name, e in raw.items()]
    )
    pre2 = pre.withColumn("_bg", _bigrams_expr())
    return pre2.select(
        F.col(id_col),
        *[e.alias(name) for name, e in _feature_exprs().items()],
    )


@dataclass(frozen=True)
class LinearModel:
    """A fitted standardized-logistic model: score = sigmoid(bias +
    Σ wᵢ·(xᵢ−μᵢ)/σᵢ). Plain-data (JSON-safe) so a model trained once can
    ship to any scoring job."""

    features: tuple[str, ...]
    weights: tuple[float, ...]
    bias: float
    mean: tuple[float, ...]
    std: tuple[float, ...]

    def to_dict(self) -> dict:
        return {
            "features": list(self.features),
            "weights": list(self.weights),
            "bias": self.bias,
            "mean": list(self.mean),
            "std": list(self.std),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "LinearModel":
        return cls(
            features=tuple(d["features"]),
            weights=tuple(float(w) for w in d["weights"]),
            bias=float(d["bias"]),
            mean=tuple(float(m) for m in d["mean"]),
            std=tuple(float(s) for s in d["std"]),
        )


def fit_linear_classifier(
    features: DataFrame,
    label_col: str = "label",
    feature_cols: tuple[str, ...] | list[str] = QUALITY_FEATURES,
    id_col: str = "doc_id",
    max_rows: int = 100_000,
    l2: float = 1e-3,
    iters: int = 400,
    lr: float = 0.5,
) -> LinearModel:
    """Fit the logistic model on (features, 0/1 ``label_col``).

    Driver-side by design: the labeled set is capped at ``max_rows`` via
    the deterministic md5-bucket sample (same keep-set on every re-run,
    any cluster, any partitioning), standardized, and fit with zero-init
    full-batch gradient descent + L2 — no randomness anywhere, so two
    fits of the same data produce bit-identical weights. Label balance
    is handled by inverse-frequency example weights, the standard recipe
    when reference text is a sliver of the crawl.
    """
    cols = [F.col(c).cast("double") for c in feature_cols]
    lab = F.col(label_col).cast("double")
    sel = features.select(lab.alias("_y"), F.col(id_col), *cols)
    # id-only count: column pruning keeps label/features out of the sizing
    # pass, so the fit reads the feature columns exactly once (see
    # pq_train for why single-scan sample-first is not scale-safe)
    n_total = sel.select(id_col).count()
    if n_total == 0:
        raise ValueError("no labeled rows to fit on")
    if n_total > max_rows:
        from xdump_spark.operators.curation import _hex_threshold

        thr = _hex_threshold(max_rows / n_total, 6)
        sel = sel.filter(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 6) < F.lit(thr)
        )
    pdf = sel.drop(id_col).toPandas()
    y = pdf["_y"].to_numpy(dtype=np.float64)
    X = pdf[list(feature_cols)].to_numpy(dtype=np.float64)
    if not ((y == 0) | (y == 1)).all():
        raise ValueError(f"{label_col!r} must be 0/1")
    if y.min() == y.max():
        raise ValueError("need both classes in the labeled sample")

    mu = X.mean(axis=0)
    sd = X.std(axis=0)
    sd[sd == 0] = 1.0
    Z = (X - mu) / sd
    # inverse-frequency example weights: Σ pos-weights == Σ neg-weights
    w_pos, w_neg = 0.5 / y.mean(), 0.5 / (1 - y.mean())
    ex_w = np.where(y == 1, w_pos, w_neg)
    ex_w /= ex_w.sum()

    w = np.zeros(Z.shape[1])
    b = 0.0
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Z @ w + b)))
        g = ex_w * (p - y)
        w -= lr * (Z.T @ g + l2 * w)
        b -= lr * g.sum()
    return LinearModel(
        features=tuple(feature_cols),
        weights=tuple(float(x) for x in w),
        bias=float(b),
        mean=tuple(float(x) for x in mu),
        std=tuple(float(x) for x in sd),
    )


def score_expr(model: LinearModel) -> Column:
    """The model as one codegen arithmetic Column over the feature
    columns — the whole trained classifier inlined into the plan."""
    z = F.lit(model.bias)
    for name, w, mu, sd in zip(model.features, model.weights, model.mean, model.std):
        z = z + F.lit(w) * ((F.col(name).cast("double") - F.lit(mu)) / F.lit(sd))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def score_frame(
    features: DataFrame, model: LinearModel, score_col: str = "quality_score"
) -> DataFrame:
    """Add the classifier score ∈ (0,1) to a feature frame. Pure
    projection: zero shuffles, no UDF — safe to run over the full
    corpus as part of the same scan that built the features."""
    return features.withColumn(score_col, score_expr(model))


def with_quality_score(
    df: DataFrame,
    model: LinearModel,
    text_col: str = "text",
    score_col: str = "quality_score",
) -> DataFrame:
    """Append the classifier score to the corpus WITHOUT dropping any
    columns — the pipeline-stage form. Computing scores on the feature
    frame and joining back would shuffle the whole corpus on the id just
    to glue a scalar onto its own row; here the feature expressions are
    inlined over pinned intermediates in the same projection, so the
    stage stays a zero-shuffle map over whatever columns the pipeline is
    carrying.
    """
    extra = set(model.features) - set(QUALITY_FEATURES)
    if extra:
        raise ValueError(
            f"model uses non-standard features {sorted(extra)}; "
            "score via score_frame over your own feature frame instead"
        )
    from xdump_spark.operators.sizing import pushdown_barrier

    raw = _raw_exprs(text_col)
    fe = _feature_exprs()
    z = F.lit(model.bias)
    for name, w, mu, sd in zip(model.features, model.weights, model.mean, model.std):
        z = z + F.lit(w) * ((fe[name] - F.lit(mu)) / F.lit(sd))
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return (
        df.withColumns({name: e for name, e in raw.items()})
        .withColumn("_bg", _bigrams_expr())
        # barrier: a user's filter(score >= x) must NOT be pushed below
        # this projection — substitution would re-inline the pinned
        # token array per lambda element (measured 50× even at 500 docs)
        .withColumn(score_col, pushdown_barrier(score))
        .drop(*raw.keys(), "_bg")
    )


def quality_classifier_scores(
    docs: DataFrame,
    model: LinearModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    score_col: str = "quality_score",
) -> DataFrame:
    """Convenience: features + score for raw documents in one narrow
    pass — ``(id, *features, quality_score)``."""
    return score_frame(
        quality_feature_frame(docs, text_col=text_col, id_col=id_col),
        model,
        score_col=score_col,
    )
