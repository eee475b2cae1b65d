"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exact baseline; query side broadcast,
  similarity computed JVM-side with higher-order functions.
* sign-LSH (random hyperplanes) bucketing — the scale path: candidates
  share a signature prefix bucket, exact cosine re-ranks within buckets.
* exact near-dup pairs — cosine ≥ τ via bucketed candidates (scale) or
  full product (oracle baseline at small n).

Everything is double-precision: float32 inputs are upcast before any
arithmetic so results are engine-portable (and oracle-checkable).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a):
    return F.sqrt(dot(a, a))


def cosine(a, b):
    """dot(a,b) / (norm(a) * norm(b)) — the same association order DuckDB's
    list_cosine_similarity uses, for bit-comparable results."""
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector over the corpus.

    Plan shape: broadcast the (small) query side against the corpus scan —
    one pass over the corpus, no shuffle of corpus vectors; the window
    top-k shuffles only (n_queries × n_corpus-surviving) score rows.
    Norms are computed once per VECTOR before the pair join (computing
    them per pair triples the dominant higher-order-function cost).
    Returns (query_id, neighbor_id, cosine_sim) with deterministic
    tie-break on neighbor id."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", norm(F.col("cv")))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine_sim",
            F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), round_to),
        )
        .select("query_id", "neighbor_id", "cosine_sim")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", F.col("rn").cast("int").alias("rn"))
    )


def sign_lsh_tables(threshold: float, n_planes: int = 8, recall_target: float = 0.9) -> int:
    """Number of hash tables for a target recall at a given cosine
    threshold (random-hyperplane S-curve): a pair at similarity τ agrees
    on one hyperplane bit with p = 1 - arccos(τ)/π, collides in one table
    with p^planes, and in ≥1 of T tables with 1-(1-p^planes)^T.

    Sign-LSH is a HIGH-threshold tool: at τ=0.95 four 8-plane tables reach
    ~0.9 recall, while τ=0.4 would need ~90 tables — for moderate-
    similarity search use the IVF index instead (ivf_build/ivf_search)."""
    import math

    p_bit = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    p_table = p_bit**n_planes
    if p_table >= 1.0:
        return 1
    return max(1, math.ceil(math.log(1.0 - recall_target) / math.log(1.0 - p_table)))


def _bucket_array_udf(dim: int, n_planes: int, n_tables: int, seed: int):
    """Vectorized sign-LSH signatures for all hash tables in one Arrow
    batch: a (batch × dim) @ (dim × tables·planes) matmul, bits packed per
    table. A Pandas UDF is the right tool here — 32 plane-dots per row as
    nested SQL `aggregate` expressions exceeds whole-stage codegen limits
    and falls back to slow interpretation, while numpy does the batch in
    one BLAS call. Returns array<long> of length n_tables (index = table)."""
    rng = np.random.default_rng(seed)
    P = rng.standard_normal((n_tables * n_planes, dim))
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @pandas_udf("array<long>")
    def buckets(v: pd.Series) -> pd.Series:
        M = np.vstack(v.to_numpy()).astype(np.float64)          # (batch, dim)
        bits = (M @ P.T) > 0                                    # (batch, T*p)
        per_table = [
            bits[:, t * n_planes : (t + 1) * n_planes] @ weights for t in range(n_tables)
        ]
        return pd.Series(list(np.stack(per_table, axis=1)))

    return buckets


def _with_buckets(df: DataFrame, vec: str, out_prefix: str, dim, n_planes, n_tables, seed):
    """Attach (tbl, bucket) rows via posexplode of the per-table signature
    array — a pair is a candidate if it collides in ANY table, trading
    compute for recall (P = 1-(1-p^planes)^tables per-bit agreement p)."""
    udf = _bucket_array_udf(dim, n_planes, n_tables, seed)
    return df.withColumn("_buckets", udf(F.col(vec))).select(
        "*", F.posexplode("_buckets").alias(f"{out_prefix}tbl", f"{out_prefix}bucket")
    ).drop("_buckets")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share a sign-LSH bucket in any of
    ``n_tables`` tables, exact cosine re-ranks within. Recall < 1.0 by
    construction (rows-only check); at corpus scale the bucket join
    replaces the broadcast product with a shuffle on small keys."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", norm(F.col("qv")))
    q = _with_buckets(q, "qv", "", dim, n_planes, n_tables, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", norm(F.col("cv")))
    c = _with_buckets(c, "cv", "", dim, n_planes, n_tables, seed)
    scored = (
        c.join(F.broadcast(q), ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn(
            "cosine_sim",
            F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6),
        )
        .select("query_id", "neighbor_id", "cosine_sim")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", F.col("rn").cast("int").alias("rn"))
    )


@dataclass
class IVFIndex:
    """A built inverted-file index: driver-small centroids plus the
    cell-assigned corpus. Build once, search many — the reference pattern
    for repeated query batches (re-fitting KMeans per query batch would
    make the fit the dominant cost at corpus scale)."""

    centers: list[list[float]]   # n_cells × dim, plan-literal-small
    assigned: DataFrame          # (neighbor_id, cv, cn, cell), persisted
    n_cells: int

    def unpersist(self) -> None:
        self.assigned.unpersist()


def ivf_build(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    seed: int = 42,
    max_iter: int = 5,
    sample_fraction: float | None = None,
    persist: bool = True,
) -> IVFIndex:
    """Build the IVF index: fit KMeans (optionally on a sample — centroids
    only need a representative subset, so at 1e9 vectors fit on ~1e6), then
    assign every corpus vector to its cell in ONE model-transform pass.

    With ``persist`` (the build-once/search-many contract) the assigned
    frame is cached MEMORY_AND_DISK and the caller owns releasing it via
    ``IVFIndex.unpersist`` — persisted frames are NOT freed by GC, so an
    unreleased index leaks executor storage. At true scale it would
    instead be written out partitioned by cell so searches prune files;
    the in-session persist is the local analog."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", norm(F.col("cv")))
    fit_input = c.sample(sample_fraction, seed=seed) if sample_fraction else c
    km = KMeans(k=n_cells, seed=seed, maxIter=max_iter, featuresCol="_feat")
    model = km.fit(fit_input.withColumn("_feat", array_to_vector("cv")))
    centers = [ctr.tolist() for ctr in model.clusterCenters()]

    assigned = model.transform(c.withColumn("_feat", array_to_vector("cv"))).select(
        "neighbor_id", "cv", "cn", F.col("prediction").alias("cell")
    )
    if persist:
        assigned = assigned.persist(StorageLevel.MEMORY_AND_DISK)
        assigned.count()   # materialize eagerly: searches must not re-run the fit
    return IVFIndex(centers=centers, assigned=assigned, n_cells=n_cells)


def ivf_search(
    index: IVFIndex,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
) -> DataFrame:
    """Search a built IVF index: each query probes its ``n_probe`` nearest
    cells (squared L2, matching KMeans assignment) and re-ranks exactly
    within them — with 4096 cells / 64 probes that is a ~1.5% corpus scan
    per query batch instead of 100% (brute force). Centroids enter the
    query plan as literals, so probe selection is pure JVM expression
    work: no join, no UDF."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", norm(F.col("qv")))
    dists = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        F.col("qv"),
                        F.array(*[F.lit(float(x)) for x in ctr]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias("d"),
                F.lit(i).alias("cell"),
            )
            for i, ctr in enumerate(index.centers)
        ]
    )
    probed = q.withColumn(
        "cell", F.explode(F.slice(F.array_sort(dists), 1, n_probe).getField("cell"))
    )

    scored = (
        index.assigned.join(F.broadcast(probed), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine_sim",
            F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6),
        )
        .select("query_id", "neighbor_id", "cosine_sim")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", F.col("rn").cast("int").alias("rn"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    max_iter: int = 5,
) -> DataFrame:
    """One-shot convenience: ``ivf_build`` + ``ivf_search``. Callers with
    repeated query batches should build once and search the index. Built
    WITHOUT persisting the assignment (nobody would ever release it —
    persisted frames leak storage across repeated one-shot calls); the
    single search evaluates the lazy assignment once anyway."""
    index = ivf_build(
        corpus, id_col=id_col, vec_col=vec_col, n_cells=n_cells, seed=seed,
        max_iter=max_iter, persist=False,
    )
    return ivf_search(index, queries, k=k, id_col=id_col, vec_col=vec_col, n_probe=n_probe)


def embedding_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    exact: bool = False,
) -> DataFrame:
    """Pairs with cosine ≥ threshold. ``exact=True`` compares all pairs
    (baseline / oracle path, O(n²) — small n only); otherwise candidates
    must share a sign-LSH bucket in any of ``n_tables`` tables (scale
    path, approximate recall)."""
    c = corpus.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("n", norm(F.col("v")))
    if exact:
        l = c.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("n").alias("na"))
        r = c.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("n").alias("nb"))
        cand = l.join(r, F.col("id_a") < F.col("id_b"))
    else:
        bucketed = _with_buckets(c, "v", "", dim, n_planes, n_tables, seed)
        l = bucketed.select(
            "tbl", "bucket", F.col("id").alias("id_a"), F.col("v").alias("va"),
            F.col("n").alias("na"),
        )
        r = bucketed.select(
            "tbl", "bucket", F.col("id").alias("id_b"), F.col("v").alias("vb"),
            F.col("n").alias("nb"),
        )
        cand = (
            l.join(r, ["tbl", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
    return (
        cand.withColumn(
            "cosine_sim",
            F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6),
        )
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )
