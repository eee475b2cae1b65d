"""Connected components over a pair graph — near-dup CLUSTERING.

Pair operators (minhash/simhash/embedding near-dup) emit EDGES; a
training-data dedup pipeline needs the transitive CLUSTERS ("these 7
documents are all one document") and one canonical representative per
cluster to keep. That closure step is this module.

Algorithm: iterated min-label propagation with pointer jumping
("hash-to-min" family — Rastogi et al., "Finding Connected Components in
Map-Reduce in Logarithmic Rounds", ICDE 2013). Each round:

1. neighbor step — every vertex takes the min label over itself and its
   neighbors (one shuffle on the edge list);
2. pointer jump — labels chase their own label (label(v) :=
   label(label(v)), one self-join on the label frame), halving chain
   depth like the closure planner's pointer-doubling twin.

Convergence is O(log d) rounds for diameter d; near-dup clusters have
tiny diameters, so 2-3 rounds are typical. Per-round state is the
(vertex, label) frame only — edges never grow, labels are
localCheckpoint'd to cut lineage, and every join key is a small id — the
same scale discipline as planner/closure.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    vertices: DataFrame | None = None,
    vertex_col: str | None = None,
    max_iter: int = 25,
) -> DataFrame:
    """(vertex, component) for every vertex, where ``component`` is the
    MINIMUM vertex id reachable through ``edges`` (undirected) — the
    canonical-representative convention (keep the min-id document, drop
    the rest of its cluster).

    ``vertices`` (optional) adds isolated vertices: anything absent from
    the edge list is its own singleton component, so the output covers
    the whole corpus and a dedup filter is one join away.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.repartition("a").localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("a").alias("vertex"))
        .distinct()
        .withColumn("label", F.col("vertex"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # neighbor min: label(v) = min(label(v), min_{(v,u)∈E} label(u))
        nbr = (
            sym.join(labels.withColumnRenamed("vertex", "b"), "b")
            .groupBy(F.col("a").alias("vertex"))
            .agg(F.min("label").alias("nbr_min"))
        )
        stepped = (
            labels.join(nbr, "vertex", "left")
            .select("vertex", F.least("label", "nbr_min").alias("label"))
        )
        # pointer jump: label(v) = label(label(v))
        jump = labels.select(
            F.col("vertex").alias("label"), F.col("label").alias("jumped")
        )
        jumped = (
            stepped.join(jump, "label", "left")
            .select(
                "vertex", F.least("label", "jumped").alias("label")
            )
        )
        new_labels = jumped.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "vertex")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    out = labels.select("vertex", F.col("label").alias("component"))
    if vertices is not None:
        vcol = vertex_col or vertices.columns[0]
        allv = vertices.select(F.col(vcol).alias("vertex")).distinct()
        out = (
            allv.join(out, "vertex", "left")
            .select(
                "vertex",
                F.coalesce("component", "vertex").alias("component"),
            )
        )
    return out


def dedup_survivors(
    components: DataFrame, keep: str = "min"
) -> DataFrame:
    """The rows to KEEP after clustering: one representative per
    component (the component id itself under the min-id convention)."""
    return components.filter(F.col("vertex") == F.col("component")).select(
        F.col("vertex").alias("survivor")
    )


def fuzzy_dedup(
    corpus: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    **minhash_kwargs,
) -> DataFrame:
    """MinHash-LSH fuzzy deduplication, end to end — the standard
    near-dup pipeline of large-corpus preparation (Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better" §4.1;
    the same composition GPT-3/The Pile/RefinedWeb describe): shingle →
    MinHash signatures → banded LSH candidate pairs → transitive
    clusters → one survivor per cluster.

    Composition of the toolkit's scale-safe pieces — banded candidate
    generation with hot-bucket guards (dedup.minhash_lsh_pairs; tune
    num_perm/bands/shingle_k/verify through ``minhash_kwargs``),
    connected components (hash-to-min + pointer jumping, O(log
    diameter) rounds), min-id survivors — so it inherits each stage's
    100 TB posture: no all-pairs path, edges never grow, per-round
    state is one (vertex, label) frame.

    Returns (vertex, component, is_survivor) covering EVERY input id;
    filter ``is_survivor`` to materialize the deduplicated corpus, or
    join back on ``vertex`` to audit what each dropped doc duplicated.
    """
    from xdump_spark.operators.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(
        corpus, text_col=text_col, id_col=id_col, threshold=threshold, **minhash_kwargs
    )
    comp = connected_components(
        pairs.select("id_a", "id_b"),
        vertices=corpus,
        vertex_col=id_col,
    )
    return comp.withColumn(
        "is_survivor", F.col("vertex") == F.col("component")
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **neardup_kwargs,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    documents whose EMBEDDINGS are near-identical (cosine >= threshold),
    keep one representative per cluster.

    Composition of the toolkit's scale-safe pieces — sign-LSH-bucketed
    embedding near-dup pairs (similarity.embedding_neardup_pairs; pass
    ``exact=True`` through ``neardup_kwargs`` for the guarded small-n
    exact path), connected components (hash-to-min + pointer jumping,
    O(log diameter) rounds), min-id survivors — so it inherits each
    stage's 100 TB posture. Returns (vertex, component, is_survivor):
    every input id with its cluster representative; filter
    ``is_survivor`` to materialize the deduplicated corpus.
    """
    from xdump_spark.operators.similarity import embedding_neardup_pairs

    pairs = embedding_neardup_pairs(
        corpus, threshold=threshold, id_col=id_col, vec_col=vec_col, **neardup_kwargs
    )
    comp = connected_components(
        pairs.select("id_a", "id_b"),
        vertices=corpus,
        vertex_col=id_col,
    )
    return comp.withColumn(
        "is_survivor", F.col("vertex") == F.col("component")
    )
