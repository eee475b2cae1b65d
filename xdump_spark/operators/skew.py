"""Skew mitigation: salted equi-join.

AQE's skew-join handling (enabled in session.py) splits oversized shuffle
partitions at runtime, which covers most cases; explicit salting remains
the tool when one join key is hot enough that even a split partition is
dominated by a single key, or when AQE is unavailable (streaming joins).

Pattern: the skewed (large) side gets a uniform salt in [0, n); the small
side is replicated n ways with every salt value; joining on (key, salt)
spreads each hot key over n tasks. Replication multiplies the small side
by n — choose n ≈ (hot-key rows / target rows per task), not larger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str | list[str],
    n_salt: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join ``skewed ⋈ small`` on column(s) ``on`` with the hot keys of
    ``skewed`` spread over ``n_salt`` sub-keys. Result equals the plain
    join (salt columns are internal and dropped)."""
    # normalize the way Spark's JoinType resolution does (lowercase,
    # underscores stripped) so "RIGHT"/"Full_Outer"/"OUTER" can't slip past
    if how.lower().replace("_", "") in {"right", "rightouter", "full",
                                        "fullouter", "outer"}:
        # The small side is replicated n_salt ways; its unmatched rows
        # would surface n_salt times under right/full outer joins.
        raise ValueError(
            f"salted_join does not support how={how!r}: the replicated "
            "small side duplicates unmatched rows under right/full outer "
            "joins. Swap the sides or use a plain join with AQE skew "
            "handling."
        )
    keys = [on] if isinstance(on, str) else list(on)
    salted = skewed.withColumn(
        SALT_COL, F.floor(F.rand(seed) * n_salt).cast("int")
    )
    replicated = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return salted.join(replicated, keys + [SALT_COL], how).drop(SALT_COL)


def topk_per_key(
    df: DataFrame,
    key_cols: str | list[str],
    order_cols: list,
    k: int,
    n_salt: int = 16,
    rn_col: str = "rn",
    seed: int = 42,
) -> DataFrame:
    """Skew-robust deterministic top-``k`` rows per key (row_number
    semantics, ties broken by ``order_cols`` which must therefore be a
    total order — include a unique id as the last column).

    A plain ``row_number().over(partitionBy(key))`` puts EVERY row of a
    hot key in one task — window functions get no AQE skew handling, so
    a Zipf-hot key is a straggler a 1000-executor cluster cannot split.
    This runs two bounded passes instead:

    1. local: window over (key, salt) with a deterministic salt hashed
       from the order columns — the hot key's rows spread over
       ``n_salt`` tasks, each keeping ≤ k;
    2. global: window over (key) on the ≤ k·n_salt survivors per key.

    Top-k of the union of per-salt top-ks equals the global top-k, so
    the result is IDENTICAL to the plain window (equivalence-tested) for
    ANY assignment of rows to salts — which is why a uniform random salt
    is safe here even though the repo's operators are otherwise
    deterministic end-to-end: the salt only chooses which task pre-filters
    a row, never whether it survives. ``n_salt`` bounds the stage-2
    partition at k·n_salt rows per key regardless of how hot the key is."""
    from pyspark.sql import Window as W

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    salt = F.floor(F.rand(seed) * n_salt).cast("int")
    w1 = W.partitionBy(*keys, SALT_COL).orderBy(*order_cols)
    w2 = W.partitionBy(*keys).orderBy(*order_cols)
    local = (
        df.withColumn(SALT_COL, salt)
        .withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= k)
        .drop(SALT_COL, "_rn1")
    )
    return local.withColumn(rn_col, F.row_number().over(w2)).filter(
        F.col(rn_col) <= k
    )
