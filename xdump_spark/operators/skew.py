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
