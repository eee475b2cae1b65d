"""Table profiling: per-column statistics in one pass — the engine's
ANALYZE. The reference relies on the host database's own catalog stats;
a parquet lake has none, so pipeline health checks (schema drift, null
explosions, cardinality collapse) need an explicit profiling operator.

Output is long-format ``(column, metric, value double)`` so any column
set profiles into one stable schema.

Scale: ALL metrics for ALL columns are computed in a SINGLE aggregation
pass (one map-side-combined agg job, no per-column scans). Distinct
counts default to HyperLogLog ``approx_count_distinct`` (mergeable
sketch, no shuffle of values); ``exact_distinct=True`` upgrades them to
exact ``count_distinct`` — one expand + shuffle, still a single job, for
when exactness matters more than the sketch's ~2% error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = False,
    quantiles: tuple[float, ...] = (),
    quantile_accuracy: int = 10_000,
) -> DataFrame:
    """(column, metric, value) statistics. For every selected column:
    ``count`` (non-null), ``nulls``, ``distinct``; numeric columns add
    ``min``, ``max``, ``mean``, ``stddev`` (sample) and, when
    ``quantiles`` is non-empty, one ``p<pct>`` metric per requested
    fraction via ``percentile_approx`` (Greenwald-Khanna sketch —
    mergeable, stays inside the same single-pass agg; accuracy 10000 ⇒
    rank error ≤ 1/10000). Non-numeric min/max are omitted rather than
    coerced (a lexicographic min cast to double would be noise)."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    names = columns or list(fields)
    unknown = [c for c in names if c not in fields]
    if unknown:
        raise ValueError(f"unknown columns: {unknown}")

    aggs = []
    metrics: list[tuple[str, str]] = []  # (column, metric) in agg order

    def add(col: str, metric: str, expr):
        aggs.append(expr.cast("double").alias(f"{col}__{metric}"))
        metrics.append((col, metric))

    for c in names:
        dt = fields[c]
        add(c, "count", F.count(F.col(c)))
        add(c, "nulls", F.count(F.lit(1)) - F.count(F.col(c)))
        if exact_distinct:
            add(c, "distinct", F.count_distinct(F.col(c)))
        else:
            add(c, "distinct", F.approx_count_distinct(F.col(c)))
        if isinstance(dt, _NUMERIC):
            add(c, "min", F.min(F.col(c)))
            add(c, "max", F.max(F.col(c)))
            add(c, "mean", F.avg(F.col(c)))
            add(c, "stddev", F.stddev_samp(F.col(c)))
            for q in quantiles:
                add(
                    c,
                    f"p{round(q * 100):02d}",
                    F.percentile_approx(F.col(c), F.lit(q), F.lit(quantile_accuracy)),
                )

    wide = df.agg(*aggs)
    # One-row wide frame → long format via stack (JVM-side, no shuffle).
    pairs = ", ".join(
        f"'{col}', '{metric}', `{col}__{metric}`" for col, metric in metrics
    )
    return wide.selectExpr(
        f"stack({len(metrics)}, {pairs}) as (column, metric, value)"
    )
