"""Temporal joins over event tables: as-of join, point-in-interval range
join.

Spark has no native ASOF JOIN (DuckDB, kdb+, pandas do). The naive
formulation — equi-join on the group key plus an inequality on time, then
keep the max — plans as a per-group product with a post-filter:
O(|L|·|R|) within every group. The implementation here is the
union-tag + last-carry-forward shape: both sides merge into one frame,
sort per group by (time, side-tag), and a running ``last(ignorenulls)``
window carries each right row's payload forward to the left rows that
follow it. ONE shuffle on the group key, O((|L|+|R|) log) sort — the
standard scale-out ASOF strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | tuple[str, ...] = ("user_id",),
    right_prefix: str = "r_",
) -> DataFrame:
    """Backward as-of join: attach to each left row the LATEST right row
    with ``right.on <= left.on`` in the same ``by`` group (DuckDB
    ``ASOF LEFT JOIN`` semantics — left rows with no prior right row keep
    nulls). Right payload columns come back prefixed with
    ``right_prefix``; the matched right time is ``{prefix}{on}``.

    A right row at exactly the left row's time IS visible (<=): the right
    side sorts before the left at equal times. Among multiple right rows
    at the same (group, time) the surviving one is unspecified — dedupe
    first if that matters.

    NULL ``by`` keys never match (DuckDB ASOF equality semantics): right
    rows with a NULL key are dropped before the union — otherwise the
    window's partition-by would group left and right NULL keys together
    and hand NULL-keyed left rows phantom matches. NULL-keyed LEFT rows
    are kept (it is a left join) and simply get no match.
    """
    by = list(by)
    rvals = [c for c in right.columns if c not in by + [on]]
    payload = F.struct(
        F.col(on).alias(f"{right_prefix}{on}"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in rvals],
    )
    # A NULL right time never matches (ASOF semantics; NULLs would
    # otherwise sort first and be carried forward as phantom matches),
    # and neither does a NULL right group key.
    r = right.where(F.col(on).isNotNull())
    for key in by:
        r = r.where(F.col(key).isNotNull())
    r = r.select(*by, F.col(on), payload.alias("__r"), F.lit(0).alias("__tag"))
    l = left.withColumn("__tag", F.lit(1)).withColumn(
        "__r", F.lit(None).cast(r.schema["__r"].dataType)
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        W.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__tag").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    u = u.withColumn("__r", F.last("__r", ignorenulls=True).over(w))
    out = u.where(F.col("__tag") == 1)
    r_cols = [
        F.col(f"__r.{right_prefix}{on}").alias(f"{right_prefix}{on}")
    ] + [F.col(f"__r.{right_prefix}{c}").alias(f"{right_prefix}{c}") for c in rvals]
    return out.select(*[F.col(c) for c in left.columns], *r_cols)


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
) -> DataFrame:
    """Inner join of points to every interval containing them
    (``start <= point <= end``) with NO equi key — the case Spark plans
    as a nested-loop product. Binning makes it an equi-join: intervals
    explode to the ``bin_width``-sized bins they overlap, points map to
    their single bin, the join runs on the bin id, and the exact range
    predicate filters within the bin. Each (point, interval) pair meets
    in exactly ONE bin (the point's), so no dedup pass is needed.

    Cost: |intervals| × (span/bin_width + 1) replicated rows + one hash
    shuffle — pick ``bin_width`` near the typical interval span so the
    replication factor stays ~2. Point/start/end must be numeric (epoch
    numbers; cast timestamps first). A degenerate bin (all points in one
    bin) is ordinary join skew — AQE's skew-join split applies.

    For integral time columns, bin ids use EXACT integer floor division
    ((x - pmod(x, w)) div w), not ``floor(x / w)``: Spark's ``/`` is
    double division, which above 2^53 (nanosecond epochs) rounds x before
    flooring and misaligns bins. Fractional time columns keep the double
    formulation (their values cannot exceed 2^53 exactly anyway) — for
    them the input-magnitude contract is |x| < 2^53."""
    integral = {"byte", "short", "int", "bigint", "smallint", "tinyint"}

    def _bin(df: DataFrame, col_name: str):
        if df.schema[col_name].dataType.simpleString() in integral:
            return F.expr(
                f"((`{col_name}` - pmod(`{col_name}`, {bin_width})) div {bin_width})"
            )
        return F.floor(F.col(col_name) / bin_width)

    b = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(_bin(intervals, start_col), _bin(intervals, end_col))
        ),
    )
    p = points.withColumn("__bin", _bin(points, point_col))
    return (
        p.join(b, "__bin")
        .where(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("__bin")
    )
