"""As-of join — a custom operator Spark lacks (SURVEY.md §2.9 gap class).

Semantics: for each LEFT row, attach the most recent RIGHT row of the same
key whose timestamp is <= the left timestamp (inclusive), with a total-order
tie-break (ts, then id) so results are deterministic and oracle-matchable.

Spark-first plan (the union-carry formulation): tag both inputs, union them
(narrow), then ONE window over (key) ordered by (ts, side, id) carrying the
last-seen right id/ts forward with ``last(..., ignorenulls)``. One shuffle
on the key, state bounded per key — no range-condition nested-loop join,
no per-row subquery. This is the classic distributed as-of shape; at 100 TB
the shuffle key is the join key and AQE handles skewed keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    left_id: str,
    right_id: str,
    right_payload: list[str] | None = None,
) -> DataFrame:
    """For each left row: the latest right row with right_ts <= left_ts on
    the same key (ties on ts -> highest right_id). Returns all left columns
    plus ``asof_<right_id>`` / ``asof_<right_ts>`` (+payload), NULL when no
    right row precedes.
    """
    payload = right_payload or []
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),  # right rows order BEFORE a left row at equal ts
        F.col(right_id).alias("_rid"),
        F.lit(None).cast("long").alias("_lid"),
        *[F.col(c).alias(f"_p_{c}") for c in payload],
    )
    l = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_rid"),
        F.col(left_id).alias("_lid"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_p_{c}") for c in payload],
    )
    u = r.unionByName(l)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts"), F.col("_side"), F.col("_rid").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        u.withColumn("asof_rid", F.last("_rid", ignorenulls=True).over(w))
        .withColumn(
            "asof_rts",
            F.last(F.when(F.col("_rid").isNotNull(), F.col("_ts")), ignorenulls=True).over(w),
        )
    )
    for c in payload:
        carried = carried.withColumn(
            f"asof_{c}", F.last(f"_p_{c}", ignorenulls=True).over(w)
        )
    out = carried.filter(F.col("_side") == 1).select(
        F.col(key),
        F.col("_lid").alias(left_id),
        F.col("_ts").alias(left_ts),
        F.col("asof_rid").alias(f"asof_{right_id}"),
        F.col("asof_rts").alias(f"asof_{right_ts}"),
        *[F.col(f"asof_{c}") for c in payload],
    )
    return out


def range_join(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Range (band) join: attach the band whose [lo, hi) interval contains
    the value. The bands table is small by construction -> broadcast
    nested-loop with the range predicate; at huge band counts the scale
    path is bucketing values to band ids first (equi-join)."""
    b = F.broadcast(bands)
    return facts.join(
        b,
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)),
        "left",
    )
