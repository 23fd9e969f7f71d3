"""Stream-stream joins — the Structured Streaming shape where BOTH sides
arrive continuously and the engine must buffer each side's rows in state
until the other side's matches can still arrive.

Watermarks + the time-interval join condition are what make this bounded:
a click buffered longer than the join window past the watermark can never
match a future purchase, so the state store evicts it. Without BOTH
per-side watermarks and an event-time range in the join condition, Spark
(correctly) refuses to run an append-mode stream-stream join — unbounded
state is a scale bug, not a capability.

At 100 TB/day both sides shuffle on the equi-key (user_id) so a key's
rows co-locate with its buffered state; the interval bound keeps each
key's buffer to window-sized, not history-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clicks_with_purchases(
    clicks: DataFrame,
    purchases: DataFrame,
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Attribution join: each purchase pairs with the clicks the same user
    made in the ``within`` window BEFORE it (click.ts <= purchase.ts <=
    click.ts + within). Both inputs need (user_id, ts, event_id).

    Output: (user_id, click_id, purchase_id, click_ts, purchase_ts) —
    append mode, rows emit once both watermarks pass the point where new
    matches are impossible.
    """
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {within}"))
    )
    return c.join(p, cond).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
    )


def enrich_stream_with_dim(
    events: DataFrame,
    dim: DataFrame,
    on: str,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment — the most common production streaming
    join: a continuous event stream decorated with attributes from a
    static (or slowly-refreshed) dimension table.  Unlike stream-stream,
    the static side needs NO watermark and NO state-store buffering: each
    micro-batch simply joins against the dimension as of that batch.

    ``broadcast_dim=True`` ships the dimension to every executor once per
    batch — the right call whenever the dim fits in memory (catalogs,
    user tables), because it removes the per-batch shuffle of the
    unbounded stream side entirely.  For a dimension too big to
    broadcast, pass False and Spark shuffles both sides on the key (the
    stream side's shuffle is per-batch-sized, not history-sized, so this
    stays bounded too).

    Left join keeps events whose key is missing from the dimension
    (attributes null) — dropping unmatched telemetry silently is a
    pipeline bug, not a join strategy.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return events.join(d, on, "left")
