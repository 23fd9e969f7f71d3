"""Window-function operators: per-group top-n and sessionization.

These generalize the reference's only rank-like computation (the global
top-k slice, SURVEY.md §2.4 A4) to grouped/windowed forms — the shapes a
training-data pipeline needs (top-k per query in batch search, session
assembly over event streams).

Scale notes: both operators shuffle exactly once, on the partition key
(query id / user id). Skewed keys are handled by AQE skew-join/partition
splitting; the per-partition sort is bounded by the group size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topn_per_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    n: int,
    rank_col: str = "rn",
) -> DataFrame:
    """row_number() <= n per group, with the caller's total-order tie-break."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= n)
    )


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the previous
    event of the same user exceeds ``gap_seconds``. Gap arithmetic runs on
    epoch microseconds — timezone-proof and oracle-matchable.

    Adds ``session_id`` (1-based per user, by time order).
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    us = F.unix_micros(F.col(ts_col))
    prev = F.lag(us).over(w)
    new_sess = F.when(
        prev.isNull() | ((us - prev) > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def zscore_anomalies(
    df: DataFrame,
    value_col: str,
    key_col: str,
    threshold: float = 3.0,
) -> DataFrame:
    """Per-key z-score outliers: events whose value deviates from the key's
    mean by >= ``threshold`` sample standard deviations.

    Built-in ``stddev_samp`` sums doubles in partition order, which is
    nondeterministic across engines/runs — instead the sums (sum, sum of
    squares) accumulate as exact DECIMALs of the 2-dp-quantized values, so
    mean/std derive from order-independent numbers and the z expression is
    the same IEEE tree on both engines (bit-identical, no rounding
    needed). One shuffle for the per-key stats (map-side partial agg), one
    broadcast-or-shuffle join back keyed the same way.
    """
    v = F.col(value_col).cast("decimal(18,2)")
    stats = df.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("s"),
        F.sum((v * v).cast("decimal(30,4)")).alias("ss"),
    )
    s_d, ss_d, n_d = (
        F.col("s").cast("double"),
        F.col("ss").cast("double"),
        F.col("n").cast("double"),
    )
    mean = s_d / n_d
    var = (ss_d - s_d * s_d / n_d) / (n_d - 1)
    # var > 0 filters BEFORE any sqrt: fp cancellation can drive the exact-
    # decimal-derived variance a hair negative for constant-valued keys,
    # and the DuckDB twin hard-errors on sqrt(negative)
    joined = df.join(stats, key_col).filter((F.col("n") >= 2) & (var > 0))
    z = (F.col(value_col).cast("decimal(18,2)").cast("double") - mean) / F.sqrt(var)
    return joined.withColumn("z_score", z).filter(
        F.abs(F.col("z_score")) >= threshold
    )


def global_rank(
    df: DataFrame,
    order_by: list[Column],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global row_number over ``order_by`` WITHOUT the
    single-partition window (``Window.orderBy`` with no partitionBy pulls
    the whole relation into one task — the classic global-sort scale
    wall).  Two bounded shuffles instead:

    1. ``repartitionByRange`` on the order keys — a distributed range
       sort; partition ids follow the global order.
    2. a per-partition ``row_number`` (window keyed on partition id, so
       every task sorts only its own range) plus per-partition counts
       rolled into cumulative offsets — a <= num_partitions row relation,
       broadcast back.  global rank = partition offset + local rank.

    The order must be a strict total order (include a unique id
    tie-break), otherwise ranks at partition boundaries are undefined.
    This is the building block for curriculum ordering, deterministic
    training-data shuffles, and exact ntile-style staging at corpus scale.

    The locally-ranked relation is pinned with ``localCheckpoint`` before
    fan-out: the offsets branch and the join branch would otherwise each
    re-execute the range exchange, and RangePartitioner draws its
    boundary sample with a per-exchange-instance seed — two executions
    can place the same row in different partitions, silently corrupting
    ranks (observed at sf0.1: duplicate/gapped ranks when exchange reuse
    didn't kick in).  One materialization is the price of consistency;
    it is a single pass over data that the sort already materialized.
    """
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = df.repartitionByRange(n, *order_by).withColumn(
        "_pid", F.spark_partition_id()
    )
    local = ranged.withColumn(
        "_lrn", F.row_number().over(Window.partitionBy("_pid").orderBy(*order_by))
    ).localCheckpoint(eager=True)
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_cnt").over(off_w), F.lit(0))
    ).select("_pid", "_off")
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_col, (F.col("_off") + F.col("_lrn")).cast("long"))
        .drop("_pid", "_lrn", "_off")
    )


def pareto_front(
    df: DataFrame,
    cost_col: str,
    gain_col: str,
    id_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """2-D skyline (Borzsony/Kossmann/Stocker 2001, "The Skyline
    Operator"): rows not DOMINATED by any other — x dominates y when
    x.cost <= y.cost AND x.gain >= y.gain with at least one strict.
    The classic price/performance query ("no cheaper part delivers at
    least as much").

    Neither the naive O(n^2) dominance self-join NOR the single-
    partition global window: the ``global_rank`` scheme applied to a
    running maximum. Range-partition on cost (equal costs land in ONE
    partition — partition placement is a pure function of the key), per
    -partition m_below = max(gain) over STRICTLY cheaper local rows (a
    RANGE frame ending at -1, exact because cost is integral), then
    per-partition gain maxima roll into prefix maxima over earlier
    partitions — a <= num_partitions row relation, broadcast back.
    m_below = greatest(local, prefix); m_at = max(gain) within equal
    cost (hash-partitioned window). A row survives iff gain > m_below
    (nothing cheaper does as well) and gain == m_at (nothing at the
    same price does better); identical (cost, gain) points all survive.
    Both columns must be integers. ``localCheckpoint`` pins the range
    placement before the two consumers fan out (same boundary-seed
    hazard global_rank documents).
    """
    import pyspark.sql.types as T

    for c in (cost_col, gain_col):
        if not isinstance(
            df.schema[c].dataType,
            (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
        ):
            # a float cost makes the RANGE -1 frame mean "cost <= c-1",
            # silently skipping strictly-cheaper rows within 1 unit —
            # wrong skyline with no error. Quantize first (cents, etc.).
            raise TypeError(
                f"pareto_front requires integral {c!r} "
                f"(got {df.schema[c].dataType}); quantize floats first"
            )
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = df.repartitionByRange(n, F.asc(cost_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(cost_col)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn(
        "_lm", F.max(gain_col).over(w_local)
    ).localCheckpoint(eager=True)
    pmax = local.groupBy("_pid").agg(F.max(gain_col).alias("_pmax"))
    pref_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    prefixes = pmax.withColumn("_pref", F.max("_pmax").over(pref_w)).select(
        "_pid", "_pref"
    )
    w_at = Window.partitionBy(cost_col)
    return (
        local.join(F.broadcast(prefixes), "_pid")
        .withColumn("_m_below", F.greatest(F.col("_lm"), F.col("_pref")))
        .withColumn("_m_at", F.max(gain_col).over(w_at))
        .filter(
            (F.col("_m_below").isNull() | (F.col(gain_col) > F.col("_m_below")))
            & (F.col(gain_col) == F.col("_m_at"))
        )
        .drop("_pid", "_lm", "_pref", "_m_below", "_m_at")
        .orderBy(F.asc(cost_col), F.asc(id_col))
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: tuple[str, str] = ("ts", "event_id"),
) -> DataFrame:
    """First-order Markov transition mining over per-user event
    sequences: for each (prev_event, next_event) adjacency, the count
    and the conditional probability P(next | prev) = n / n_from_prev.
    The sequence order is (ts, event_id) — the id tiebreak makes the
    lag deterministic even under timestamp collisions.

    Scale shape: ONE shuffle (the per-user window partition); the lag
    rides it, the pair count is a map-side-combinable aggregation over
    a |event_types|^2-bounded key space, and the per-prev totals join
    back as a broadcast of at most |event_types| rows. Probabilities
    are int/int ratios in float64 rounded 6dp — engine-deterministic.
    Returns (prev_event, next_event, n, p) ordered (prev, next)."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(*order_cols)
    pairs = (
        events.select(
            F.lag(type_col).over(w).alias("prev_event"),
            F.col(type_col).alias("next_event"),
        )
        .filter(F.col("prev_event").isNotNull())
        .groupBy("prev_event", "next_event")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("prev_event").agg(F.sum("n").alias("tot"))
    return (
        pairs.join(F.broadcast(totals), "prev_event")
        .select(
            "prev_event",
            "next_event",
            "n",
            F.round(F.col("n") / F.col("tot"), 6).alias("p"),
        )
        .orderBy("prev_event", "next_event")
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    threshold: float = 3.5,
) -> DataFrame:
    """Robust per-group anomaly detection: modified z-score
    M = 0.6745 * (x - median) / MAD (Iglewicz-Hoaglin), flagging
    |M| > threshold. Unlike the mean/stddev z-score (see
    ``event_zscore_anomalies``), a single extreme value cannot drag the
    center or inflate the spread — the estimator survives the exact
    contamination it exists to find. Groups with MAD = 0 (constant
    values) are excluded rather than divided by zero.

    Shape: two grouped EXACT percentile aggregations (median, then
    median of absolute deviations) with the tiny per-group statistics
    broadcast back between passes — two scans, no window over raw
    rows. Exact percentile sorts each group's values inside the
    aggregation buffer; at 100 TB swap in approx_percentile(1e-4) for
    the first pass and keep this form for oracle-checked tiers.
    Returns (id, group, value, m) for flagged rows, m rounded 6dp."""
    med = df.groupBy(group_col).agg(
        F.percentile(value_col, F.lit(0.5)).alias("med")
    )
    with_med = df.join(F.broadcast(med), group_col)
    mad = (
        with_med.groupBy(group_col)
        .agg(
            F.percentile(
                F.abs(F.col(value_col) - F.col("med")), F.lit(0.5)
            ).alias("mad")
        )
        .filter(F.col("mad") > 0)
    )
    m = F.round(
        0.6745 * (F.col(value_col) - F.col("med")) / F.col("mad"), 6
    )
    return (
        with_med.join(F.broadcast(mad), group_col)
        .select(id_col, group_col, value_col, m.alias("m"))
        .filter(F.abs(F.col("m")) > threshold)
        .orderBy(id_col)
    )


def transition_entropy(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: tuple[str, str] = ("ts", "event_id"),
) -> DataFrame:
    """Per-state Shannon entropy of the next-event distribution —
    H(next | prev) per prev_event, the predictability metric over the
    ``event_transitions`` Markov matrix (H=0: deterministic flow;
    H=ln(k): uniform over k successors). Each -p*ln(p) term quantizes
    to DECIMAL(30,10) BEFORE the sum (the ``char_entropy`` pattern), so
    the aggregation is order-free and engine-deterministic regardless
    of partial-aggregate ordering. Same single-shuffle shape as
    ``event_transitions``. Returns (prev_event, n_transitions, entropy)
    ordered by prev_event."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(*order_cols)
    pairs = (
        events.select(
            F.lag(type_col).over(w).alias("prev_event"),
            F.col(type_col).alias("next_event"),
        )
        .filter(F.col("prev_event").isNotNull())
        .groupBy("prev_event", "next_event")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("prev_event").agg(F.sum("n").alias("t"))
    p = F.col("n") / F.col("t")
    term = (-p * F.log(p)).cast("decimal(30,10)")
    return (
        pairs.join(F.broadcast(totals), "prev_event")
        .groupBy("prev_event", "t")
        .agg(F.round(F.sum(term).cast("double"), 6).alias("entropy"))
        .select(
            "prev_event",
            F.col("t").cast("long").alias("n_transitions"),
            "entropy",
        )
        .orderBy("prev_event")
    )


def seasonal_decompose_daily(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    period: int = 7,
) -> DataFrame:
    """Classical additive seasonal decomposition of the DAILY value total:
    value = trend + seasonal + residual. Trend is the centered
    ``period``-day moving average; the seasonal component is the mean
    detrended value per day-of-week; the residual is what anomaly review
    actually reads (a spike that survives trend AND weekday correction).

    Scale: the corpus-size work is ONE map-combined groupBy to daily
    totals (events sum exactly as DECIMAL(20,8), order-free). Everything
    after operates on #days rows — the single-partition ordered window is
    bounded by the calendar, not the data (30 rows here; 36,500 for a
    century), so this is safe at any corpus size. Day-of-week uses
    epoch-day arithmetic (engine-portable, locale-free); per-weekday means
    fold DECIMAL-quantized terms so both engines sum identically.

    Returns one row per day: (day, n_events, day_value, trend, seasonal,
    residual); trend/seasonal/residual are NULL for the first/last
    period//2 days (undefined centered window) — kept, not dropped, so
    the frame is gap-free for downstream charting.
    """
    half = period // 2
    daily = (
        events.groupBy(F.to_date(F.col(ts_col)).alias("day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(20,8)")).alias("v"),
        )
    )
    w = Window.orderBy("day").rowsBetween(-half, half)
    trended = daily.select(
        "day",
        "n_events",
        F.col("v"),
        F.when(
            # a centered window is only complete when period rows exist
            # AND the date span is contiguous (guards calendar gaps)
            (F.count(F.lit(1)).over(w) == period)
            & (
                F.datediff(F.max("day").over(w), F.min("day").over(w))
                == period - 1
            ),
            F.sum("v").over(w).cast("double") / float(period),
        ).alias("trend"),
    )
    detrended = trended.withColumn(
        "dt",
        (F.col("v").cast("double") - F.col("trend")).cast("decimal(30,10)"),
    ).withColumn(
        "dow", F.pmod(F.datediff(F.col("day"), F.lit("1970-01-01")), F.lit(7))
    )
    seasonal = (
        detrended.filter(F.col("dt").isNotNull())
        .groupBy("dow")
        .agg(
            (F.sum("dt").cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "seasonal_raw"
            )
        )
    )
    # + 0.0 after the final ROUND: ROUND(-1e-9, 6) is -0.0, whose sign
    # bit the driver's exact value-hash sees (the r5 embedding_covariance
    # failure class); adding positive zero normalizes it in both engines
    out = detrended.join(F.broadcast(seasonal), "dow", "left").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_events",
        F.round(F.col("v").cast("double"), 2).alias("day_value"),
        (F.round(F.col("trend"), 6) + F.lit(0.0)).alias("trend"),
        F.when(
            F.col("trend").isNotNull(), F.round("seasonal_raw", 6) + F.lit(0.0)
        ).alias("seasonal"),
        F.when(
            F.col("trend").isNotNull(),
            F.round(
                F.col("v").cast("double") - F.col("trend") - F.col("seasonal_raw"),
                6,
            )
            + F.lit(0.0),
        ).alias("residual"),
    )
    return out.orderBy("day")


def sliding_active_users(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    window_days: int = 7,
) -> DataFrame:
    """Per-day trailing-window distinct active users (the DAU/WAU board):
    for each observed day D, the distinct users active in [D-6, D], the
    same-day distinct users, and the DAU/WAU stickiness ratio.

    The Spark-shaped trick: a sliding DISTINCT cannot reuse partial
    aggregates across windows, so instead of ``window_days`` self-scans
    each event row EXPLODES to every report day whose trailing window
    contains it (fan-out = window_days, a constant), and one two-phase
    countDistinct per day finishes the job. One pass over the corpus at
    any scale; the shuffle carries (day, user) pairs pre-deduplicated
    map-side by the partial aggregate. Report days are restricted to
    days that actually appear in the data.
    """
    ev = events.select(
        F.to_date(F.col(ts_col)).alias("event_day"),
        F.col(user_col).alias("u"),
    )
    expl = ev.select(
        F.explode(
            F.expr(
                f"sequence(event_day, date_add(event_day, {window_days - 1}),"
                " interval 1 day)"
            )
        ).alias("day"),
        "u",
    )
    wau = expl.groupBy("day").agg(F.countDistinct("u").alias("wau"))
    dau = ev.groupBy(F.col("event_day").alias("day")).agg(
        F.countDistinct("u").alias("dau")
    )
    # inner join on dau restricts output to observed days (trailing
    # windows that extend past the last data day never report)
    out = wau.join(dau, "day").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("wau").cast("long").alias("wau"),
        F.col("dau").cast("long").alias("dau"),
        F.round(F.col("dau").cast("double") / F.col("wau").cast("double"), 6).alias(
            "stickiness"
        ),
    )
    return out.orderBy("day")
