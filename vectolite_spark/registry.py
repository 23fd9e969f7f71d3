"""Query registry: every implemented operator as a (spark, sf_dir) -> DataFrame
callable paired with a DuckDB oracle SQL string (driver contract, see
``__spark_entry__.py``).

Conventions that make the oracle hash-match deterministic:
- every computed column is aliased identically in Spark and SQL;
- doubles are rounded (6 dp scores, 2 dp money) on BOTH sides;
- sums over money use exact DECIMAL accumulation cast back to DOUBLE;
- every top-k / limit has an explicit total-order tie-break;
- timestamps leave the result as epoch seconds (BIGINT) — timezone-proof.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectolite_spark.operators import topk as topk_op
from vectolite_spark.schema import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            from vectolite_spark.session import ensure_shipped

            ensure_shipped(spark)  # python workers must import this package
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _query_vector(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list[float]:
    """The 'embed the query' step (reference vectolite.py:141) — driver-side,
    one tiny lookup; the vector ships into the plan as a literal."""
    row = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == vec_id)
        .select("embedding")
        .first()
    )
    return [float(x) for x in row["embedding"]]


# --------------------------------------------------------------------------
# Flagship: exact brute-force cosine top-k (SURVEY.md §2.3)
# --------------------------------------------------------------------------

_COSINE_SCORED = """
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
),
scored AS (
  SELECT e.vec_id,
         ROUND(
           CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])) = 0
                  OR list_dot_product(q.qv, q.qv) = 0
                THEN 0.0
                ELSE list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                     / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])))
                        * sqrt(list_dot_product(q.qv, q.qv)))
           END, 6) AS score
  FROM embeddings e CROSS JOIN q
)
"""


@register(
    "flagship_topk",
    _COSINE_SCORED
    + """
, top AS (
  SELECT vec_id, score FROM scored ORDER BY score DESC, vec_id ASC LIMIT 10
)
SELECT d.doc_id, t.score, d.lang, d.source, d.text
FROM top t JOIN documents d ON d.doc_id = t.vec_id
""",
)
def flagship_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    qvec = _query_vector(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    embs = load_table(spark, sf_dir, "embeddings")
    return topk_op.topk_search(docs, embs, qvec, k=10)


@register(
    "topk_filtered",
    _COSINE_SCORED
    + """
, eligible AS (
  SELECT s.vec_id, s.score FROM scored s
  JOIN documents d ON d.doc_id = s.vec_id
  WHERE d.lang = 'en'
),
top AS (
  SELECT vec_id, score FROM eligible ORDER BY score DESC, vec_id ASC LIMIT 10
)
SELECT d.doc_id, t.score, d.lang, d.source, d.text
FROM top t JOIN documents d ON d.doc_id = t.vec_id
""",
)
def topk_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered semantic search (SURVEY.md §2.9 extension)."""
    qvec = _query_vector(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    embs = load_table(spark, sf_dir, "embeddings")
    return topk_op.topk_search(docs, embs, qvec, k=10, doc_filter=F.col("lang") == "en")


# --------------------------------------------------------------------------
# Reference CRUD parity (SURVEY.md §2.1-2.4)
# --------------------------------------------------------------------------


@register(
    "count_documents",
    "SELECT COUNT(*) AS n_docs FROM documents",
)
def count_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: SELECT COUNT(*) (vectolite.py:176-184)."""
    return load_table(spark, sf_dir, "documents").agg(F.count(F.lit(1)).alias("n_docs"))


@register(
    "point_lookup",
    """
SELECT doc_id, text, lang, source, n_chars FROM documents WHERE doc_id = 42
""",
)
def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: equality-predicate point lookup (vectolite.py:268-298); the
    predicate is pushed into the parquet scan (row-group stats skipping)."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") == 42)
        .select("doc_id", "text", "lang", "source", "n_chars")
    )


@register(
    "pagination",
    """
SELECT event_id, epoch_us(ts) AS ts_us, event_type, ROUND(value, 6) AS value
FROM events
ORDER BY ts DESC, event_id DESC
LIMIT 50 OFFSET 100
""",
)
def pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: ORDER BY ... DESC LIMIT/OFFSET pagination (vectolite.py:201-266),
    with an explicit id tie-break (reference leaves same-second order
    unspecified). Timestamps surface as epoch microseconds — timezone-proof
    against the oracle."""
    from vectolite_spark.operators.relational import list_documents  # noqa: F401

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.orderBy(F.desc("ts"), F.desc("event_id"))
        .offset(100)
        .limit(50)
        .select(
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "event_type",
            F.round("value", 6).alias("value"),
        )
    )


@register(
    "projection_truncate",
    """
SELECT doc_id,
       CASE WHEN length(text) > 100 THEN substr(text, 1, 100) || '...'
            ELSE text END AS text_preview,
       length(text) AS full_text_length
FROM documents
""",
)
def projection_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+F2+F3: list-documents projection with the reference's truncation
    (text[:n] + '...' iff longer; vectolite.py:241-249)."""
    from vectolite_spark.operators.relational import truncate_text

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        truncate_text("text", 100).alias("text_preview"),
        F.length("text").alias("full_text_length"),
    )


@register(
    "delete_as_filter",
    "SELECT doc_id, n_chars FROM documents WHERE doc_id <> 42",
)
def delete_as_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: delete as immutable anti-filter rewrite (vectolite.py:186-199)."""
    from vectolite_spark.operators.relational import delete_where

    docs = load_table(spark, sf_dir, "documents")
    return delete_where(docs, F.col("doc_id") == 42).select("doc_id", "n_chars")


@register("chunk_documents")  # rows-only: greedy chunker is not SQL-expressible;
# its oracle is the differential test suite vs the executed reference
# implementation (tests/test_chunk.py)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1+U5: chunk-explode pipeline. Documents are single-paragraph, so we
    synthesize paragraph structure (text repeated 3x blank-line-joined) to
    exercise packing + overlap carry, then chunk at max_chars=300."""
    from vectolite_spark.chunk import explode_chunks

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws("\n\n", "text", "text", "text").alias("text"),
    )
    out = explode_chunks(docs, max_chars=300, overlap=30)
    return out.select(
        "doc_id",
        "chunk_index",
        "total_chunks",
        F.length("chunk_text").alias("chunk_len"),
    )


# --------------------------------------------------------------------------
# Relational engine coverage: aggregation / joins / windows / set ops
# (SURVEY.md §2.9 — gaps in the reference that the Spark engine fills)
# --------------------------------------------------------------------------

# orders/lineitem timestamps are parquet isAdjustedToUTC=false -> Spark reads
# TIMESTAMP_NTZ, DuckDB reads naive TIMESTAMP: compare wall-clock to wall-clock
# (NTZ literal), which no session timezone can shift.
_SHIP_CUTOFF = "1999-01-01 00:00:00"


def _dec(c: str):
    return F.col(c).cast("decimal(18,2)")


@register(
    "agg_pricing_summary",
    f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_SHIP_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
""",
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped grouped aggregation. Money sums accumulate in exact
    DECIMAL (order-independent) then cast to double; the shipdate filter is
    epoch-based (timezone-proof) and pushed into the parquet scan. Partial
    (map-side) aggregation halves the shuffle: only 4ish groups move."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit(_SHIP_CUTOFF).cast("timestamp_ntz")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
        .cast("double")
        .alias("sum_disc_price"),
        F.round(
            F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_qty"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "join_revenue_by_nation",
    """
SELECT n.n_name AS nation,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
)
def join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped multi-way join. nation (25 rows) and customer are
    broadcast — zero shuffle for those joins; only lineitem<->orders shuffles
    on orderkey, and AQE re-plans it at runtime. Revenue in exact DECIMAL."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


@register(
    "window_top_orders",
    """
SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
)
WHERE rn <= 3
""",
)
def window_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-n (window row_number), the grouped generalization of
    the reference's global top-k slice (vectolite.py:171)."""
    from vectolite_spark.operators.windows import topn_per_group

    orders = load_table(spark, sf_dir, "orders")
    return topn_per_group(
        orders,
        partition_by=["o_custkey"],
        order_by=[F.desc("o_totalprice"), F.asc("o_orderkey")],
        n=3,
    ).select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.col("rn").cast("long").alias("rn"),
    )


@register(
    "sessionize_events",
    """
WITH ordered AS (
  SELECT user_id, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
  FROM events
)
SELECT user_id,
       CAST(SUM(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM ordered
GROUP BY user_id
""",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) via lag window on epoch micros;
    one shuffle on user_id."""
    from vectolite_spark.operators.windows import sessionize

    ev = load_table(spark, sf_dir, "events")
    s = sessionize(ev, gap_seconds=1800)
    return s.groupBy("user_id").agg(
        F.max("session_id").cast("long").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "events_window_agg",
    """
SELECT epoch_us(ts) // 3600000000 AS hour_bucket,
       event_type,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_value
FROM events
GROUP BY hour_bucket, event_type
""",
)
def events_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h event-time window aggregation (epoch-bucketed — the batch
    twin of the Structured Streaming windowed agg in streaming/)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.expr("unix_micros(ts) div 3600000000").alias("hour_bucket"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4).alias(
            "sum_value"
        ),
    )


@register(
    "customers_without_orders",
    """
SELECT c_custkey FROM customer
EXCEPT
SELECT o_custkey AS c_custkey FROM orders
""",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference, planned as a broadcast left-anti join (no full
    shuffle of the big side when the subtrahend is small)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        F.broadcast(orders.select(F.col("o_custkey").alias("c_custkey"))),
        "c_custkey",
        "left_anti",
    ).select("c_custkey").distinct()


@register(
    "grouped_doc_stats",
    """
SELECT lang,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT source) AS n_sources,
       ROUND(CAST(SUM(CAST(n_chars AS DECIMAL(18,0))) AS DOUBLE) / COUNT(*), 6) AS avg_chars,
       MIN(n_chars) AS min_chars,
       MAX(n_chars) AS max_chars
FROM documents
GROUP BY lang
""",
)
def grouped_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats (text-analysis aggregate, SURVEY.md §2.9)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.round(
            F.sum(F.col("n_chars").cast("decimal(18,0)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "batch_topk",
    """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id % 100 = 0
),
scored AS (
  SELECT q.query_id, e.vec_id,
         ROUND(
           CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])) = 0
                  OR list_dot_product(q.qv, q.qv) = 0
                THEN 0.0
                ELSE list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                     / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])))
                        * sqrt(list_dot_product(q.qv, q.qv)))
           END, 6) AS score
  FROM embeddings e CROSS JOIN q
),
ranked AS (
  SELECT query_id, vec_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, vec_id ASC) AS rn
  FROM scored
)
SELECT query_id, vec_id, score, rn FROM ranked WHERE rn <= 5
""",
)
def batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Many-query similarity join (SURVEY.md §2.3 batch variant): broadcast
    query set x embeddings, one shuffle on query_id for per-group top-k."""
    from vectolite_spark.operators.topk import topk_batch

    embs = load_table(spark, sf_dir, "embeddings")
    queries = embs.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = topk_batch(queries, embs, k=5)
    return out.select(
        "query_id", "vec_id", "score", F.col("rn").cast("long").alias("rn")
    )


@register(
    "json_access",
    """
SELECT json_extract_string(props, '$.k') AS k_val,
       COUNT(*) AS n_events,
       ROUND(SUM(CAST(value AS DECIMAL(18, 6)))::DOUBLE, 4) AS sum_value
FROM events
GROUP BY k_val
""",
)
def json_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/F5: JSON metadata field access (vectolite.py:168,250) + group-agg.
    Sums accumulate in exact DECIMAL on both engines, then cast to double —
    bit-identical regardless of partial-aggregation order."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.get_json_object("props", "$.k").alias("k_val")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4
        ).alias("sum_value"),
    )
