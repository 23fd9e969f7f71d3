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
