"""Canonical schemas + table loading helpers.

Data model mapping (SURVEY.md §1.4): the reference's single SQLite
``documents`` table (id, text, metadata JSON-string, embedding float32 BLOB,
created_at) maps to Parquet-backed DataFrames with
``embedding: array<float>`` — columnar, prunable, Arrow-transferable.
Reference DDL: /root/reference/vectolite.py:59-79.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Engine-native store schema (reference parity: vectolite.py:61-71, §1.4).
DOCUMENT_STORE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), nullable=False),
        T.StructField("text", T.StringType(), nullable=False),
        T.StructField("metadata", T.StringType(), nullable=True),  # JSON object string
        T.StructField("embedding", T.ArrayType(T.FloatType()), nullable=False),
        T.StructField("created_at", T.TimestampType(), nullable=False),
    ]
)


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan; Catalyst handles column pruning + filter pushdown.

    ``events.ts`` may be physically TIMESTAMP(NANOS) (which Spark's
    vectorized reader rejects) or plain TIMESTAMP(MICROS) depending on how
    the fixture was written. With the legacy conf set, a nanos column reads
    as nanos-long and we normalize to a microsecond TimestampType (integer
    div — no double round-trip, which would lose precision above 2^53 ns);
    a micros column reads as TIMESTAMP_NTZ and is cast to TimestampType.
    Either way downstream code sees a TimestampType ``ts``; with the session
    timezone pinned to UTC (session.py) the cast is value-preserving and
    epoch-based query results match the DuckDB oracle bit-for-bit.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        from pyspark.sql import functions as F

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
        return df
    return spark.read.parquet(table_path(sf_dir, name))
