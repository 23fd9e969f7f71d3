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
    """Parquet scan; Catalyst handles column pruning + filter pushdown."""
    return spark.read.parquet(table_path(sf_dir, name))
