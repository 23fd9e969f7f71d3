"""Embedding providers (SURVEY.md §2.6 U2-U4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectolite_spark.embed import embed_column, local_embedder, openai_embedder, stub_embedder
from vectolite_spark.errors import EmbeddingError


def test_stub_embedder_deterministic():
    e = stub_embedder(dim=16)
    a, b = e(["same text"]), e(["same text", "other"])
    assert a[0] == b[0]
    assert len(b[1]) == 16 and a[0] != b[1]


def test_gated_providers_raise_clear_error():
    # deps absent in this container -> EmbeddingError, same contract as the
    # reference's missing-dependency path (vectolite.py:313-318)
    with pytest.raises(EmbeddingError):
        local_embedder()(["x"])
    with pytest.raises(EmbeddingError):
        openai_embedder()(["x"])


def test_embed_column_matches_driver_side_stub(spark):
    df = spark.createDataFrame([(i, f"text {i}") for i in range(50)], "id long, text string")
    out = df.withColumn("embedding", embed_column("stub", dim=8)(F.col("text")))
    rows = {r["id"]: list(r["embedding"]) for r in out.collect()}
    expected = stub_embedder(dim=8)([f"text {i}" for i in range(50)])
    for i in range(50):
        assert rows[i] == pytest.approx(expected[i])
