"""File-ingest pipeline (U5) end-to-end into the store."""

from __future__ import annotations

import json

import pytest

from vectolite_spark.chunk import chunk_text
from vectolite_spark.embed import stub_embedder
from vectolite_spark.errors import VectoliteError
from vectolite_spark.ingest import ingest_files, read_files, validate_file_path
from vectolite_spark.store import SparkVectolite


def test_validate_file_path(tmp_path):
    f = tmp_path / "doc.txt"
    f.write_text("hello")
    assert validate_file_path(str(f)) == str(f)
    with pytest.raises(VectoliteError, match="does not exist"):
        validate_file_path(str(tmp_path / "missing.txt"))
    with pytest.raises(VectoliteError, match="not a file"):
        validate_file_path(str(tmp_path))
    bad = tmp_path / "doc.pdf"
    bad.write_text("x")
    with pytest.raises(VectoliteError, match="Unsupported file type"):
        validate_file_path(str(bad))


def test_ingest_file_chunks_and_metadata(spark, tmp_path):
    text = "\n\n".join(f"paragraph number {i} with some words" for i in range(30))
    f = tmp_path / "doc.md"
    f.write_text(text)
    store = SparkVectolite(spark, str(tmp_path / "db"), embed_fn=stub_embedder(dim=8))
    n = ingest_files(
        store, str(f), base_metadata={"project": "x", "v": 2},
        max_chars=100, overlap=20, embed_dim=8,
    )
    expected_chunks = chunk_text(text, 100, 20)
    assert n == len(expected_chunks) > 1
    assert store.count_documents() == n
    docs = store.list_documents(limit=1000)
    metas = sorted((d["metadata"] for d in docs), key=lambda m: m["chunk_index"])
    assert [m["chunk_index"] for m in metas] == list(range(n))
    assert all(m["total_chunks"] == n for m in metas)
    assert all(m["filename"] == "doc.md" and m["source"].endswith("doc.md") for m in metas)
    assert all(m["project"] == "x" and m["v"] == 2 for m in metas)  # typed round-trip
    # chunk texts stored in order and queryable
    got = store.query(expected_chunks[0], top_k=1)[0]
    assert got["text"] == expected_chunks[0]
    assert got["score"] == pytest.approx(1.0)


def test_ingest_no_chunk_whole_file(spark, tmp_path):
    f = tmp_path / "whole.txt"
    f.write_text("one\n\ntwo\n\nthree")
    store = SparkVectolite(spark, str(tmp_path / "db2"), embed_fn=stub_embedder(dim=8))
    n = ingest_files(store, str(f), chunk=False, embed_dim=8)
    assert n == 1
    d = store.list_documents()[0]
    assert d["metadata"]["total_chunks"] == 1 and d["metadata"]["chunk_index"] == 0


def test_ingest_glob_multiple_files(spark, tmp_path):
    for i in range(3):
        (tmp_path / f"f{i}.txt").write_text(f"file {i} body\n\nsecond para {i}")
    store = SparkVectolite(spark, str(tmp_path / "db3"), embed_fn=stub_embedder(dim=8))
    n = ingest_files(store, str(tmp_path / "f*.txt"), embed_dim=8)
    assert n == 3  # each file fits in one chunk
    names = {d["metadata"]["filename"] for d in store.list_documents()}
    assert names == {"f0.txt", "f1.txt", "f2.txt"}


def test_read_files_schema(spark, tmp_path):
    f = tmp_path / "a.txt"
    f.write_text("body text")
    df = read_files(spark, str(f))
    r = df.first()
    assert r["filename"] == "a.txt" and r["text"] == "body text"
