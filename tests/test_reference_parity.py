"""End-to-end differential parity: the REAL reference engine (sqlite-backed,
imported from /root/reference with CLI deps stubbed) vs SparkVectolite on
identical corpora, embedders, and queries (SURVEY.md §5.2 item 2).

This is the strongest parity gate: both engines ingest the same texts with
the same deterministic embedder and must return the same ids, scores (4dp,
the reference's display precision), texts, and metadata for the same
queries — including tie-break and zero-vector semantics.
"""

from __future__ import annotations

import sys
import types

import pytest

from vectolite_spark.embed import stub_embedder
from vectolite_spark.store import SparkVectolite


@pytest.fixture(scope="module")
def ref_cls():
    for name in ("typer", "rich", "rich.console"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["typer"].Typer = lambda *a, **k: types.SimpleNamespace(
        command=lambda *a, **k: (lambda f: f)
    )
    sys.modules["typer"].BadParameter = ValueError
    sys.modules["typer"].Option = lambda *a, **k: None
    sys.modules["typer"].Argument = lambda *a, **k: None
    sys.modules["rich"].print = print
    sys.modules["rich.console"].Console = lambda *a, **k: types.SimpleNamespace()
    sys.path.insert(0, "/root/reference")
    import vectolite as ref

    yield ref.Vectolite
    sys.path.remove("/root/reference")


CORPUS = [
    ("alpha beta gamma delta", {"idx": 0, "nested": {"a": [1, True, None]}}),
    ("epsilon zeta eta theta", {"idx": 1}),
    ("iota kappa lambda mu", None),
    ("alpha beta gamma delta epsilon", {"idx": 3}),
    ("completely different text here", {"idx": 4}),
    ("alpha beta gamma delta", {"idx": 5}),  # exact dup text -> same vector
]

QUERIES = ["alpha beta gamma delta", "iota kappa lambda mu", "unrelated query words"]


def test_query_results_match_reference(ref_cls, spark, tmp_path):
    embed = stub_embedder(dim=32)
    ref_db = ref_cls(str(tmp_path / "ref.db"), embed_fn=embed)
    ours = SparkVectolite(spark, str(tmp_path / "ours"), embed_fn=embed)
    for text, meta in CORPUS:
        rid = ref_db.insert(text, meta)
        oid = ours.insert(text, meta)
        assert rid == oid  # same autoincrement contract

    for q in QUERIES:
        for k in (1, 3, 10):
            r = ref_db.query(q, top_k=k)
            o = ours.query(q, top_k=k)
            assert [d["id"] for d in o] == [d["id"] for d in r], (q, k)
            for ro, oo in zip(r, o):
                assert round(oo["score"], 4) == round(ro["score"], 4)
                assert oo["text"] == ro["text"]
                assert oo["metadata"] == ro["metadata"]


def test_crud_surface_matches_reference(ref_cls, spark, tmp_path):
    embed = stub_embedder(dim=16)
    ref_db = ref_cls(str(tmp_path / "ref2.db"), embed_fn=embed)
    ours = SparkVectolite(spark, str(tmp_path / "ours2"), embed_fn=embed)
    for text, meta in CORPUS[:4]:
        ref_db.insert(text, meta)
        ours.insert(text, meta)

    assert ours.count_documents() == ref_db.count_documents() == 4
    # point lookup parity (id, text, metadata)
    r, o = ref_db.get_document(2), ours.get_document(2)
    assert (o["id"], o["text"], o["metadata"]) == (r["id"], r["text"], r["metadata"])
    assert ref_db.get_document(99) is None and ours.get_document(99) is None
    # delete parity incl. found/not-found bool
    assert ref_db.delete_document(3) is True and ours.delete_document(3) is True
    assert ref_db.delete_document(3) is False and ours.delete_document(3) is False
    assert ours.count_documents() == ref_db.count_documents() == 3
    # empty-text rejection parity (both raise their VectoliteError)
    import vectolite as ref_mod

    from vectolite_spark.errors import VectoliteError

    with pytest.raises(ref_mod.VectoliteError):
        ref_db.insert("   ")
    with pytest.raises(VectoliteError):
        ours.insert("   ")


def test_zero_vector_and_negative_scores_match(ref_cls, spark, tmp_path):
    # an embedder that can emit a zero vector and anti-parallel vectors
    def embed(texts):
        out = []
        for t in texts:
            if t == "zero":
                out.append([0.0, 0.0, 0.0])
            elif t == "anti":
                out.append([-1.0, -1.0, -1.0])
            else:
                out.append([1.0, 1.0, 1.0])
        return out

    ref_db = ref_cls(str(tmp_path / "ref3.db"), embed_fn=embed)
    ours = SparkVectolite(spark, str(tmp_path / "ours3"), embed_fn=embed)
    for t in ["plain", "zero", "anti"]:
        ref_db.insert(t)
        ours.insert(t)
    r = ref_db.query("plain", top_k=3)
    o = ours.query("plain", top_k=3)
    assert [d["id"] for d in o] == [d["id"] for d in r]
    assert [round(d["score"], 4) for d in o] == [round(d["score"], 4) for d in r]
    # zero-norm guard -> 0.0; anti-parallel -> -1.0 (negative preserved)
    by_text = {d["text"]: d["score"] for d in o}
    assert by_text["zero"] == 0.0
    assert by_text["anti"] == pytest.approx(-1.0, abs=1e-6)


def test_constraint_audit_shape_and_findings(spark, sf_dir):
    """Seven checks, violations <= checked everywhere, the known-clean
    constraints report zero, and the two genuinely-violated ones (dup
    PKs, ship-before-order) report non-zero on the synthetic corpus."""
    from vectolite_spark.registry import QUERIES

    rows = {r["check_name"]: r for r in
            QUERIES["constraint_audit"](spark, sf_dir).collect()}
    assert len(rows) == 7
    for r in rows.values():
        assert 0 <= r["violations"] <= r["checked"]
    for clean in ("fk_lineitem_orders", "range_quantity_1_50",
                  "range_discount_0_0.1", "nonneg_extendedprice",
                  "complete_document_text"):
        assert rows[clean]["violations"] == 0, clean
    assert rows["pk_unique_orderkey_linenumber"]["violations"] > 0
    assert rows["temporal_ship_after_order"]["violations"] > 0
