"""CDF-driven index maintenance: the watermark lifecycle that keeps a
persisted index in step with a SnapshotStore (VERDICT r7 item 6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectolite_spark.errors import VectoliteError
from vectolite_spark.operators.index_sync import (
    index_watermark,
    set_index_watermark,
    sync_ivf_index,
    sync_trigram_index,
)
from vectolite_spark.snapshots import SnapshotStore


@pytest.fixture()
def store(spark, tmp_path):
    return SnapshotStore(spark, str(tmp_path / "table"))


def _vecs(spark, ids):
    return spark.createDataFrame(
        [(i, i % 2, [float(i), 1.0, 0.0]) for i in ids],
        "vec_id long, label int, embedding array<float>",
    )


def test_sync_ivf_consumes_exactly_the_delta(store, spark, tmp_path):
    from vectolite_spark.operators.ann import build_ivf_index, load_ivf_index

    idx = str(tmp_path / "ivf")
    v0 = store.append(_vecs(spark, range(0, 6)))
    build_ivf_index(store.read(v0), idx, cluster_col="label")
    assert index_watermark(spark, idx) == -1
    set_index_watermark(spark, idx, v0)
    assert index_watermark(spark, idx) == v0

    # two delta commits, ONE sync window
    store.append(_vecs(spark, range(6, 9)))
    v2 = store.append(_vecs(spark, range(9, 12)))
    out = sync_ivf_index(store, idx)
    assert out == {"v_from": v0, "v_to": v2, "n_rows": 6}
    assert index_watermark(spark, idx) == v2

    cells = load_ivf_index(spark, idx).cells()
    got = sorted(r["vec_id"] for r in cells.collect())
    assert got == list(range(12))  # nothing lost, nothing doubled

    # idempotent no-op when already current
    assert sync_ivf_index(store, idx)["n_rows"] == 0


def test_sync_refuses_unbound_index_and_rewrite_windows(
    store, spark, tmp_path
):
    from vectolite_spark.operators.ann import build_ivf_index

    idx = str(tmp_path / "ivf")
    v0 = store.append(_vecs(spark, range(0, 4)))
    build_ivf_index(store.read(v0), idx, cluster_col="label")
    with pytest.raises(VectoliteError, match="watermark"):
        sync_ivf_index(store, idx)  # never bound
    set_index_watermark(spark, idx, v0)

    store.append(_vecs(spark, range(4, 6)))
    store.compact(target_files=2)  # rewrite inside the window
    with pytest.raises(VectoliteError, match="rewrite"):
        sync_ivf_index(store, idx)
    # the refusal did NOT advance the watermark: rebuild + fast-forward
    assert index_watermark(spark, idx) == v0


def test_sync_srp_and_ivfpq_consume_exactly_the_delta(
    store, spark, tmp_path
):
    """The SRP and IVF-PQ families on the watermark loop: after a sync
    spanning two commits, each index's cells hold exactly the current
    table's ids — nothing lost, nothing doubled — and the IVF-PQ delta
    rows carry frozen-codebook codes of the right shape."""
    from vectolite_spark.operators.ann import (
        build_ivfpq_index,
        build_srp_index,
    )
    from vectolite_spark.operators.index_sync import (
        sync_ivfpq_index,
        sync_srp_index,
    )

    def _vecs8(ids):
        return spark.createDataFrame(
            [
                (i, i % 2, [float(i % 7), 1.0, float(i % 3), 0.5] * 2)
                for i in ids
            ],
            "vec_id long, label int, embedding array<float>",
        )

    v0 = store.append(_vecs8(range(0, 20)))
    srp, ivfpq = str(tmp_path / "srp"), str(tmp_path / "ivfpq")
    build_srp_index(store.read(v0), srp, n_tables=2, n_planes=3)
    build_ivfpq_index(store.read(v0), ivfpq, cluster_col="label", m=4)
    set_index_watermark(spark, srp, v0)
    set_index_watermark(spark, ivfpq, v0)
    store.append(_vecs8(range(20, 26)))
    v2 = store.append(_vecs8(range(26, 30)))
    assert sync_srp_index(store, srp) == {
        "v_from": v0, "v_to": v2, "n_rows": 10,
    }
    assert sync_ivfpq_index(store, ivfpq, m=4) == {
        "v_from": v0, "v_to": v2, "n_rows": 10,
    }
    # SRP: every id present in every table's bucketing (2 tables)
    srp_rows = spark.read.parquet(f"{srp}/cells").collect()
    assert len(srp_rows) == 30 * 2
    assert sorted({r["vec_id"] for r in srp_rows}) == list(range(30))
    # IVF-PQ: one row per vector, codes of m subspaces, no dups
    pq_rows = spark.read.parquet(f"{ivfpq}/cells").collect()
    assert sorted(r["vec_id"] for r in pq_rows) == list(range(30))
    assert all(len(r["codes"]) == 4 for r in pq_rows)
    # appending with a mismatched m must refuse, not mix code lengths
    import pytest

    from vectolite_spark.operators.ann import ivfpq_index_append

    with pytest.raises(ValueError, match="stores 4-code"):
        ivfpq_index_append(spark, ivfpq, _vecs8(range(30, 32)), m=8)


def test_sync_bm25_matches_rebuild(store, spark, tmp_path):
    """CDF-synced BM25: two delta commits fold through one watermark
    window and the served scores equal a from-scratch rebuild over the
    current table."""
    from vectolite_spark.operators.retrieval import (
        BM25Index,
        build_bm25_index,
    )
    from vectolite_spark.operators.index_sync import sync_bm25_index

    docs = [
        (i, f"term{i % 4} shared word filler{i}") for i in range(1, 13)
    ]

    def _df(lo, hi):
        return spark.createDataFrame(
            [d for d in docs if lo <= d[0] < hi], "doc_id long, text string"
        )

    idx = str(tmp_path / "bm25")
    v0 = store.append(_df(1, 7))
    build_bm25_index(store.read(v0), idx, n_buckets=4)
    set_index_watermark(spark, idx, v0)
    store.append(_df(7, 10))
    v2 = store.append(_df(10, 13))
    assert sync_bm25_index(store, idx) == {
        "v_from": v0, "v_to": v2, "n_rows": 6,
    }
    full = str(tmp_path / "bm25_full")
    build_bm25_index(store.read(), full, n_buckets=4)
    terms = ["shared", "term1", "term2"]
    got = sorted(
        (r["doc_id"], r["score"])
        for r in BM25Index(spark, idx).scores(terms).collect()
    )
    want = sorted(
        (r["doc_id"], r["score"])
        for r in BM25Index(spark, full).scores(terms).collect()
    )
    assert got == want and len(got) == 12


def test_rebuild_and_fast_forward_recovers_from_rewrite(
    store, spark, tmp_path
):
    """A rewrite commit inside the window makes sync refuse; the
    documented recovery — rebuild over the current snapshot and
    fast-forward the watermark — restores the loop: the next append
    syncs as a plain delta again."""
    from vectolite_spark.operators.ann import build_ivf_index, load_ivf_index
    from vectolite_spark.operators.index_sync import (
        rebuild_and_fast_forward,
        sync_ivf_index,
    )

    idx = str(tmp_path / "ivf")
    v0 = store.append(_vecs(spark, range(0, 8)))
    build_ivf_index(store.read(v0), idx, cluster_col="label")
    set_index_watermark(spark, idx, v0)
    store.append(_vecs(spark, range(8, 10)))
    store.compact(target_files=2)  # rewrite: moved rows, not inserts
    with pytest.raises(VectoliteError, match="rewrite"):
        sync_ivf_index(store, idx)
    out = rebuild_and_fast_forward(
        store, idx,
        lambda df, p: build_ivf_index(df, p, cluster_col="label"),
    )
    assert out == {"version": store.current_version(), "n_rows": 10}
    assert index_watermark(spark, idx) == store.current_version()
    got = sorted(
        r["vec_id"] for r in load_ivf_index(spark, idx).cells().collect()
    )
    assert got == list(range(10))  # rebuild covered the rewrite exactly
    # the loop is live again: a later append folds in as a plain delta
    v_next = store.append(_vecs(spark, range(10, 12)))
    assert sync_ivf_index(store, idx)["n_rows"] == 2
    assert index_watermark(spark, idx) == v_next


def test_sync_trigram_serves_delta_and_guards_replay(store, spark, tmp_path):
    from vectolite_spark.operators.retrieval import (
        TrigramIndex,
        build_trigram_index,
    )

    docs = [
        (1, "alpha vector scan engine"),
        (2, "window aggregation pass"),
        (3, "vector scan again here"),
        (4, "completely unrelated text"),
        (5, "late vector scan arrival"),
        (6, "another window aggregation"),
    ]

    def _df(ids):
        return spark.createDataFrame(
            [d for d in docs if d[0] in ids], "doc_id long, text string"
        )

    idx = str(tmp_path / "trgm")
    v0 = store.append(_df({1, 2}))
    build_trigram_index(store.read(v0), idx, id_col="doc_id", n_buckets=4)
    set_index_watermark(spark, idx, v0)
    store.append(_df({3, 4}))
    v2 = store.append(_df({5, 6}))
    out = sync_trigram_index(store, idx)
    assert out == {"v_from": v0, "v_to": v2, "n_rows": 4}

    served = TrigramIndex(spark, idx).search(store.read(), "vector scan")
    assert sorted(r["doc_id"] for r in served.collect()) == [1, 3, 5]

    # a replayed window (watermark manually rolled back, as after a
    # partial crash) hits the id-overlap guard instead of corrupting df
    set_index_watermark(spark, idx, v0)
    with pytest.raises(ValueError, match="already indexed"):
        sync_trigram_index(store, idx)
