"""Dynamic micro-batching serving layer: concurrent callers coalesce
into one topk_batch job and every caller gets exactly the flagship
per-query answer (no cross-query leakage, deterministic ordering)."""

from __future__ import annotations

import threading

from pyspark.sql import functions as F

from vectolite_spark.operators.topk import topk_ids
from vectolite_spark.schema import load_table
from vectolite_spark.serving import MicroBatcher

SF = "/root/testdata/sf0.001"


def test_microbatcher_matches_per_query_path(spark):
    embs = load_table(spark, SF, "embeddings").cache()
    embs.count()
    qvecs = [
        [float(x) for x in r["embedding"]]
        for r in embs.orderBy("vec_id").limit(8).collect()
    ]
    want = {
        i: [
            (r["vec_id"], float(r["score"]))
            for r in topk_ids(embs, qv, 5).collect()
        ]
        for i, qv in enumerate(qvecs)
    }

    mb = MicroBatcher(embs, k=5, max_batch=8, max_wait_ms=30)
    got: dict[int, list] = {}
    errs: list[Exception] = []

    def client(i: int) -> None:
        try:
            got[i] = mb.query(qvecs[i])
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert got == want
    embs.unpersist()


def test_microbatcher_single_query_and_overflow(spark):
    embs = load_table(spark, SF, "embeddings").cache()
    embs.count()
    qv = [float(x) for x in embs.first()["embedding"]]
    want = [
        (r["vec_id"], float(r["score"])) for r in topk_ids(embs, qv, 3).collect()
    ]
    # a lone query still serves (pays at most max_wait extra)
    mb = MicroBatcher(embs, k=3, max_batch=4, max_wait_ms=5)
    assert mb.query(qv) == want
    # more clients than max_batch: overflow rolls into a second cycle,
    # every caller still gets the right answer
    got = []
    lock = threading.Lock()

    def client() -> None:
        r = mb.query(qv)
        with lock:
            got.append(r)

    threads = [threading.Thread(target=client) for _ in range(10)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(got) == 10 and all(r == want for r in got)
    mb.close()
    import pytest

    with pytest.raises(RuntimeError):
        mb.query(qv)
    embs.unpersist()


def test_store_make_batcher(spark, tmp_path):
    from vectolite_spark.embed import stub_embedder
    from vectolite_spark.store import SparkVectolite

    store = SparkVectolite(
        spark, str(tmp_path / "sdb"), embed_fn=stub_embedder(dim=8)
    )
    store.insert_many([f"doc number {i}" for i in range(20)])
    mb = store.make_batcher(top_k=3)
    qv = [float(x) for x in store.embed_fn(["doc number 7"])[0]]
    got = mb.query(qv)
    want = [(d["id"], d["score"]) for d in store.query("doc number 7", top_k=3)]
    assert got == want
    mb.close()


def test_microbatcher_dispatch_failure_resets_latch(spark):
    """A batch job that throws must fail ITS waiters and reset the
    dispatch latch — the batcher stays usable for the next query
    (ADVICE r6: a pre-_run_batch throw used to wedge _dispatching=True
    and park every later caller forever)."""
    embs = load_table(spark, SF, "embeddings").cache()
    embs.count()
    qv = [float(x) for x in embs.first()["embedding"]]
    mb = MicroBatcher(embs, k=3, max_batch=4, max_wait_ms=5)
    want = mb.query(qv)

    boom = RuntimeError("injected batch failure")

    def broken(*_a):
        raise boom

    orig = mb._run_batch
    mb._run_batch = broken
    import pytest

    with pytest.raises(RuntimeError, match="injected"):
        mb.query(qv)
    # latch reset: a healthy dispatch cycle still serves afterwards
    mb._run_batch = orig
    assert mb.query(qv) == want
    embs.unpersist()


def test_microbatcher_close_wakes_parked_waiters(spark):
    """close() must error out already-parked waiters instead of leaving
    them blocked on events nobody will set (ADVICE r6)."""
    import time

    embs = load_table(spark, SF, "embeddings").cache()
    embs.count()
    qv = [float(x) for x in embs.first()["embedding"]]
    mb = MicroBatcher(embs, k=3, max_batch=64, max_wait_ms=200)
    outcomes: list[str] = []
    lock = threading.Lock()

    def client() -> None:
        try:
            mb.query(qv)
            with lock:
                outcomes.append("ok")
        except RuntimeError:
            with lock:
                outcomes.append("closed")

    threads = [threading.Thread(target=client) for _ in range(4)]
    for t in threads:
        t.start()
    time.sleep(0.05)  # let them park inside the accumulation window
    mb.close()
    for t in threads:
        t.join(timeout=30)
    assert not any(t.is_alive() for t in threads), "a waiter stayed parked"
    # every client finished — served by the live dispatcher's final batch
    # or failed with the close error; none hung
    assert len(outcomes) == 4
    embs.unpersist()


def test_store_batched_serving_facade_matches_exact_path(spark, tmp_path):
    """VERDICT r6 item 2: store.query routes through the MicroBatcher
    facade — N concurrent callers coalesce into FEWER dispatch cycles
    (one batch job each), every caller gets exactly the per-job path's
    answer (ids, scores, text, metadata), and smaller top_k slices the
    batcher's prefix."""
    from vectolite_spark.embed import stub_embedder
    from vectolite_spark.store import SparkVectolite

    store = SparkVectolite(
        spark, str(tmp_path / "sdb"), embed_fn=stub_embedder(dim=8)
    )
    store.insert_many(
        [f"facade doc number {i}" for i in range(30)],
        [{"k": i} for i in range(30)],
    )
    texts = [f"facade doc number {i}" for i in range(5)]
    want = {t: store.query(t, top_k=3) for t in texts}  # per-job path

    store.enable_batched_serving(top_k=5, max_wait_ms=40)
    batcher = store._ensure_serving_batcher()
    cycles: list[int] = []
    orig = batcher._run_batch

    def counting(qvecs, ks=None):
        cycles.append(len(qvecs))
        return orig(qvecs, ks)

    batcher._run_batch = counting

    got: dict[int, list] = {}
    errs: list[Exception] = []

    def client(i: int) -> None:
        try:
            got[i] = store.query(texts[i % 5], top_k=3)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert sum(cycles) == 8, "every query went through the facade"
    assert len(cycles) < 8, "concurrent callers coalesced into fewer jobs"
    for i, res in got.items():
        assert res == want[texts[i % 5]]
    # over-ceiling top_k falls through to the per-job path (still correct)
    assert store.query(texts[0], top_k=8) == store.query(texts[0], top_k=8)
    store.disable_batched_serving()


def test_store_batched_serving_filtered_queries(spark, tmp_path):
    """VERDICT r7 item 7: metadata-filtered queries ride the shared
    batcher via recall-safe over-fetch — concurrent filtered callers
    coalesce into fewer dispatch cycles, every answer equals the exact
    filtered job's, and provably-incomplete prefixes (too-selective
    filters) fall back to the exact path instead of under-returning."""
    from vectolite_spark.embed import stub_embedder
    from vectolite_spark.store import SparkVectolite

    store = SparkVectolite(
        spark, str(tmp_path / "fdb"), embed_fn=stub_embedder(dim=8)
    )
    texts = [f"filter doc number {i}" for i in range(40)]
    store.insert_many(
        texts, [{"tenant": f"t{i % 3}", "n": i} for i in range(40)]
    )
    probes = texts[:6]
    want = {
        (t, ten): store.query(t, top_k=3, metadata_filter={"tenant": ten})
        for t in probes
        for ten in ("t0", "t1")
    }
    want_n5 = store.query(probes[0], top_k=2, metadata_filter={"n": 5})
    assert want_n5, "fixture: the n=5 doc must exist"

    store.enable_batched_serving(top_k=5, max_wait_ms=40, filter_overfetch=4)
    batcher = store._ensure_serving_batcher()
    cycles: list[int] = []
    orig = batcher._run_batch

    def counting(qvecs, ks=None):
        cycles.append(len(qvecs))
        return orig(qvecs, ks)

    batcher._run_batch = counting

    got: dict[int, list] = {}
    errs: list[Exception] = []

    def client(i: int) -> None:
        t, ten = probes[i % 6], ("t0" if i % 2 else "t1")
        try:
            got[i] = store.query(t, top_k=3, metadata_filter={"tenant": ten})
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(12)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert sum(cycles) == 12, "every filtered query entered the facade"
    assert len(cycles) < 12, "concurrent filtered callers coalesced"
    for i, res in got.items():
        assert res == want[(probes[i % 6], "t0" if i % 2 else "t1")]
    # too-selective filters: single-match (falls back, stays exact) and
    # zero-match (returns empty, never invents rows)
    assert (
        store.query(probes[0], top_k=2, metadata_filter={"n": 5}) == want_n5
    )
    assert store.query(probes[0], top_k=3, metadata_filter={"tenant": "zz"}) == []
    store.disable_batched_serving()


def test_store_batched_serving_sees_mutations(spark, tmp_path):
    """Any mutation tears the batcher down; the next query rebuilds over
    the fresh snapshot — batched serving can never return stale results."""
    from vectolite_spark.embed import stub_embedder
    from vectolite_spark.store import SparkVectolite

    store = SparkVectolite(
        spark, str(tmp_path / "sdb2"), embed_fn=stub_embedder(dim=8)
    )
    store.insert_many([f"warm doc number {i}" for i in range(10)])
    store.enable_batched_serving(top_k=3, max_wait_ms=5)
    before = store.query("a brand new probe text", top_k=1)
    new_id = store.insert("a brand new probe text")  # invalidates serving
    after = store.query("a brand new probe text", top_k=1)
    assert after[0]["id"] == new_id and after[0]["score"] == 1.0
    assert before[0]["id"] != new_id
    store.disable_batched_serving()


def test_batched_serving_on_versioned_store(spark, tmp_path):
    """The facade works over the snapshot-versioned backend too: its
    df() reads through manifests, and a versioned mutation (a snapshot
    commit) still tears the batcher down before the next query."""
    from vectolite_spark.embed import stub_embedder
    from vectolite_spark.store import SparkVectolite

    store = SparkVectolite(
        spark, str(tmp_path / "vdb"), embed_fn=stub_embedder(dim=8),
        versioned=True,
    )
    store.insert_many([f"versioned doc number {i}" for i in range(12)])
    want = store.query("versioned doc number 3", top_k=2)
    store.enable_batched_serving(top_k=5, max_wait_ms=5)
    assert store.query("versioned doc number 3", top_k=2) == want
    new_id = store.insert("a versioned probe text")
    got = store.query("a versioned probe text", top_k=1)
    assert got[0]["id"] == new_id and got[0]["score"] == 1.0
    store.disable_batched_serving()


def test_store_ann_queries_ride_the_facade(spark, tmp_path):
    """VERDICT r8 item 4: query(ann=True) routes through the ANN-mode
    MicroBatcher — N concurrent ANN callers coalesce into FEWER union
    SRP-probe jobs, every caller gets exactly the per-job ANN path's
    answer, mutations tear the ANN batcher down, and ann+metadata_filter
    is still rejected loudly."""
    import pytest

    from vectolite_spark.embed import stub_embedder
    from vectolite_spark.errors import VectoliteError
    from vectolite_spark.store import SparkVectolite

    store = SparkVectolite(
        spark, str(tmp_path / "anndb"), embed_fn=stub_embedder(dim=8)
    )
    store.insert_many(
        [f"ann facade doc number {i}" for i in range(40)],
        [{"k": i} for i in range(40)],
    )
    texts = [f"ann facade doc number {i}" for i in range(5)]
    # per-job ANN path (serving disabled) is the parity target
    want = {t: store.query(t, top_k=3, ann=True) for t in texts}

    store.enable_batched_serving(top_k=5, max_wait_ms=40)
    batcher = store._ensure_ann_serving_batcher()
    cycles: list[int] = []
    orig = batcher._run_batch

    def counting(qvecs, ks=None):
        cycles.append(len(qvecs))
        return orig(qvecs, ks)

    batcher._run_batch = counting

    got: dict[int, list] = {}
    errs: list[Exception] = []

    def client(i: int) -> None:
        try:
            got[i] = store.query(texts[i % 5], top_k=3, ann=True)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert sum(cycles) == 8, "every ANN query went through the facade"
    assert len(cycles) < 8, "concurrent ANN callers coalesced into fewer jobs"
    for i, res in got.items():
        assert res == want[texts[i % 5]]
    # the exact-mode batcher was never built by ANN traffic
    assert store._serving is None
    # ann+filter keeps its loud rejection (never silently batched)
    with pytest.raises(VectoliteError, match="metadata_filter"):
        store.query(texts[0], top_k=3, ann=True, metadata_filter={"k": 1})
    # a mutation tears the ANN batcher down; the next ANN query rebuilds
    # over fresh state and sees the new document
    store.insert("ann facade doc number 999", {"k": 999})
    assert store._serving_ann is None
    fresh = store.query("ann facade doc number 999", top_k=3, ann=True)
    assert any(r["text"] == "ann facade doc number 999" for r in fresh)
    store.disable_batched_serving()


def test_resident_serving_matches_exact(spark, tmp_path):
    """Driver-resident serving (r9, the sub-ms single-query tier):
    identical results to the exact Spark path — scores, order, filters,
    zero-norm semantics — plus mutation teardown and the max_bytes
    refusal tripwire."""
    import pytest

    from vectolite_spark.embed import stub_embedder
    from vectolite_spark.errors import VectoliteError
    from vectolite_spark.store import SparkVectolite

    store = SparkVectolite(
        spark, str(tmp_path / "rdb"), embed_fn=stub_embedder(dim=8)
    )
    store.insert_many(
        [f"resident doc number {i}" for i in range(40)],
        [{"tenant": f"t{i % 3}", "k": i} for i in range(40)],
    )
    texts = [f"resident doc number {i}" for i in range(6)]
    want_plain = {t: store.query(t, top_k=5) for t in texts}
    want_filtered = {
        t: store.query(t, top_k=5, metadata_filter={"tenant": "t1"})
        for t in texts
    }

    store.enable_resident_serving()
    for t in texts:
        assert store.query(t, top_k=5) == want_plain[t]
        assert (
            store.query(t, top_k=5, metadata_filter={"tenant": "t1"})
            == want_filtered[t]
        )
    # selective filter with zero hits
    assert store.query(texts[0], top_k=5, metadata_filter={"tenant": "zz"}) == []
    # ann still takes its own path (resident is exact-only)
    assert store.query(texts[0], top_k=3, ann=True)

    # mutation tears the resident set down; next query sees fresh rows
    store.insert("resident doc number 999", {"tenant": "t1"})
    fresh = store.query("resident doc number 999", top_k=3)
    assert any(r["text"] == "resident doc number 999" for r in fresh)

    # the refusal tripwire: a tiny budget refuses instead of collecting
    store.enable_resident_serving(max_bytes=1)
    with pytest.raises(VectoliteError, match="resident serving refused"):
        store.query(texts[0], top_k=3)
    store.disable_resident_serving()
    assert store.query(texts[0], top_k=5) == store.query(texts[0], top_k=5)


def test_ann_rebuild_invalidates_ann_batcher(spark, tmp_path):
    """ADVICE r9: build_ann_index() must drop the ANN-mode batcher —
    it resolved (n_tables, n_planes) and its precomputed bucket column
    from the PREVIOUS index state, so a custom-plane rebuild while
    batched serving is live would silently diverge from the per-job
    query(ann=True) path. The exact batcher and resident set survive
    (the data didn't change)."""
    from vectolite_spark.embed import stub_embedder
    from vectolite_spark.store import SparkVectolite

    store = SparkVectolite(
        spark, str(tmp_path / "rebuilddb"), embed_fn=stub_embedder(dim=8)
    )
    store.insert_many([f"rebuild doc number {i}" for i in range(30)])
    store.enable_batched_serving(top_k=5, max_wait_ms=5)
    q = "rebuild doc number 3"
    store.query(q, top_k=3)             # builds the exact batcher
    store.query(q, top_k=3, ann=True)   # builds the ANN batcher (default planes)
    exact_batcher = store._serving
    assert store._serving_ann is not None
    store.build_ann_index(n_tables=4, n_planes=3)  # custom planes
    assert store._serving_ann is None, "ANN batcher dropped on index rebuild"
    assert store._serving is exact_batcher, "exact batcher untouched"
    # the rebuilt facade mirrors the per-job path under the NEW planes
    got = store.query(q, top_k=3, ann=True)
    store.disable_batched_serving()
    want = store.query(q, top_k=3, ann=True)
    assert got == want


def test_ann_facade_size_gate(spark, tmp_path):
    """ADVICE r9: the ANN facade's in-mapper probe scans the working
    set per dispatch cycle — corpora above ann_facade_max_rows must
    keep the per-job persisted-index path instead of regressing to a
    per-cycle full scan. The gate is sticky until a mutation."""
    from vectolite_spark.embed import stub_embedder
    from vectolite_spark.store import SparkVectolite

    store = SparkVectolite(
        spark, str(tmp_path / "gatedb"), embed_fn=stub_embedder(dim=8)
    )
    store.insert_many([f"gate doc number {i}" for i in range(20)])
    store.enable_batched_serving(top_k=5, max_wait_ms=5, ann_facade_max_rows=10)
    q = "gate doc number 3"
    res = store.query(q, top_k=3, ann=True)  # falls to the per-job path
    assert store._serving_ann is None and store._serving_ann_oversize
    store.disable_batched_serving()
    assert res == store.query(q, top_k=3, ann=True)
    # under the cap the batcher builds (and carries the bucket column)
    store.enable_batched_serving(top_k=5, max_wait_ms=5, ann_facade_max_rows=50)
    store.query(q, top_k=3, ann=True)
    assert store._serving_ann is not None
    assert not store._serving_ann_oversize
    store.disable_batched_serving()


def test_resident_guard_measures_payload(spark, tmp_path):
    """VERDICT r9 item 4: the resident tripwire measures the real
    text/metadata payload — KB-scale texts that the old per-row slack
    formula waved through must refuse; compact rows under the same
    budget must build. Also covers the cold-dim-cache path: the
    aggregate measures dim itself, so a non-empty store is never
    unguarded."""
    import pytest

    from vectolite_spark.embed import stub_embedder
    from vectolite_spark.errors import VectoliteError
    from vectolite_spark.store import SparkVectolite

    dim = 8
    store = SparkVectolite(
        spark, str(tmp_path / "measdb"), embed_fn=stub_embedder(dim=dim)
    )
    n = 32
    store.insert_many(["resident payload " + "x" * 4000 for _ in range(n)])
    # old formula: n*(dim*4+256) = 9216 bytes -> would have passed this
    # budget; measured: >= 2*4000*n chars alone blows it
    budget = 64 * 1024
    assert n * (dim * 4 + 256) < budget
    store._dim_cache = None  # cold dim cache must not skip the guard
    store.enable_resident_serving(max_bytes=budget)
    with pytest.raises(VectoliteError, match="resident serving refused"):
        store.query("resident payload", top_k=3)
    store.disable_resident_serving()
    # same row count, compact payload: passes the same budget and serves
    store2 = SparkVectolite(
        spark, str(tmp_path / "measdb2"), embed_fn=stub_embedder(dim=dim)
    )
    store2.insert_many([f"compact doc number {i}" for i in range(n)])
    want = store2.query("compact doc number 3", top_k=3)
    store2.enable_resident_serving(max_bytes=budget)
    assert store2.query("compact doc number 3", top_k=3) == want
    store2.disable_resident_serving()


def test_resident_guard_measures_char_width(spark, tmp_path):
    """VERDICT r10 item 6: the byte estimate must be width-aware — the
    old flat 2 B/char term modeled mostly-ASCII text, but CPython
    stores BMP CJK at 2 B/char (PEP 393) while each such char is 3
    UTF-8 octets, so a CJK-heavy corpus could pass the tripwire at ~2x
    the budget. The fix charges ``chars + octets`` (octet_length is a
    per-char upper bound on PEP-393 width): a CJK corpus that the old
    formula waved through must refuse, while a Latin corpus with the
    SAME character count under the same budget still builds."""
    import pytest

    from vectolite_spark.embed import stub_embedder
    from vectolite_spark.errors import VectoliteError
    from vectolite_spark.store import SparkVectolite

    dim, n, text_chars = 8, 32, 2000
    base = n * (dim * 8 + 144)
    chars = n * text_chars
    # budget between the old estimate (base + 2*chars — CJK slips
    # through) and the new one (base + chars + 3*chars for 3-octet CJK)
    budget = base + 3 * chars
    assert base + 2 * chars < budget < base + 4 * chars

    cjk = SparkVectolite(
        spark, str(tmp_path / "cjkdb"), embed_fn=stub_embedder(dim=dim)
    )
    cjk.insert_many(["数据" * (text_chars // 2) for _ in range(n)])
    cjk.enable_resident_serving(max_bytes=budget)
    with pytest.raises(VectoliteError, match="resident serving refused"):
        cjk.query("数据", top_k=3)
    cjk.disable_resident_serving()

    latin = SparkVectolite(
        spark, str(tmp_path / "latindb"), embed_fn=stub_embedder(dim=dim)
    )
    latin.insert_many(["da" * (text_chars // 2) for _ in range(n)])
    want = latin.query("da", top_k=3)
    latin.enable_resident_serving(max_bytes=budget)
    assert latin.query("da", top_k=3) == want
    assert latin._resident is not None  # served resident, not fallback
    latin.disable_resident_serving()


def test_resident_collect_generation_fence(spark, tmp_path):
    """ADVICE r9: the resident working set is collected OUTSIDE the
    serving lock — a mutation landing mid-collect must prevent the
    stale snapshot from being published. The fence is the serving
    generation counter: simulate the race by invalidating between the
    measuring aggregate and the collect, and assert the build returns
    None (caller falls back to the exact path) without publishing."""
    from vectolite_spark.embed import stub_embedder
    from vectolite_spark.store import SparkVectolite

    store = SparkVectolite(
        spark, str(tmp_path / "fencedb"), embed_fn=stub_embedder(dim=8)
    )
    store.insert_many([f"fence doc number {i}" for i in range(10)])
    store.enable_resident_serving()

    orig_df = store.df
    fired = {"n": 0}

    def racing_df():
        df = orig_df()
        fired["n"] += 1
        if fired["n"] == 2:  # the collect's select, after the size agg
            store._invalidate_serving()  # concurrent mutation lands here
        return df

    store.df = racing_df
    try:
        assert store._ensure_resident() is None
        assert store._resident is None, "stale snapshot must not publish"
    finally:
        store.df = orig_df
    # next query rebuilds cleanly over fresh state and serves resident
    want = store.query("fence doc number 3", top_k=3)
    assert store._resident is not None
    assert store.query("fence doc number 3", top_k=3) == want
    store.disable_resident_serving()


def test_srp_serving_mapper_bucket_col_parity():
    """The precomputed-bucket fast path (ADVICE r9) must be
    row-identical to the recompute path: same candidates, same scores,
    same order — pure pandas-level check, no Spark session needed."""
    import numpy as np
    import pandas as pd

    from vectolite_spark._pandas_udfs import (
        _srp_planes,
        make_srp_serving_mapper,
    )

    rng = np.random.RandomState(3)
    n, d, nt, npl = 200, 16, 4, 5
    mat = rng.randn(n, d)
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [mat[i].astype(np.float64) for i in range(n)],
            "text": [f"t{i}" for i in range(n)],
            "metadata": ["{}"] * n,
        }
    )
    # precompute bucket codes exactly as make_srp_bucket_codes_udf does
    P = _srp_planes(nt, npl, d)
    bits = (mat @ P.T >= 0).astype(np.int64)
    shifts = np.arange(npl, dtype=np.int64)
    codes = np.stack(
        [(bits[:, t * npl : (t + 1) * npl] << shifts).sum(axis=1) for t in range(nt)],
        axis=1,
    )
    with_codes = pdf.assign(srp_buckets=[codes[i] for i in range(n)])

    qids = [0, 1, 2]
    qvecs = [mat[7], mat[50], rng.randn(d)]
    kwargs = dict(n_tables=nt, n_planes=npl, payload_cols=("text", "metadata"))
    plain = next(
        make_srp_serving_mapper(qids, qvecs, 5, **kwargs)(iter([pdf]))
    )
    fast = next(
        make_srp_serving_mapper(qids, qvecs, 5, bucket_col="srp_buckets", **kwargs)(
            iter([with_codes])
        )
    )
    assert plain.to_dict("records") == fast.to_dict("records")
    assert len(plain), "probe produced candidates"


def test_resident_build_single_flight(spark, tmp_path):
    """r10 review: moving the resident collect outside the serving lock
    must not let N concurrent first queries each run their own
    full-corpus collect — builds are single-flight, so the table is
    read exactly once (one measuring aggregate + one collect)."""
    from vectolite_spark.embed import stub_embedder
    from vectolite_spark.store import SparkVectolite

    store = SparkVectolite(
        spark, str(tmp_path / "sfdb"), embed_fn=stub_embedder(dim=8)
    )
    store.insert_many([f"singleflight doc {i}" for i in range(20)])
    store.enable_resident_serving()
    store.query("singleflight doc 0", top_k=3)  # warm dim cache + build
    store._invalidate_serving()  # drop the resident set, keep dim cache
    orig_df = store.df
    calls = {"n": 0}

    def counting_df():
        calls["n"] += 1
        return orig_df()

    store.df = counting_df
    try:
        errs: list[Exception] = []

        def client(i):
            try:
                store.query(f"singleflight doc {i % 5}", top_k=3)
            except Exception as e:  # pragma: no cover
                errs.append(e)

        threads = [threading.Thread(target=client, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs
        assert calls["n"] == 2, (
            f"expected ONE build (agg + collect = 2 df() reads), saw {calls['n']}"
        )
    finally:
        store.df = orig_df
        store.disable_resident_serving()


def test_ann_batcher_shares_exact_cache(spark, tmp_path):
    """r10 review: when the exact facade's cached working set exists
    (same plane parameters), the ANN batcher must ride it instead of
    persisting a second full copy — and still match the per-job path."""
    from vectolite_spark.embed import stub_embedder
    from vectolite_spark.store import SparkVectolite

    store = SparkVectolite(
        spark, str(tmp_path / "sharedb"), embed_fn=stub_embedder(dim=8)
    )
    store.insert_many([f"share doc number {i}" for i in range(30)])
    store.enable_batched_serving(top_k=5, max_wait_ms=5)
    q = "share doc number 3"
    store.query(q, top_k=3)  # builds the exact batcher + shared base
    assert store._serving_base is not None
    assert store._serving_base_planes == (16, 6)
    assert "srp_buckets" in store._serving_base.columns
    got = store.query(q, top_k=3, ann=True)  # builds the ANN batcher
    assert store._serving_ann is not None
    assert store._serving_ann_payload is None, "no second cached copy"
    store.disable_batched_serving()
    assert got == store.query(q, top_k=3, ann=True)
