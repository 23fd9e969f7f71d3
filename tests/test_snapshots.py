"""SnapshotStore: time travel, rollback, optimistic concurrency, vacuum."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectolite_spark.errors import VectoliteError
from vectolite_spark.snapshots import SnapshotConflict, SnapshotStore


def _df(spark, ids):
    return spark.createDataFrame([(i, f"doc {i}") for i in ids], "id long, text string")


@pytest.fixture()
def store(spark, tmp_path):
    return SnapshotStore(spark, str(tmp_path / "snap"))


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def test_append_and_time_travel(store, spark):
    assert store.current_version() == -1
    with pytest.raises(VectoliteError):
        store.read()
    v0 = store.append(_df(spark, [1, 2]))
    v1 = store.append(_df(spark, [3]))
    assert (v0, v1) == (0, 1)
    assert _ids(store.read()) == [1, 2, 3]
    assert _ids(store.read(version=0)) == [1, 2]
    assert store.read(version=1).count() == 3


def test_delete_is_cow_and_history(store, spark):
    store.append(_df(spark, [1, 2, 3]))
    v1 = store.delete_where(F.col("id") == 2)
    assert _ids(store.read()) == [1, 3]
    assert _ids(store.read(version=0)) == [1, 2, 3]  # old version intact
    hist = store.history()
    assert [h["version"] for h in hist] == [v1, 0]
    assert hist[0]["op"] == "delete" and hist[1]["op"] == "append"


def test_rollback_restores_without_mutating_history(store, spark):
    store.append(_df(spark, [1]))
    store.append(_df(spark, [2]))
    v2 = store.rollback(0)
    assert v2 == 2
    assert _ids(store.read()) == [1]
    assert _ids(store.read(version=1)) == [1, 2]  # "bad" version still there
    assert store.history()[0]["op"] == "rollback:0"


def test_concurrent_commit_conflict(store, spark, monkeypatch):
    store.append(_df(spark, [1]))
    writer2 = SnapshotStore(spark, store.path)
    # both writers will target version 1; writer2 lands first
    monkeypatch.setattr(store, "current_version", lambda: 0)
    writer2.append(_df(spark, [99]))
    with pytest.raises(SnapshotConflict):
        store._commit(store._read_manifest(0)["dirs"], "append")
    # proper retry path: recompute against the real current version
    monkeypatch.undo()
    assert store._commit(store._read_manifest(0)["dirs"], "append") == 2


def test_vacuum_retention(store, spark):
    store.append(_df(spark, [1]))
    store.append(_df(spark, [2]))
    store.compact()
    out = store.vacuum(keep_versions=1)
    assert out["removed_manifests"] == 2
    assert out["removed_dirs"] == 2  # the two append dirs are unreferenced
    assert _ids(store.read()) == [1, 2]  # retained version reads fine
    with pytest.raises(VectoliteError, match="vacuumed"):
        store.read(version=0)


def test_crash_stranded_dir_is_collected(store, spark):
    store.append(_df(spark, [1]))
    # simulate a writer that crashed after writing data, before committing
    _df(spark, [42]).write.parquet(f"{store._data_dir}/v00000099-append")
    assert _ids(store.read()) == [1]  # stranded dir is invisible to readers
    out = store.vacuum(keep_versions=1)
    assert out["removed_dirs"] == 1
    assert _ids(store.read()) == [1]


def test_streaming_append_exactly_once(store, spark, tmp_path):
    from vectolite_spark.snapshots import last_stream_batch_id, streaming_append

    drops = str(tmp_path / "sdrops")
    _df(spark, [1, 2]).write.parquet(f"{drops}/d0")
    _df(spark, [3]).write.parquet(f"{drops}/d1")
    stream = spark.readStream.schema("id long, text string").parquet(f"{drops}/*")
    streaming_append(store, stream, str(tmp_path / "sckpt")).awaitTermination(120)
    assert _ids(store.read()) == [1, 2, 3]
    n_versions = store.current_version() + 1
    assert last_stream_batch_id(store) >= 0

    # draining again with the same checkpoint commits nothing new
    stream2 = spark.readStream.schema("id long, text string").parquet(f"{drops}/*")
    streaming_append(store, stream2, str(tmp_path / "sckpt")).awaitTermination(120)
    assert store.current_version() + 1 == n_versions

    # a REPLAYED batch (the at-least-once window: sink ran, checkpoint
    # offset write was lost) must be skipped by the REAL sink, not
    # double-appended — drive the actual foreachBatch closure with an
    # already-committed batch id
    from vectolite_spark.snapshots import make_stream_sink

    make_stream_sink(store)(_df(spark, [99]), last_stream_batch_id(store))
    assert _ids(store.read()) == [1, 2, 3]
    assert store.current_version() + 1 == n_versions


def test_stream_sink_carries_zonemaps(store, spark):
    """The streaming sink's commit must carry forward zone maps for
    untouched dirs exactly like append() — otherwise the first
    micro-batch after a z-order compact silently drops the compacted
    dirs' stats and read_pruned full-scans them (ADVICE r7 item 4)."""
    from pyspark.sql import functions as F

    from vectolite_spark.snapshots import make_stream_sink

    df = spark.range(2000).select(
        F.col("id"),
        (F.col("id") % 50).alias("user_id"),
        (F.col("id") * 7 % 500).alias("ts"),
    )
    store.append(df)
    v = store.compact(target_files=8, zorder_by=["user_id", "ts"])
    zm = store._read_manifest(v)["zonemaps"]
    assert zm
    batch = spark.range(2000, 2010).select(
        F.col("id"), (F.col("id") % 50).alias("user_id"),
        (F.col("id") * 7 % 500).alias("ts"),
    )
    make_stream_sink(store)(batch, 0)
    m = store._read_manifest(store.current_version())
    assert m.get("zonemaps") == zm  # compacted dir's stats survived


def test_delete_where_prunes_unaffected_dirs(store, spark):
    store.append(_df(spark, [1, 2]))
    store.append(_df(spark, [3, 4]))
    store.append(_df(spark, [5, 6]))
    dirs_before = store._read_manifest(2)["dirs"]
    v = store.delete_where(F.col("id") == 3)
    m = store._read_manifest(v)
    # only the dir holding id 3 was rewritten; the other two are reused
    assert m["rewritten_dirs"] == 1 and m["pruned_dirs"] == 2
    assert len(set(dirs_before) & set(m["dirs"])) == 2
    assert _ids(store.read()) == [1, 2, 4, 5, 6]
    assert _ids(store.read(version=2)) == [1, 2, 3, 4, 5, 6]  # COW intact


def test_merge_prunes_and_upserts(store, spark):
    store.append(_df(spark, [1, 2]))
    store.append(_df(spark, [3, 4]))
    incoming = spark.createDataFrame(
        [(2, "doc 2 v2"), (9, "doc 9")], "id long, text string"
    )
    dirs_before = store._read_manifest(1)["dirs"]
    v = store.merge(incoming, key="id")
    m = store._read_manifest(v)
    assert m["rewritten_dirs"] == 1 and m["pruned_dirs"] == 1
    assert len(set(dirs_before) & set(m["dirs"])) == 1
    rows = {r["id"]: r["text"] for r in store.read().collect()}
    assert rows == {1: "doc 1", 2: "doc 2 v2", 3: "doc 3", 4: "doc 4", 9: "doc 9"}
    # pre-merge state still travelable
    assert _ids(store.read(version=1)) == [1, 2, 3, 4]


def test_delete_where_null_predicate_keeps_row(store, spark):
    """SQL DELETE semantics: rows where the predicate evaluates to NULL
    (here: NULL lang) must SURVIVE the delete, not vanish silently."""
    df = spark.createDataFrame(
        [(1, "de"), (2, None), (3, "en")], "id long, lang string"
    )
    store.append(df)
    store.delete_where(F.col("lang") == "de")
    assert _ids(store.read()) == [2, 3]  # the NULL-lang row is kept


def test_maybe_compact_threshold(store, spark):
    assert store.maybe_compact() is None  # empty store: no-op
    for i in range(5):
        store.append(_df(spark, [i]))
    assert store.maybe_compact(max_dirs=10) is None  # under threshold
    v = store.maybe_compact(max_dirs=3, target_files=1)
    assert v == 5 and store.history()[0]["op"] == "compact"
    assert len(store._read_manifest(v)["dirs"]) == 1
    assert _ids(store.read()) == [0, 1, 2, 3, 4]
    # idempotent once compacted
    assert store.maybe_compact(max_dirs=3) is None


def test_delete_during_concurrent_commit_raises_not_lost_update(store, spark):
    """The lost-update window (ADVICE r3): a writer that planned its dir
    list against version N-1 must FAIL with SnapshotConflict if another
    commit lands while it rewrites — not silently commit a manifest that
    drops the concurrent commit's dirs."""
    store.append(_df(spark, [1, 2]))
    store.append(_df(spark, [3, 4]))

    # interleave: a second writer commits while delete_where is between
    # its manifest read and its _commit
    writer2 = SnapshotStore(spark, store.path)
    orig = store._affected_dirs

    def racing_probe(dirs, probe, schema=None):
        writer2.append(_df(spark, [99]))  # lands version 2 first
        return orig(dirs, probe, schema=schema)

    store._affected_dirs = racing_probe
    with pytest.raises(SnapshotConflict):
        store.delete_where(F.col("id") == 3)
    # the concurrent append survives; a plain retry now sees it
    store._affected_dirs = orig
    assert 99 in _ids(store.read())
    store.delete_where(F.col("id") == 3)
    assert _ids(store.read()) == [1, 2, 4, 99]


def test_conflicted_delete_retry_self_heals(store, spark):
    """A conflicted attempt strands a uniquely-named data dir; the retry
    of the same operation at the same version must succeed (no
    path-already-exists from deterministic names) and vacuum collects
    the stranded dir."""
    store.append(_df(spark, [1, 2, 3]))
    writer2 = SnapshotStore(spark, store.path)
    orig = store._affected_dirs

    def racing_probe(dirs, probe, schema=None):
        store._affected_dirs = orig  # race once
        writer2.append(_df(spark, [50]))
        return orig(dirs, probe, schema=schema)

    store._affected_dirs = racing_probe
    with pytest.raises(SnapshotConflict):
        store.delete_where(F.col("id") == 2)
    store.delete_where(F.col("id") == 2)  # retry at the new version
    assert _ids(store.read()) == [1, 3, 50]
    res = store.vacuum(keep_versions=1)
    assert res["removed_dirs"] >= 1  # the conflicted attempt's stranded dir


def test_delete_all_rows_of_a_dir_keeps_table_readable(store, spark):
    store.append(_df(spark, [1, 2]))
    store.append(_df(spark, [3, 4]))
    v = store.delete_where(F.col("id").isin([3, 4]))
    m = store._read_manifest(v)
    assert m["rewritten_dirs"] == 1 and m["pruned_dirs"] == 1
    # the all-rows-dead rewrite must leave the table readable (an empty
    # parquet part still carries schema; a data-file-less dir is dropped)
    assert len(m["dirs"]) <= 2
    assert _ids(store.read()) == [1, 2]


def test_single_probe_job_for_many_dirs(store, spark):
    """The matched-dir probe is ONE Spark job regardless of dir count."""
    for c in range(6):
        store.append(_df(spark, [c * 10, c * 10 + 1]))
    sc = spark.sparkContext
    sc.setJobGroup("snap-delete-jobs", "count jobs in delete_where")
    try:
        store.delete_where(F.col("id") == 30)
    finally:
        sc.setJobGroup("", "")
    jobs = sc.statusTracker().getJobIdsForGroup("snap-delete-jobs")
    # constant job count (probe + rewrite + schema/AQE bookkeeping), never
    # O(dirs) round trips — the r3 shape ran >= 1 probe job PER dir (>= 7
    # jobs here before the rewrite even started)
    assert len(jobs) <= 6, f"delete ran {len(jobs)} jobs for 6 dirs"
    assert _ids(store.read()) == [0, 1, 10, 11, 20, 21, 31, 40, 41, 50, 51]


def test_version_diff_added_removed(store, spark):
    store.append(_df(spark, [1, 2, 3]))
    store.delete_where(F.col("id") == 2)
    store.append(_df(spark, [9]))
    d = {(r["id"], r["change"]) for r in store.diff(0, 2).collect()}
    assert d == {(9, "added"), (2, "removed")}
    # no-change diff is empty; reversed diff flips the labels
    assert store.diff(1, 1).count() == 0
    rev = {(r["id"], r["change"]) for r in store.diff(2, 0).collect()}
    assert rev == {(9, "removed"), (2, "added")}


def test_version_diff_after_merge_and_rollback(store, spark):
    store.append(_df(spark, [1, 2]))
    incoming = spark.createDataFrame(
        [(2, "doc 2 v2"), (5, "doc 5")], "id long, text string"
    )
    store.merge(incoming, key="id")
    # key 2 was rewritten in place (same id on both sides) -> NOT a diff row
    d = {(r["id"], r["change"]) for r in store.diff(0, 1).collect()}
    assert d == {(5, "added")}
    v2 = store.rollback(0)
    d2 = {(r["id"], r["change"]) for r in store.diff(1, v2).collect()}
    assert d2 == {(5, "removed")}


def test_with_conflict_retry_wins_after_race(store, spark):
    from vectolite_spark.snapshots import with_conflict_retry

    store.append(_df(spark, [1, 2]))
    writer2 = SnapshotStore(spark, store.path)
    orig = store._affected_dirs
    raced = {"n": 0}

    def racing_probe(dirs, probe, schema=None):
        if raced["n"] == 0:
            raced["n"] += 1
            writer2.append(_df(spark, [77]))
        return orig(dirs, probe, schema=schema)

    store._affected_dirs = racing_probe
    v = with_conflict_retry(lambda: store.delete_where(F.col("id") == 1))
    assert _ids(store.read(version=v)) == [2, 77]
    assert raced["n"] == 1  # first attempt conflicted, retry landed


def test_concurrent_append_stress_no_lost_updates(store, spark):
    """Six writers race unsynchronized appends through the optimistic
    commit protocol: every row must land, every commit must get a
    distinct version, and nothing may be silently dropped (the ADVICE-r3
    lost-update window, under real thread interleaving instead of the
    two-writer choreographed cases above)."""
    from concurrent.futures import ThreadPoolExecutor

    from vectolite_spark.snapshots import with_conflict_retry

    n_writers = 6

    def writer(i):
        w = SnapshotStore(spark, store.path)
        df = _df(spark, [100 + i])
        return with_conflict_retry(lambda: w.append(df), attempts=30)

    with ThreadPoolExecutor(n_writers) as ex:
        versions = sorted(ex.map(writer, range(n_writers)))

    # one distinct version per commit, no gaps, none overwritten
    assert versions == list(range(n_writers))
    assert store.current_version() == n_writers - 1
    assert _ids(store.read()) == [100 + i for i in range(n_writers)]
    # every intermediate version is still readable (manifest isolation)
    for k, v in enumerate(versions):
        assert len(store.read(version=v).collect()) == k + 1


def test_schema_evolution_add_column(store, spark):
    """ADD-column evolution (VERDICT r6 item 6): a later append may carry
    new columns; the manifest records the evolved union schema, older
    rows NULL-backfill on read, time travel keeps each version's own
    schema, and a type change fails loudly."""
    import pytest
    from pyspark.sql import functions as F

    from vectolite_spark.errors import VectoliteError

    store.append(spark.createDataFrame([(1, "a"), (2, "b")], "id long, val string"))
    store.append(
        spark.createDataFrame([(3, "c", 30)], "id long, val string, score long")
    )
    cur = store.read()
    assert set(cur.columns) == {"id", "val", "score"}
    rows = {r["id"]: r["score"] for r in cur.collect()}
    assert rows == {1: None, 2: None, 3: 30}
    # time travel: version 0 predates the column — its schema has no trace
    assert set(store.read(version=0).columns) == {"id", "val"}
    # predicates on the evolved column resolve against pre-evolution dirs
    store.delete_where(F.col("score") == 30)
    assert sorted(r["id"] for r in store.read().collect()) == [1, 2]
    assert set(store.read().columns) == {"id", "val", "score"}
    # merge with a second new column evolves again (and NULL-backfills)
    store.merge(
        spark.createDataFrame(
            [(2, "b2", None, "x")], "id long, val string, score long, tag string"
        ),
        key="id",
    )
    got = {r["id"]: (r["val"], r["tag"]) for r in store.read().collect()}
    assert got == {1: ("a", None), 2: ("b2", "x")}
    # rollback restores the old schema with the old data
    store.rollback(0)
    assert set(store.read().columns) == {"id", "val"}
    # type change is a refusal, not a coercion
    with pytest.raises(VectoliteError, match="type change"):
        store.append(spark.createDataFrame([(9, 1.5)], "id long, val double"))


def test_schema_evolution_compact_preserves_union(store, spark):
    store.append(spark.createDataFrame([(1, "a")], "id long, val string"))
    store.append(
        spark.createDataFrame([(2, "b", 7)], "id long, val string, extra long")
    )
    store.compact()
    cur = store.read()
    assert set(cur.columns) == {"id", "val", "extra"}
    assert {r["id"]: r["extra"] for r in cur.collect()} == {1: None, 2: 7}


def test_compact_zorder_three_columns_prunes(store, spark):
    """VERDICT r7 item 8: zorder_by generalizes past the Morton pair —
    a 3-column layout (source, lang, date shape) still builds a zone
    map, still prunes on any of the three columns, and still matches
    the full scan; 5 columns are refused with the resolution rationale."""
    import pytest
    from pyspark.sql import functions as F

    from vectolite_spark.errors import VectoliteError

    df = spark.range(6000).select(
        F.col("id"),
        (F.col("id") % 8).alias("source"),
        (F.col("id") % 5).alias("lang"),
        (F.col("id") * 13 % 365).alias("day"),
    )
    store.append(df)
    v = store.compact(target_files=24, zorder_by=["source", "lang", "day"])
    m = store._read_manifest(v)
    assert m["zorder_by"] == ["source", "lang", "day"]
    assert len(m["zonemaps"]) == 1

    ranges = {"source": (2, 2), "lang": (1, 2), "day": (0, 120)}
    pruned, nr, nt = store.read_pruned(ranges)
    assert nr < nt, "3-col zone map must skip files"
    want = sorted(
        r["id"]
        for r in df.filter(
            (F.col("source") == 2)
            & F.col("lang").between(1, 2)
            & F.col("day").between(0, 120)
        ).collect()
    )
    assert sorted(r["id"] for r in pruned.collect()) == want
    # single-column pruning over the same layout also works
    one, nr1, nt1 = store.read_pruned({"day": (300, 364)})
    assert nr1 < nt1
    assert one.count() == df.filter(F.col("day").between(300, 364)).count()
    with pytest.raises(VectoliteError, match="1-4 columns"):
        store.compact(zorder_by=["id", "source", "lang", "day", "extra"])


def test_compact_zorder_builds_zonemap_and_prunes(store, spark):
    """compact(zorder_by=...) lays the commit out in Morton order and
    records a per-file zone map in the manifest; read_pruned skips files
    (files_read < files_total) while matching the full-scan answer;
    later appends CARRY the zone map; a rewrite of the compacted dir
    drops it (stats describe bytes that no longer exist)."""
    from pyspark.sql import functions as F

    df = spark.range(4000).select(
        F.col("id"),
        (F.col("id") % 100).alias("user_id"),
        (F.col("id") * 7 % 1000).alias("ts"),
    )
    for m in range(4):
        store.append(df.filter(F.col("id") % 4 == m))
    v = store.compact(target_files=16, zorder_by=["user_id", "ts"])
    m = store._read_manifest(v)
    assert m["zorder_by"] == ["user_id", "ts"] and len(m["zonemaps"]) == 1

    ranges = {"user_id": (10, 19), "ts": (0, 99)}
    pruned, nr, nt = store.read_pruned(ranges)
    want = sorted(
        r["id"]
        for r in store.read()
        .filter(F.col("user_id").between(10, 19) & F.col("ts").between(0, 99))
        .collect()
    )
    assert sorted(r["id"] for r in pruned.collect()) == want
    assert 0 < nr < nt, f"no pruning: read {nr} of {nt}"

    # an append afterwards keeps the zone map working for the old dir and
    # scans only the new dir fully
    store.append(
        spark.createDataFrame([(99999, 15, 50)], "id long, user_id long, ts long")
    )
    pruned2, nr2, nt2 = store.read_pruned(ranges)
    assert 99999 in {r["id"] for r in pruned2.collect()}
    assert sorted(r["id"] for r in pruned2.collect()) == sorted(want + [99999])
    assert nr2 == nr and nt2 == nt  # stats carried, still pruning

    # rewriting the z-ordered dir (a delete that matches it) drops its map
    store.delete_where(F.col("id") == 0)
    assert not store._read_manifest(store.current_version()).get("zonemaps")
    # and vacuum collects the orphaned zonemap dir with its data dir
    store.vacuum(keep_versions=1)
    leftover = [
        n for n in store._fs.list_names(store._data_dir) if n.endswith(".zonemap")
    ]
    assert leftover == []


def test_maybe_compact_zorder_passthrough(store, spark):
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 10).alias("user_id"), F.col("id").alias("ts")
    )
    for m in range(3):
        store.append(df.filter(F.col("id") % 3 == m))
    assert store.maybe_compact(max_dirs=64) is None
    v = store.maybe_compact(max_dirs=2, target_files=4, zorder_by=["user_id", "ts"])
    assert v is not None
    assert "zonemaps" in store._read_manifest(v)


def test_read_changes_append_only_window(store, spark):
    """read_changes delivers exactly the rows added between versions
    (manifest set-difference), empty for an empty window, and REFUSES a
    window containing a rewrite (moved rows are not inserts)."""
    from pyspark.sql import functions as F

    from vectolite_spark.errors import VectoliteError

    v0 = store.append(spark.createDataFrame([(1,), (2,)], "id long"))
    v1 = store.append(spark.createDataFrame([(3,), (4,)], "id long"))
    v2 = store.append(spark.createDataFrame([(5,)], "id long"))
    assert _ids(store.read_changes(v0, v1)) == [3, 4]
    assert _ids(store.read_changes(v0, v2)) == [3, 4, 5]
    assert _ids(store.read_changes(-1, v0)) == [1, 2]
    assert store.read_changes(v2, v2).count() == 0
    store.delete_where(F.col("id") == 1)
    with pytest.raises(VectoliteError, match="rewrite commit"):
        store.read_changes(v1)
    # a fresh window after the rewrite works again
    v4 = store.append(spark.createDataFrame([(9,)], "id long"))
    assert _ids(store.read_changes(v4 - 1, v4)) == [9]


def test_read_changes_carries_evolved_schema(store, spark):
    v0 = store.append(spark.createDataFrame([(1, "a")], "id long, val string"))
    v1 = store.append(
        spark.createDataFrame([(2, "b", 5)], "id long, val string, extra long")
    )
    delta = store.read_changes(v0, v1)
    assert set(delta.columns) == {"id", "val", "extra"}
    assert delta.first()["extra"] == 5


def test_shallow_clone_zero_copy_divergence(store, spark, tmp_path):
    """Shallow clone references the source's dirs (zero bytes copied),
    then the two logs diverge independently: clone COW-delete leaves
    the source intact, source appends never appear in the clone, and
    clone vacuum never touches the shared source dirs."""
    import pytest
    from pyspark.sql import functions as F

    from vectolite_spark.errors import VectoliteError
    from vectolite_spark.snapshots import SnapshotStore

    empty = SnapshotStore(spark, str(tmp_path / "empty"))
    with pytest.raises(VectoliteError, match="empty"):
        empty.shallow_clone(str(tmp_path / "nope"))

    store.append(_df(spark, [1, 2, 3, 4]))
    clone = store.shallow_clone(str(tmp_path / "clone"))
    assert _ids(clone.read()) == [1, 2, 3, 4]
    # zero-copy: the clone's own data dir holds nothing
    assert clone._fs.list_names(clone._data_dir) == []
    with pytest.raises(VectoliteError, match="already has commits"):
        store.shallow_clone(str(tmp_path / "clone"))

    # divergence: clone delete is COW into the clone's dir; source intact
    clone.delete_where(F.col("id") == 2)
    assert _ids(clone.read()) == [1, 3, 4]
    assert _ids(store.read()) == [1, 2, 3, 4]
    # source append never appears in the clone
    store.append(_df(spark, [9]))
    assert _ids(store.read()) == [1, 2, 3, 4, 9]
    assert _ids(clone.read()) == [1, 3, 4]
    # clone vacuum drops its own history but never the shared source dirs
    clone.vacuum(keep_versions=1)
    assert _ids(clone.read()) == [1, 3, 4]
    assert _ids(store.read()) == [1, 2, 3, 4, 9]


def test_shallow_clone_carries_zonemaps(store, spark, tmp_path):
    from pyspark.sql import functions as F

    df = spark.range(2000).select(
        F.col("id"), (F.col("id") % 50).alias("user_id"),
        (F.col("id") * 7 % 500).alias("ts"),
    )
    store.append(df)
    v = store.compact(target_files=8, zorder_by=["user_id", "ts"])
    zm = store._read_manifest(v)["zonemaps"]
    clone = store.shallow_clone(str(store.path) + "_zclone")
    assert clone._read_manifest(0).get("zonemaps") == zm
    pruned, nr, nt = clone.read_pruned({"user_id": (3, 5)})
    assert nr < nt  # the shared stats keep pruning on the clone
    assert pruned.count() == df.filter(F.col("user_id").between(3, 5)).count()


def test_erasure_audit_detects_history_and_strays(store, spark):
    """erasure_audit must fail a plain delete (old versions still hold
    the rows), pass after vacuum, and flag unreferenced stray dirs."""
    from pyspark.sql import functions as F

    store.append(spark.createDataFrame([(1, "x"), (2, "gone")], "id long, tag string"))
    store.delete_where(F.col("tag") == "gone")
    pre = store.erasure_audit(F.col("tag") == "gone", checksum_col="id")
    assert pre["n_matches"] > 0 and not pre["erased"]  # time travel retains it
    assert pre["match_checksum"] == 2  # WHICH rows the audit saw, not just n
    store.vacuum(keep_versions=1)
    post = store.erasure_audit(F.col("tag") == "gone")
    assert post == {
        "n_versions": 1, "n_matches": 0, "n_unreferenced_dirs": 0, "erased": True,
    }
    # a stranded dir (crashed commit) blocks the erasure claim
    spark.createDataFrame([(9, "gone")], "id long, tag string").write.parquet(
        f"{store._data_dir}/v99999999-crashed-deadbeef"
    )
    stray = store.erasure_audit(F.col("tag") == "gone")
    assert stray["n_unreferenced_dirs"] == 1 and not stray["erased"]
    store.vacuum(keep_versions=1)
    assert store.erasure_audit(F.col("tag") == "gone")["erased"]


def test_read_pruned_time_travel_and_edge_cases(store, spark):
    from pyspark.sql import functions as F

    import pytest

    from vectolite_spark.errors import VectoliteError

    # empty store: read_changes refuses clearly
    with pytest.raises(VectoliteError, match="empty"):
        store.read_changes(-1)

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 50).alias("user_id"), (F.col("id") % 200).alias("ts")
    )
    store.append(df)
    v_z = store.compact(target_files=8, zorder_by=["user_id", "ts"])
    # a later plain append does NOT appear when time-traveling read_pruned
    store.append(
        spark.createDataFrame([(5555, 10, 50)], "id long, user_id long, ts long")
    )
    ranges = {"user_id": (10, 14), "ts": (40, 60)}
    at_z, nr, nt = store.read_pruned(ranges, version=v_z)
    assert 5555 not in {r["id"] for r in at_z.collect()}
    assert 0 < nr <= nt
    # pre-zonemap version: pure residual-filter path, still correct
    at_v0, nr0, nt0 = store.read_pruned(ranges, version=0)
    want = sorted(
        r["id"]
        for r in store.read(0)
        .filter(F.col("user_id").between(10, 14) & F.col("ts").between(40, 60))
        .collect()
    )
    assert sorted(r["id"] for r in at_v0.collect()) == want
    assert (nr0, nt0) == (0, 0)  # no zone-mapped dirs at v0
