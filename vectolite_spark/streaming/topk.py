"""Continuous top-k similarity maintenance over an embedding stream — the
streaming twin of the flagship search: new vectors arrive (parquet drops
from an upstream embedding job), and a running "current global top-k for
query q" table stays fresh without ever rescanning the corpus.

Why this shape at 100 TB: the naive alternative re-runs the full scan per
refresh. Here each micro-batch is scored alone (partition-local heap —
the flagship plan) and merged against the persisted k-row state; compute
per refresh is O(batch + k), independent of corpus size. The state table
IS the answer table, so readers just read k rows of parquet.

Determinism: the running top-k is a pure function of the set of vectors
seen (merge is associative/commutative over (rounded score desc, id asc)
ordering), so arrival order, batch boundaries, and checkpoint restarts
cannot change the converged answer — that is what the batch-twin test
asserts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectolite_spark.localframe import local_df


def stream_embeddings(spark: SparkSession, input_dir: str) -> DataFrame:
    """Streaming parquet source of (vec_id, embedding) drops."""
    from vectolite_spark.session import ensure_shipped

    ensure_shipped(spark)
    return (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .parquet(input_dir)
    )


def streaming_topk(
    stream: DataFrame,
    qvec: Sequence[float],
    k: int,
    state_path: str,
    checkpoint_dir: str,
):
    """Maintain the running top-k (vec_id, score) for ``qvec`` in a k-row
    parquet table at ``state_path``. Merge step per micro-batch:
    batch-top-k UNION state-top-k -> re-top-k -> atomic overwrite (write
    tmp + rename would be the object-store-safe variant; a k-row
    overwrite is already effectively atomic for readers of this size).
    Returns the started StreamingQuery (availableNow trigger).
    """
    from vectolite_spark.operators.topk import topk_ids

    spark = stream.sparkSession

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_top = topk_ids(batch_df, qvec, k)
        try:
            prev = spark.read.parquet(state_path)
        except Exception:  # first batch: no state yet
            prev = None
        merged = batch_top if prev is None else batch_top.union(prev)
        new_state = (
            merged.orderBy(F.desc("score"), F.asc("vec_id")).limit(k).collect()
        )
        local_df(
            spark, new_state or [], "vec_id long, score double"
        ).coalesce(1).write.mode("overwrite").parquet(state_path)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_ivf_append(
    stream: DataFrame,
    index_path: str,
    checkpoint_dir: str,
):
    """Streaming IVF index maintenance: each micro-batch of new vectors is
    routed to the EXISTING centroids (narrow matmul, no shuffle, no
    rebuild) and appended into the cell-partitioned layout — the index
    stays queryable and fresh while builds stay amortized.  Completes the
    build -> append -> probe lifecycle for a continuously-fed corpus.

    Delivery is at-least-once per micro-batch (a parquet append retried
    after a mid-write crash can duplicate rows); for exactly-once
    appends, fence on batch id in a manifest as
    ``snapshots.streaming_append`` does, or land batches through that
    store and append to the index from its committed snapshots.  After
    heavy drift, rebuild with ``build_ivf_index`` (idempotent).
    """
    from vectolite_spark.operators.ann import ivf_index_append

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ivf_index_append(batch_df.sparkSession, index_path, batch_df)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
