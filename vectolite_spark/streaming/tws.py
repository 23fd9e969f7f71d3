"""Streaming first-seen dedup via ``transformWithStateInPandas`` — the
Spark 4.x stateful API whose state store is RocksDB-backed (disk-spillable,
changelog-checkpointed), unlike ``applyInPandasWithState``'s default
HDFS-backed in-memory maps. At 100 TB/day of ingest the seen-set cannot
live in executor heap: RocksDB keeps it on local SSD with incremental
checkpoints to the cluster store, and state TTL bounds it in time.

The operator is the streaming twin of ``dedup.exact_dedup`` (reference has
no streaming at all): key the stream by content hash, keep one ValueState
flag per hash, emit only a hash's FIRST document. Duplicate-horizon
semantics are delegated to TTL (``ttl_minutes``) instead of unbounded
state growth.

No ``from __future__ import annotations`` here: like pandas UDFs, the
processor API resolves real type objects at definition time.

Runtime gate: Spark's transformWithState protocol speaks protobuf to the
driver-side Python runner (``google.protobuf``), which this container
does not ship — so the end-to-end path is pytest-gated on protobuf
availability (``HAS_PROTOBUF``), the same honest-stub pattern as
multimodal decode. Plan construction and schemas are real and always
tested; on a normal cluster (protobuf is a stock Spark dependency) the
operator runs as written.
"""

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import IntegerType, StructField, StructType

OUTPUT_SCHEMA = "doc_id long, content_hash string, text string"


def has_protobuf() -> bool:
    """True when google.protobuf is importable (the transformWithState
    wire dependency). Stock Spark distributions bundle it; this container
    does not."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


class FirstSeenProcessor(StatefulProcessor):
    """Emits the first row per key; swallows every later duplicate.

    State is one (n_dups,) ValueState per content hash. TTL (when set)
    expires idle hashes so re-appearances past the horizon count as new —
    exactly the dedup contract a bounded-state pipeline wants.
    """

    def __init__(self, ttl_ms=None):
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle):
        schema = StructType([StructField("n", IntegerType(), True)])
        if self._ttl_ms:
            self.seen = handle.getValueState("seen", schema, ttlDurationMs=self._ttl_ms)
        else:
            self.seen = handle.getValueState("seen", schema)

    def handleInputRows(self, key, rows, timerValues):
        first = None
        n = 0
        for pdf in rows:
            if first is None and len(pdf):
                first = pdf.head(1)
            n += len(pdf)
        if self.seen.exists():
            (prev,) = self.seen.get()
            self.seen.update((prev + n,))
            return iter([])
        self.seen.update((n,))
        yield first[["doc_id", "content_hash", "text"]]

    def close(self):
        pass


def streaming_first_seen(
    docs, text_col="text", id_col="doc_id", ttl_minutes=None
):
    """First-occurrence-only streaming dedup by sha2 content hash.

    Input: any streaming DataFrame with (id_col, text_col). The hash keys
    the state shuffle, so dedup state scales horizontally with executors;
    only the 64-hex hash — never the text — is the grouping key.

    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``) — Spark rejects
    transformWithState on the HDFS-backed provider.
    """
    keyed = docs.select(
        F.col(id_col).alias("doc_id"),
        F.sha2(F.col(text_col), 256).alias("content_hash"),
        F.col(text_col).alias("text"),
    )
    ttl_ms = int(ttl_minutes * 60_000) if ttl_minutes else None
    return keyed.groupBy("content_hash").transformWithStateInPandas(
        statefulProcessor=FirstSeenProcessor(ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
