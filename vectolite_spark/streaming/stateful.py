"""Custom stateful streaming operators via applyInPandasWithState — the
shape Structured Streaming gives you when windows/dropDuplicates can't
express the semantics (north-star extension; the reference has no streaming
at all).

State lives in the checkpointed state store, partitioned by key: each
micro-batch routes a key's rows to the executor holding its state, the
user function folds them in, and the updated state persists across batches
AND restarts. At 100 TB/day the state store is RocksDB-backed and the
operator scales with the key-hash shuffle like any aggregation.

No ``from __future__ import annotations`` here: like pandas UDFs, the
state API resolves real type objects at definition time.
"""

import pandas as pd


def running_user_totals(events, key_col="user_id", value_col="value"):
    """Per-user RUNNING totals across the whole stream lifetime — beyond
    any window, impossible for a watermarked aggregation (which must close
    its windows): explicit per-key state (n_events, total_value) updated
    per micro-batch.

    Output (update mode): one row per key per batch it appeared in, with
    the lifetime-so-far totals. Deterministic given the batch contents.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fold(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=f"{key_col} long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_totals_exact(events, key_col="user_id", value_col="value"):
    """ORACLE-GRADE variant of ``running_user_totals``: per-row values are
    quantized to integer CENTS with portable half-up rounding
    (floor(v*100 + 0.5) — the same engine-portable rounding the int8
    quantizer uses) and accumulated as int64, so the lifetime totals are
    EXACT regardless of how the file source splits micro-batches or
    partitions rows — float accumulation order can never shift a
    comparison bit. This is what makes the stateful operator
    hash-matchable against a batch SQL twin (registry
    ``streaming_user_totals``)."""
    import math

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fold(key, pdfs, state: GroupState):
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int(
                sum(math.floor(v * 100 + 0.5) for v in pdf[value_col])
            )
        state.update((n, cents))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "total_cents": [cents]}
        )

    return events.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=f"{key_col} long, n_events long, total_cents long",
        stateStructType="n long, cents long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
