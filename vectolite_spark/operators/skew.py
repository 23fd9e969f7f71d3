"""Skew mitigation: salted joins for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. Salting is the explicit,
plan-level fallback for the pathological case AQE can't fix: ONE join key so
hot that any single partition holding it is too big (e.g. the empty-string
document, a null-ish user id, a default cluster id at 100 TB).

Shape: the fact side gets a deterministic per-row salt in [0, n); the
dimension side is replicated n times, once per salt value; the join key
becomes (key, salt), spreading the hot key over n partitions. Replication
costs n x |dim| — use for small/medium dimension sides only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, n_salts: int, entropy_cols: list[str] | None = None) -> DataFrame:
    """Deterministic per-row salt in [0, n_salts): hash of the given columns
    (default: all), so re-runs produce identical placement (no rand())."""
    cols = entropy_cols or df.columns
    return df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts)).cast("int")
    )


def replicate_for_salt(df: DataFrame, n_salts: int) -> DataFrame:
    """Replicate each row once per salt value (dimension side of the join)."""
    return df.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


_FACT_PRESERVING_HOW = {
    "inner", "cross", "left", "leftouter", "left_outer",
    "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti",
}


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key shuffle spread over ``n_salts`` partitions
    per key. Result is identical to ``fact.join(dim, on, how)`` for the
    supported join types.

    Only fact-preserving joins are allowed: the dim side is REPLICATED
    ``n_salts`` times, so any dim-preserving type (right/full outer) would
    emit every unmatched dim row once per salt — silently wrong. For those,
    swap the sides (the replicated side must be the one whose unmatched
    rows are dropped) or rely on AQE skew splitting."""
    if how.lower().replace("_", "") not in {
        h.replace("_", "") for h in _FACT_PRESERVING_HOW
    }:
        raise ValueError(
            f"salted_join supports fact-preserving joins only, got how={how!r}: "
            "the replicated dim side would duplicate unmatched rows under "
            "right/full outer. Swap the join sides or use AQE skew handling."
        )
    f = with_salt(fact, n_salts)
    d = replicate_for_salt(dim, n_salts)
    return f.join(d, on + [SALT_COL], how).drop(SALT_COL)
