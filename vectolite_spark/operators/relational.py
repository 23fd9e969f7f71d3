"""Reference CRUD/relational parity operators (SURVEY.md §2.2, §2.4-2.5).

Every operator is a pure DataFrame transformation — Catalyst handles column
pruning and predicate pushdown into the parquet scans; nothing here shuffles
except the global sort in pagination (which AQE coalesces; at 100 TB
pagination over a sorted/partitioned table prunes to the relevant partitions
via min/max stats — the reference's B-tree index on created_at, subsumed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def truncate_text(col: Column | str, max_len: int = 200) -> Column:
    """F2 (vectolite.py:241-244): text[:max_len] + '...' iff longer."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        F.length(c) > max_len, F.concat(F.substring(c, 1, max_len), F.lit("..."))
    ).otherwise(c)


def list_documents(
    df: DataFrame,
    order_cols: list[Column],
    limit: int = 50,
    offset: int = 0,
    include_text: bool = True,
    text_col: str = "text",
    max_text: int = 200,
) -> DataFrame:
    """A3 (vectolite.py:201-266): ORDER BY ... LIMIT ? OFFSET ? pagination,
    with the reference's include_text / truncation projection variants (P1).

    ``DataFrame.offset`` (Spark 3.4+) keeps limit+offset in the plan, so the
    optimizer fetches only offset+limit rows per partition before the merge.
    """
    out = df.orderBy(*order_cols)
    if offset:
        out = out.offset(offset)
    out = out.limit(limit)
    if include_text:
        out = out.withColumn(text_col, truncate_text(text_col, max_text))
    else:
        out = out.drop(text_col)
    return out


def point_lookup(df: DataFrame, id_col: str, id_value) -> DataFrame:
    """P2 (vectolite.py:268-298): equality predicate, pushed to parquet."""
    return df.filter(F.col(id_col) == id_value)


def delete_where(df: DataFrame, predicate: Column) -> DataFrame:
    """P3 (vectolite.py:186-199) as an immutable rewrite: rows NOT matching
    the predicate survive. SQL ``DELETE WHERE`` semantics exactly: only
    rows where the predicate is TRUE are deleted — a NULL predicate (e.g.
    ``lang = 'de'`` on a NULL lang) KEEPS the row; a bare ``~predicate``
    filter would silently drop it. At 100 TB the real answer is a
    Delta/Iceberg ``DELETE WHERE`` (file-level rewrite of affected files
    only); plain parquet requires full rewrite — documented trade-off,
    same semantics."""
    return df.filter(~F.coalesce(predicate, F.lit(False)))


def json_get(col: Column | str, path: str) -> Column:
    """F5 (vectolite.py:168,250,...): JSON field access on a metadata string;
    NULL json -> NULL field (reference treats missing as {})."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, path)
