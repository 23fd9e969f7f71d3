"""Paragraph-aware overlapping text chunker + the Spark explode pipeline.

Reference semantics (U1, /root/reference/vectolite.py:369-409, verified
corner cases in SURVEY.md §2.6):
- blank-line (``\\n\\n``) paragraph split, stripped, empties dropped;
- greedy packing: a paragraph joins the open chunk while
  ``len(chunk) + len(para) + 2 <= max_chars``;
- on overflow the open chunk is emitted and the next one starts with the
  LAST ``overlap`` characters of it (only when ``0 < overlap < len(chunk)``)
  joined to the paragraph with a blank line;
- a single paragraph longer than ``max_chars`` is never split;
- emitted chunks may exceed ``max_chars`` by up to ``overlap + 2``;
- empty/whitespace-only input -> no chunks.

``chunk_text`` is a pure, order-independent function of one row's text, so
the Spark side is embarrassingly parallel: a UDF producing
``array<string>`` followed by ``posexplode`` — no shuffle at any scale.
(A plain Python UDF, not pandas: the work is string slicing, and Arrow
serialization of big text arrays dominates any vectorization win; measured
~590 MB/s/core in the reference's pure-Python form, BASELINE.md.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_MAX_CHARS = 2000  # vectolite.py:369
DEFAULT_OVERLAP = 200


def chunk_text(
    text: str, max_chars: int = DEFAULT_MAX_CHARS, overlap: int = DEFAULT_OVERLAP
) -> list[str]:
    """Pure chunker with the reference's exact semantics (see module doc)."""
    if not text or not text.strip():
        return []
    out: list[str] = []
    buf = ""
    for para in (p.strip() for p in text.split("\n\n")):
        if not para:
            continue
        if buf and len(buf) + len(para) + 2 > max_chars:
            out.append(buf.strip())
            carry = buf[-overlap:] if 0 < overlap < len(buf) else ""
            buf = carry + "\n\n" + para if carry else para
        elif buf:
            buf = buf + "\n\n" + para
        else:
            buf = para
    if buf.strip():
        out.append(buf.strip())
    return out


def chunk_udf(max_chars: int = DEFAULT_MAX_CHARS, overlap: int = DEFAULT_OVERLAP):
    # asNondeterministic is a *plan* fence, not a semantics statement: the
    # chunker is pure, but a deterministic UDF gets inlined by projection
    # collapse into BOTH downstream uses (size() for total_chunks and
    # posexplode) — two BatchEvalPython nodes, every document chunked
    # twice. The fence keeps the UDF in its own projection so it runs
    # exactly once per row.
    return F.udf(
        lambda t: chunk_text(t or "", max_chars, overlap),
        T.ArrayType(T.StringType()),
    ).asNondeterministic()


def explode_chunks(
    df: DataFrame,
    text_col: str = "text",
    max_chars: int = DEFAULT_MAX_CHARS,
    overlap: int = DEFAULT_OVERLAP,
    keep_cols: list[str] | Column | None = None,
) -> DataFrame:
    """1 document -> N chunk rows with ``chunk_index`` / ``total_chunks``
    (the per-chunk metadata the reference attaches at vectolite.py:521-525).

    Narrow transformation: chunking + posexplode happen inside one stage,
    partition-local — survives any scale-up untouched.
    """
    keep = keep_cols if keep_cols is not None else [c for c in df.columns if c != text_col]
    arr = chunk_udf(max_chars, overlap)(F.col(text_col))
    with_chunks = df.select(*keep, arr.alias("_chunks")).withColumn(
        "total_chunks", F.size("_chunks")
    )
    return (
        with_chunks.select(
            *keep,
            "total_chunks",
            F.posexplode("_chunks").alias("chunk_index", "chunk_text"),
        )
    )
