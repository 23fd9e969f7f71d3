"""Sequence packing for LLM pre-training batches: greedy first-fit-
sequential packing of documents into fixed-capacity token bins (the
concat-and-chunk step every training pipeline runs between curation and
tokenized shards; see e.g. the T5 / GPT-NeoX packing recipes).

Spark-first shape: packing is inherently sequential IN ITS SCAN ORDER, so
the distributed contract is "pack within a group, groups in parallel" —
here the group is the corpus ``source`` (at 100 TB you'd sub-shard hot
sources by a deterministic md5 bucket of doc_id and pack within
(source, shard); order inside a group is doc_id, so task retries repack
identically). Each group is one ``applyInPandas`` call: a single Arrow
batch in, a tiny (bins) frame out — the heavy text never moves, only
(id, n_tokens) pairs.

NOTE: the per-group pandas function is deliberately defined in a module
WITHOUT ``from __future__ import annotations`` (pandas-UDF type-hint
inference breaks under string annotations).
"""

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectolite_spark.operators.dedup import norm_tokens


def pack_sequences(
    df: DataFrame,
    capacity: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Greedy sequential packing: walk each group in ``id_col`` order,
    appending docs to the current bin until the next doc would overflow
    ``capacity``, then open a new bin (a doc longer than the capacity gets
    a bin of its own — training pipelines truncate it downstream).
    Returns one row per bin: (group, bin_id, n_docs, n_tokens).
    """
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("id"),
        F.size(norm_tokens(text_col)).alias("n_tok"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id")
        grp = pdf["grp"].iloc[0]
        rows = []
        bin_id, n_docs, fill = 0, 0, 0
        for t in pdf["n_tok"]:
            t = int(t)
            if fill > 0 and fill + t > capacity:
                rows.append((grp, bin_id, n_docs, fill))
                bin_id, n_docs, fill = bin_id + 1, 0, 0
            n_docs += 1
            fill += t
        if n_docs:
            rows.append((grp, bin_id, n_docs, fill))
        return pd.DataFrame(
            rows, columns=["grp", "bin_id", "n_docs", "n_tokens"]
        )

    out = base.groupBy("grp").applyInPandas(
        pack, "grp string, bin_id long, n_docs long, n_tokens long"
    )
    return out.select(
        F.col("grp").alias(group_col), "bin_id", "n_docs", "n_tokens"
    )
