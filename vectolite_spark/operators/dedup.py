"""Deduplication suite for training-data pipelines (SURVEY.md §2.9 extension;
BASELINE.json north-star). The reference has no dedup of any kind — these are
the operators a 100 TB corpus pipeline needs, each expressed Spark-first.

Portability contract with the DuckDB oracle: every hash is md5-hex (identical
in both engines); token normalization is whitespace-collapse + lowercase;
shingles are explicit 3-token joins. No engine-specific hash functions
(Spark's murmur3 `hash()` would be unmatchable).

Scale notes:
- exact dedup: one shuffle on the text hash (never on the full text).
- MinHash LSH: per-row signatures are narrow (partition-local); candidate
  generation shuffles (band_id, band_key) — rows = docs x bands, each tiny.
  Bucket join + distinct pairs is the classic O(candidates) instead of
  O(N^2) pairwise.
- SimHash: narrow per-row compute; near-dup groups = one shuffle on the
  16-bit signature.
- n-gram Jaccard / embedding-cosine: O(block^2) pairwise, gated by a
  blocking key (prefix / cluster id) — the standard blocking trick; at
  100 TB the block key is the shuffle key and AQE splits skewed blocks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def norm_tokens(col: Column | str) -> Column:
    """Lowercase, collapse whitespace, split on single spaces."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.regexp_replace(F.trim(F.lower(c)), r"\s+", " "), " ")


def word_shingles(tokens: Column, n: int = 3) -> Column:
    """3-token shingles as strings; docs shorter than n tokens fall back to
    the whole token string (so every doc has >= 1 shingle)."""
    joined = F.transform(
        F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, i + j) for j in range(n)]
        ),
    )
    return F.when(F.size(tokens) >= n, joined).otherwise(
        F.array(F.concat_ws(" ", tokens))
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: hash-groupBy on the text, keep the lowest id.
    Returns (keep_id, dup_count) per distinct text."""
    return df.groupBy(F.sha2(F.col(text_col), 256).alias("_h")).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("dup_count")
    ).drop("_h")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
) -> DataFrame:
    """Per-doc MinHash signature: for hash family member h, the minimum of
    md5('h:' || shingle) over the doc's 3-token shingles. md5-string min is
    order-isomorphic to a numeric minhash and portable across engines.
    Narrow (no shuffle)."""
    tokens = norm_tokens(text_col)
    sh = word_shingles(tokens)

    def hashed(prefix):
        # NB: a plain `lambda s, h=h:` would break — pyspark counts default
        # args when inferring the lambda's arity
        return lambda s: F.md5(F.concat(F.lit(prefix), s))

    cols = [F.col(id_col)]
    for h in range(num_hashes):
        cols.append(F.array_min(F.transform(sh, hashed(f"{h}:"))).alias(f"mh{h}"))
    return df.select(*cols)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    min_est_sim: float = 0.5,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded LSH over MinHash signatures.

    bands of rows=num_hashes/bands; docs sharing ANY band bucket become a
    candidate pair; estimated similarity = fraction of matching minhashes.
    Returns (doc_a, doc_b, est_sim) with doc_a < doc_b, est_sim >= threshold.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes).cache()
    band_rows = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.md5(
                        F.concat_ws(
                            "|",
                            *[
                                F.col(f"mh{b * rows_per_band + r}")
                                for r in range(rows_per_band)
                            ],
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_id", "band_key"),
    )
    a = band_rows.select(
        F.col("band_id"), F.col("band_key"), F.col(id_col).alias("doc_a")
    )
    b = band_rows.select(
        F.col("band_id"), F.col("band_key"), F.col(id_col).alias("doc_b")
    )
    cand = (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sigs.select(
        F.col(id_col).alias("doc_a"), *[F.col(f"mh{h}").alias(f"a{h}") for h in range(num_hashes)]
    )
    sb = sigs.select(
        F.col(id_col).alias("doc_b"), *[F.col(f"mh{h}").alias(f"b{h}") for h in range(num_hashes)]
    )
    matches = sum(
        F.when(F.col(f"a{h}") == F.col(f"b{h}"), 1).otherwise(0)
        for h in range(num_hashes)
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(matches / F.lit(float(num_hashes)), 6).alias("est_sim"),
        )
        .filter(F.col("est_sim") >= min_est_sim)
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
) -> DataFrame:
    """Per-doc SimHash: each token hashes to `bits` bits (leading hex of its
    md5); bit j of the signature is the sign of the +1/-1 vote sum across
    tokens. Portable: md5 + hex-nibble parse exist in both engines.
    Returns (id, simhash). Narrow (no shuffle)."""
    hexchars = bits // 4
    tokens = norm_tokens(text_col)
    hv = F.transform(
        tokens,
        lambda t: F.conv(F.substring(F.md5(t), 1, hexchars), 16, 10).cast("long"),
    )
    def voter(m):
        return lambda acc, x: acc + F.when(
            x.bitwiseAND(F.lit(m)) != 0, 1
        ).otherwise(-1)

    sig = None
    for j in range(bits):
        mask = 1 << j
        vote = F.aggregate(hv, F.lit(0), voter(mask))
        bit = F.when(vote > 0, F.lit(mask)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return df.select(F.col(id_col), sig.cast("long").alias("simhash"))


def simhash_dup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16
) -> DataFrame:
    """Docs sharing an identical SimHash (hamming distance 0 blocking).
    One shuffle on the signature."""
    s = simhash(df, text_col, id_col, bits)
    return s.groupBy("simhash").agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("group_size")
    ).filter(F.col("group_size") > 1)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_prefix: int = 40,
    min_jaccard: float = 0.6,
) -> DataFrame:
    """Pairwise word-3-gram Jaccard within prefix blocks.
    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b."""
    sh = df.select(
        F.col(id_col),
        F.substring(F.col(text_col), 1, block_prefix).alias("block"),
        F.array_distinct(word_shingles(norm_tokens(text_col))).alias("sh"),
    )
    a = sh.select(
        F.col("block"), F.col(id_col).alias("doc_a"), F.col("sh").alias("sh_a")
    )
    b = sh.select(
        F.col("block"), F.col(id_col).alias("doc_b"), F.col("sh").alias("sh_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        a.join(b, "block")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.round(inter / union, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


def embedding_cosine_pairs(
    embeddings: DataFrame,
    block_col: str = "label",
    id_col: str = "vec_id",
    min_score: float = 0.3,
) -> DataFrame:
    """Embedding near-dup pairs: pairwise cosine within a blocking key
    (cluster id / LSH bucket). Returns (id_a, id_b, score) with id_a < id_b,
    score >= threshold (rounded 6dp, same contract as topk)."""
    emb_d = lambda c: F.transform(c, lambda x: x.cast("double"))  # noqa: E731

    def dot(x, y):
        return F.aggregate(F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda a, v: a + v)

    a = embeddings.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("id_a"),
        F.col("embedding").alias("emb_a"),
    )
    b = embeddings.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("id_b"),
        F.col("embedding").alias("emb_b"),
    )
    ea, eb = emb_d(F.col("emb_a")), emb_d(F.col("emb_b"))
    na, nb = F.sqrt(dot(ea, ea)), F.sqrt(dot(eb, eb))
    score = F.round(
        F.when((na == 0.0) | (nb == 0.0), 0.0).otherwise(dot(ea, eb) / (na * nb)), 6
    )
    return (
        a.join(b, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", score.alias("score"))
        .filter(F.col("score") >= min_score)
    )
