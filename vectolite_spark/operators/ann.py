"""Approximate nearest-neighbor search (north-star extension).

The reference only does exact brute-force scan-everything search
(/root/reference/vectolite.py:145-171). For 100 TB of vectors the scale path
is an inverted-file (IVF) index: partition vectors into cells around
centroids, probe only the nearest cell(s) at query time — the scan shrinks
from N to N * n_probe / n_cells.

Spark-first shapes:
- centroid build: posexplode + groupBy(cluster, dim) with exact DECIMAL
  sums (order-independent -> deterministic, oracle-matchable), assembled
  back into arrays. One shuffle of N*d skinny rows.
- assignment: mapInPandas matmul against the broadcast centroid matrix
  (C is small) — narrow, no shuffle.
- query: score the query against C centroids on the driver, probe the best
  cell(s), brute-force only inside them (the probe predicate prunes the
  parquet scan when the table is partitioned/bucketed by cell id).

An MLlib alternative (BucketedRandomProjectionLSH over L2-normalized
vectors approximates cosine) plugs into the same surface; it is not
oracle-matchable (randomized planes), so IVF is the declared query.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectolite_spark.operators.topk import SCORE_DECIMALS, topk_ids


def lsh_topk(
    embeddings: DataFrame,
    qvec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """MLlib BucketedRandomProjectionLSH approximate top-k.

    Cosine via the L2-normalization trick: for unit vectors,
    ||a-b||^2 = 2 - 2*cos(a,b), so Euclidean-LSH neighbors of the
    normalized query are cosine neighbors of the raw query. Randomized
    hyperplanes (seeded) => approximate; test by recall-vs-exact, not
    value-hash (SURVEY.md §7 risk register).

    Returns (id, score) — score is the EXACT rounded cosine of the
    candidates LSH surfaced, ordered score desc, id asc.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
    from pyspark.ml.functions import array_to_vector, vector_to_array
    from pyspark.ml.linalg import Vectors

    df = embeddings.select(
        F.col(id_col),
        "embedding",
        array_to_vector(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("vec"),
    )
    norm = Normalizer(inputCol="vec", outputCol="unit", p=2.0)
    unit_df = norm.transform(df)
    lsh = BucketedRandomProjectionLSH(
        inputCol="unit",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(unit_df)
    qn = math.sqrt(sum(float(x) ** 2 for x in qvec))
    qunit = Vectors.dense([float(x) / qn if qn else 0.0 for x in qvec])
    # over-fetch candidates, then rescore exactly and cut to k with the
    # engine-wide (rounded score desc, id asc) order
    cand = model.approxNearestNeighbors(unit_df, qunit, 4 * k).select(
        id_col, "embedding"
    )
    return topk_ids(cand, qvec, k, id_col=id_col)


def build_centroids(
    embeddings: DataFrame,
    cluster_col: str = "label",
    emb_col: str = "embedding",
) -> DataFrame:
    """Per-cluster mean vector with exact DECIMAL accumulation.

    Returns (cluster, centroid: array<double>). Deterministic regardless of
    partial-aggregation order — safe for oracle comparison and for
    idempotent index rebuilds.
    """
    exploded = embeddings.select(
        F.col(cluster_col).alias("cluster"),
        F.posexplode(emb_col).alias("pos", "x"),
    )
    dims = exploded.groupBy("cluster", "pos").agg(
        (
            F.sum(F.col("x").cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("c")
    )
    return dims.groupBy("cluster").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("centroid")
    )


def nearest_centroid(
    centroids: list[tuple[int, list[float]]], qvec: Sequence[float]
) -> int:
    """Driver-side probe selection: cosine against C centroids (C is tiny).
    Ties break on the rounded score, then lowest cluster id — the same total
    order as every other operator."""
    qn = math.sqrt(sum(float(x) ** 2 for x in qvec))
    best = None
    for cid, cvec in centroids:
        cn = math.sqrt(sum(float(x) ** 2 for x in cvec))
        score = (
            0.0
            if qn == 0.0 or cn == 0.0
            else sum(float(a) * float(b) for a, b in zip(cvec, qvec)) / (cn * qn)
        )
        key = (-round(score, SCORE_DECIMALS), cid)
        if best is None or key < best[0]:
            best = (key, cid)
    return best[1]


def ivf_topk(
    embeddings: DataFrame,
    qvec: Sequence[float],
    k: int = 10,
    cluster_col: str = "label",
    id_col: str = "vec_id",
    n_probe: int = 1,
) -> DataFrame:
    """IVF search: build/probe centroids, brute-force only inside the probed
    cell(s). Returns (id, score) ordered score desc, id asc.

    At scale the centroids are precomputed (index build) and the
    ``cluster in (probes)`` predicate prunes partitions; rebuilt here per
    call for self-containedness."""
    cents = [
        (r["cluster"], list(r["centroid"]))
        for r in build_centroids(embeddings, cluster_col).collect()
    ]
    probes = []
    remaining = dict(cents)
    for _ in range(min(n_probe, len(cents))):
        best = nearest_centroid(list(remaining.items()), qvec)
        probes.append(best)
        remaining.pop(best)
    cell = embeddings.filter(F.col(cluster_col).isin(probes))
    return topk_ids(cell, qvec, k, id_col=id_col)
