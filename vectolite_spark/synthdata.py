"""Deterministic synthetic embedding corpora for scale validation.

The driver's parquet fixtures cap at sf0.1 (~60K rows) — enough for
correctness, far too small to say anything about ANN recall/latency at
scale (VERDICT r8 item 2: "all ANN recall evidence comes from the
2,000-vector fixture"). This module generates arbitrarily large
clustered vector corpora whose content is a PURE FUNCTION of
(seed, vec_id) — independent of partitioning, task order, and cluster
size — so recall curves and pytest floors are reproducible anywhere
without shipping gigabytes. The driver fixtures stay untouched.

Shape: ``n_clusters`` Gaussian centers (unit-ish scale), each vector =
its id's center (``vec_id % n_clusters``) + ``noise`` * N(0, I). This
gives ANN indexes real cluster structure to exploit — uniform random
64-d vectors are all near-orthogonal, which makes every ANN method look
uselessly bad and measures nothing. Queries use ids >= n (held out of
the corpus) with the same recipe, so they are in-distribution but not
corpus members."""

from __future__ import annotations

from pyspark.sql import DataFrame


def synthetic_clustered_vectors(
    spark,
    n: int,
    dim: int = 64,
    n_clusters: int = 256,
    noise: float = 0.35,
    seed: int = 42,
    start_id: int = 0,
    partitions: int = 64,
) -> DataFrame:
    """(vec_id long, embedding array<float>) — deterministic per
    (seed, vec_id); see module docstring."""

    def mapper(batches):
        import numpy as np
        import pandas as pd

        centers = np.random.default_rng(seed).normal(size=(n_clusters, dim))
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            vecs = []
            for i in ids:
                rng = np.random.default_rng((seed, int(i)))
                c = centers[int(i) % n_clusters]
                vecs.append(
                    (c + noise * rng.normal(size=dim)).astype(np.float32)
                )
            yield pd.DataFrame({"vec_id": ids, "embedding": vecs})

    return (
        spark.range(start_id, start_id + n)
        .repartition(partitions)
        .mapInPandas(mapper, "vec_id long, embedding array<float>")
    )
