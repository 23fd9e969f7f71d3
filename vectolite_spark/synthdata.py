"""Deterministic synthetic embedding corpora for scale validation.

The driver's parquet fixtures cap at sf0.1 (~60K rows) — enough for
correctness, far too small to say anything about ANN recall/latency at
scale (VERDICT r8 item 2: "all ANN recall evidence comes from the
2,000-vector fixture"). This module generates arbitrarily large
clustered vector corpora whose content is a PURE FUNCTION of
(seed, vec_id) — independent of partitioning, task order, and cluster
size — so recall curves and pytest floors are reproducible anywhere
without shipping gigabytes. The driver fixtures stay untouched.

Geometries (VERDICT r9 item 3 added the hard one):

- ``clustered`` — ``n_clusters`` isotropic Gaussian centers (unit-ish
  scale), each vector = its id's center (``vec_id % n_clusters``) +
  ``noise`` * N(0, I). Real cluster structure for ANN indexes to
  exploit; uniform random 64-d vectors are all near-orthogonal, which
  makes every ANN method look uselessly bad and measures nothing.
- ``aniso`` — the realistic-geometry stressor: per-cluster ANISOTROPIC
  axis scales (log-uniform over ~1.7 decades, so each cluster is a
  squashed ellipsoid with low effective dimensionality), per-cluster
  radius scales (0.3–2.0x, heteroscedastic), Zipf-ish skewed cluster
  masses (quadratic hash skew — some clusters hold ~7x the uniform
  share), and a SHARED DENSE ROTATION so none of it is axis-aligned.
  The rotation is the part that stresses PQ specifically: fixed
  m-subspaces see mixed variance instead of conveniently separable
  axes, the regime real embedding models (anisotropic, low intrinsic
  dim — e.g. Ethayarajh 2019 on contextual embedding geometry) put
  you in.

Queries use ids >= n (held out of the corpus) with the same recipe, so
they are in-distribution but not corpus members.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

GEOMETRIES = ("clustered", "aniso")


def _base_vec_factory(np, seed, dim, n_clusters, noise, geometry):
    """Returns ``base_vec(i) -> np.ndarray`` — the shared pure-function
    recipe both generators (and both geometries) derive vectors from.
    Everything global (centers, scales, rotation) is a function of
    ``seed`` alone; per-id noise comes from ``(seed, i)``, so the output
    is independent of partitioning and batch order."""
    centers = np.random.default_rng(seed).normal(size=(n_clusters, dim))
    if geometry == "clustered":

        def base_vec(i: int):
            rng = np.random.default_rng((seed, i))
            return centers[i % n_clusters] + noise * rng.normal(size=dim)

        return base_vec
    if geometry == "aniso":
        grng = np.random.default_rng((seed, 77))
        axis = np.exp(
            grng.uniform(np.log(0.02), np.log(1.0), size=(n_clusters, dim))
        )
        radius = np.exp(grng.uniform(np.log(0.3), np.log(2.0), size=n_clusters))
        rot, _ = np.linalg.qr(grng.normal(size=(dim, dim)))

        def base_vec(i: int):
            # quadratic hash skew: u^2 density concentrates mass on low
            # cluster ids (P(c < xC) = sqrt(x)) — deterministic Zipf-ish
            # imbalance without any stateful assignment
            u = ((i * 2654435761) % 4294967296) / 4294967296.0
            c = int(n_clusters * u * u) % n_clusters
            rng = np.random.default_rng((seed, i))
            v = centers[c] + noise * radius[c] * (axis[c] * rng.normal(size=dim))
            return rot @ v

        return base_vec
    raise ValueError(f"unknown geometry {geometry!r}; one of {GEOMETRIES}")


def synthetic_clustered_vectors(
    spark,
    n: int,
    dim: int = 64,
    n_clusters: int = 256,
    noise: float = 0.35,
    seed: int = 42,
    start_id: int = 0,
    partitions: int = 64,
    geometry: str = "clustered",
) -> DataFrame:
    """(vec_id long, embedding array<float>) — deterministic per
    (seed, vec_id); see module docstring."""

    def mapper(batches):
        import numpy as np
        import pandas as pd

        base_vec = _base_vec_factory(np, seed, dim, n_clusters, noise, geometry)
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            vecs = [base_vec(int(i)).astype(np.float32) for i in ids]
            yield pd.DataFrame({"vec_id": ids, "embedding": vecs})

    return (
        spark.range(start_id, start_id + n)
        .repartition(partitions)
        .mapInPandas(mapper, "vec_id long, embedding array<float>")
    )


def planted_neighbor_corpus(
    spark,
    n: int,
    n_queries: int,
    per_query: int = 10,
    dim: int = 64,
    n_clusters: int = 256,
    noise: float = 0.35,
    plant_noise: float = 0.05,
    seed: int = 42,
    partitions: int = 64,
    geometry: str = "clustered",
) -> DataFrame:
    """The corpus with PLANTED true neighbors — the standard ANN-recall
    eval design. A pure mixture-of-Gaussians corpus is pathological for
    recall@k: every intra-cluster similarity is ~the same value (for
    noise 0.35 on unit-ish centers, cos ~ 0.89 across ~n/n_clusters
    cluster-mates), so the "true top-10" is decided in the 3rd decimal —
    a resolution no quantized index (and no real-world ranking need)
    targets, and recall measures noise. Instead, the LAST
    ``n_queries * per_query`` ids are near-duplicates of the held-out
    queries (ids ``n .. n+n_queries``, same recipe as
    ``synthetic_clustered_vectors``): cos(query, planted) ~ 0.997 vs
    ~0.89 background, so the true top-``per_query`` is unambiguous and
    recall measures whether the index ROUTES and RESOLVES real
    neighbors. At the ``aniso`` geometry the tightest ellipsoids have
    within-cluster distances comparable to the plant distance, so
    planted rows make up ~75-80% of the exact top-k (measured at 30K)
    and the rest are genuine tight-cluster mates — a near-tie regime
    that is exactly where the PQ tie-width/refine operating rule is
    exercised; truth stays exact brute force either way. Everything
    stays a pure function of (seed, vec_id)."""
    plant_start = n - n_queries * per_query
    assert plant_start > 0, "corpus too small for the planted block"

    def mapper(batches):
        import numpy as np
        import pandas as pd

        base_vec = _base_vec_factory(np, seed, dim, n_clusters, noise, geometry)
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            vecs = []
            for i in ids:
                i = int(i)
                if i < plant_start:
                    v = base_vec(i)
                else:
                    qid = n + (i - plant_start) // per_query
                    rng = np.random.default_rng((seed, i, 1))
                    v = base_vec(qid) + plant_noise * rng.normal(size=dim)
                vecs.append(v.astype(np.float32))
            yield pd.DataFrame({"vec_id": ids, "embedding": vecs})

    return (
        spark.range(n)
        .repartition(partitions)
        .mapInPandas(mapper, "vec_id long, embedding array<float>")
    )
