"""Distributed dense linear algebra over the embedding column.

The covariance (equivalently Gram) matrix of an embedding table is the
input to PCA, whitening, and low-rank probes of representation health —
all standard steps before training an index (OPQ rotation) or auditing
an encoder. At 100 TB the only viable shape is MAP-SIDE PARTIALS: each
partition reduces its rows to one d x d Gram partial + a d-vector sum +
a count, and the shuffle moves a handful of fixed-size partials — never
rows. Two implementations, pinned against each other by pytest:

* ``embedding_covariance`` — oracle-exact: per-element products cast to
  DECIMAL(28,12) before summing, so accumulation order cannot change
  the result (the same quantization trick as the dim-variance query).
  Upper-triangle pair products explode to (pair_id, decimal) rows that
  combine map-side; the shuffle carries d*(d+1)/2 partials per
  partition regardless of corpus size.
* ``gram_partials_covariance`` — the 100 TB fast path: Arrow batches
  reduce to numpy ``V.T @ V`` partials inside ``mapInPandas`` (BLAS,
  one pass), then ≤ one tiny row per batch aggregates driver-side.
  Float64 products of float32 inputs are EXACT; only the final sums
  round, so it agrees with the exact path to ~1e-9 relative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectolite_spark.localframe import local_df

__all__ = ["embedding_covariance", "gram_partials_covariance", "pca_project"]


def embedding_covariance(
    df: DataFrame, vec_col: str = "embedding", round_to: int = 6
) -> DataFrame:
    """Upper-triangle covariance matrix as rows (dim_i, dim_j, cov),
    1-based dims, ``cov`` rounded after exact-DECIMAL accumulation.

    cov[i,j] = E[x_i x_j] - E[x_i] E[x_j], population form (divide by n)
    — matching the dim-variance query's convention.
    """
    from vectolite_spark.operators.dedup import widen_small_input

    src = widen_small_input(df.select(vec_col))
    v = F.col(vec_col)
    d = F.size(v)
    # per-dim DECIMAL sums (d rows) — the means; broadcast back into the
    # pair aggregate below instead of replicating x/y decimals per pair
    dims = (
        src.select(F.posexplode(v).alias("i", "x"))
        .groupBy("i")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("x").cast("double").cast("decimal(28,12)")).alias("s"),
        )
        .select(
            (F.col("i") + 1).alias("dim"),
            "n",
            (F.col("s").cast("double") / F.col("n")).alias("m"),
        )
    )
    # (i, j) upper-triangle pair ids flattened as i*d + j (0-based), the
    # product quantized per element — order-free partial aggregation; ONE
    # decimal per pair (means come from the d-row relation above)
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), d - 1),
            lambda i: F.transform(
                F.sequence(i, d - 1),
                lambda j: F.struct(
                    (i * d + j).alias("p"),
                    (
                        F.get(v, i).cast("double") * F.get(v, j).cast("double")
                    )
                    .cast("decimal(28,12)")
                    .alias("xy"),
                ),
            ),
        )
    )
    exploded = src.select(d.alias("_d"), F.explode(pairs).alias("e"))
    agg = exploded.groupBy(F.col("e.p").alias("p"), F.col("_d")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("e.xy").alias("sxy"),
    )
    keyed = agg.select(
        (F.floor(F.col("p") / F.col("_d")) + 1).cast("int").alias("dim_i"),
        (F.col("p") % F.col("_d") + 1).cast("int").alias("dim_j"),
        (F.col("sxy").cast("double") / F.col("n")).alias("mean_xy"),
    )
    mi = dims.select(F.col("dim").alias("dim_i"), F.col("m").alias("m_i"))
    mj = dims.select(F.col("dim").alias("dim_j"), F.col("m").alias("m_j"))
    return (
        keyed.join(F.broadcast(mi), "dim_i")
        .join(F.broadcast(mj), "dim_j")
        .select(
            "dim_i",
            "dim_j",
            # + 0.0 normalizes IEEE negative zero: ROUND of a tiny
            # negative yields -0.0 whose sign bit survives into exact
            # value-hash comparison even though -0.0 == 0.0 (the r5
            # driver red row: one cell was -0.0 here, 0.0 in DuckDB)
            (
                F.round(
                    F.col("mean_xy") - F.col("m_i") * F.col("m_j"), round_to
                )
                + F.lit(0.0)
            ).alias("cov"),
        )
    )


def gram_partials_covariance(
    df: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """The scale path: per-Arrow-batch numpy Gram partials inside
    ``mapInPandas`` (one BLAS syrk per batch), aggregated to the full
    covariance. Output schema matches ``embedding_covariance`` minus the
    rounding (raw doubles) — pytest pins agreement to 1e-6."""
    import numpy as np
    import pandas as pd

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.asarray(
                [np.asarray(x, dtype=np.float64) for x in pdf[vec_col]]
            )
            g = mat.T @ mat
            s = mat.sum(axis=0)
            d = mat.shape[1]
            yield pd.DataFrame(
                {
                    "n": [len(mat)],
                    "d": [d],
                    "gram": [g.ravel().tolist()],
                    "sums": [s.tolist()],
                }
            )

    parts = df.select(vec_col).mapInPandas(
        partials, "n long, d int, gram array<double>, sums array<double>"
    )
    rows = parts.collect()  # <= one tiny row per Arrow batch, by design
    if not rows:
        raise ValueError("empty input: covariance undefined")
    import numpy as np

    d = rows[0]["d"]
    n = sum(r["n"] for r in rows)
    g = np.zeros((d, d))
    s = np.zeros(d)
    for r in rows:
        g += np.asarray(r["gram"]).reshape(d, d)
        s += np.asarray(r["sums"])
    cov = g / n - np.outer(s / n, s / n)
    out = [
        (i + 1, j + 1, float(cov[i, j]))
        for i in range(d)
        for j in range(i, d)
    ]
    return local_df(
        df.sparkSession, out, "dim_i int, dim_j int, cov double"
    )


def pca_project(
    df: DataFrame, vec_col: str = "embedding", k: int = 8
) -> tuple[DataFrame, "list[float]"]:
    """Top-``k`` PCA projection of the embedding column — the dimension
    reduction run before ANN index build or representation audits.

    The d x d covariance comes from the Gram-partial pass (one shuffle of
    fixed-size partials); its eigendecomposition is a driver-side numpy
    call on a d x d matrix — O(d^3) with d=64..4096, never
    corpus-dependent — and the top-k basis (plus the per-component mean
    offsets) ships into the plan as LITERAL arrays, so the projection is
    k dot products per row in JVM array expressions: no Python in the
    per-row path, no shuffle at all. Returns (projected_df,
    explained_variance) where the df gains ``pca array<double>`` (length
    k, components ordered by descending eigenvalue) and
    explained_variance lists the top-k eigenvalues.

    No SQL oracle (eigendecomposition has no DuckDB twin); the pytest
    contract instead pins the linear-algebra invariants: projected
    component variances equal the eigenvalues, components decorrelate,
    and the top-k eigenvalue mass bounds captured variance.
    """
    import numpy as np

    rows = gram_partials_covariance(df, vec_col).collect()
    d = max(r["dim_j"] for r in rows)
    cov = np.zeros((d, d))
    for r in rows:
        cov[r["dim_i"] - 1, r["dim_j"] - 1] = r["cov"]
        cov[r["dim_j"] - 1, r["dim_i"] - 1] = r["cov"]
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    basis = evecs[:, order]  # d x k
    explained = [float(evals[i]) for i in order]

    mean = (
        df.select(F.posexplode(vec_col).alias("i", "x"))
        .groupBy("i")
        .agg(F.avg(F.col("x").cast("double")).alias("m"))
        .collect()
    )
    mu = np.zeros(d)
    for r in mean:
        mu[r["i"]] = r["m"]
    offsets = mu @ basis  # dot(mean, w_c) per component, driver-side

    v = F.col(vec_col)
    comps = []
    for c in range(k):
        w = F.array(*[F.lit(float(x)) for x in basis[:, c]])
        dot = F.aggregate(
            F.zip_with(v, w, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        comps.append(dot - F.lit(float(offsets[c])))
    return df.withColumn("pca", F.array(*comps)), explained
