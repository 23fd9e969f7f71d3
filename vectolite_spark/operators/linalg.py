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

__all__ = ["embedding_covariance", "gram_partials_covariance"]


def embedding_covariance(
    df: DataFrame, vec_col: str = "embedding", round_to: int = 6
) -> DataFrame:
    """Upper-triangle covariance matrix as rows (dim_i, dim_j, cov),
    1-based dims, ``cov`` rounded after exact-DECIMAL accumulation.

    cov[i,j] = E[x_i x_j] - E[x_i] E[x_j], population form (divide by n)
    — matching the dim-variance query's convention.
    """
    v = F.col(vec_col)
    d = F.size(v)
    # (i, j) upper-triangle pair ids flattened as i*d + j (0-based), with
    # the product quantized per element — order-free partial aggregation
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
                    F.get(v, i).cast("double").cast("decimal(28,12)").alias("x"),
                    F.get(v, j).cast("double").cast("decimal(28,12)").alias("y"),
                ),
            ),
        )
    )
    exploded = df.select(F.col(vec_col), d.alias("_d")).select(
        "_d", F.explode(pairs).alias("e")
    )
    agg = exploded.groupBy(F.col("e.p").alias("p"), F.col("_d")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("e.xy").alias("sxy"),
        F.sum("e.x").alias("sx"),
        F.sum("e.y").alias("sy"),
    )
    mean_xy = F.col("sxy").cast("double") / F.col("n")
    mean_x = F.col("sx").cast("double") / F.col("n")
    mean_y = F.col("sy").cast("double") / F.col("n")
    return agg.select(
        (F.floor(F.col("p") / F.col("_d")) + 1).cast("int").alias("dim_i"),
        (F.col("p") % F.col("_d") + 1).cast("int").alias("dim_j"),
        F.round(mean_xy - mean_x * mean_y, round_to).alias("cov"),
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
    return df.sparkSession.createDataFrame(
        out, "dim_i int, dim_j int, cov double"
    )
