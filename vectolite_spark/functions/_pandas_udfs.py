"""Arrow-batched pandas UDF constructors.

NOTE: deliberately NO ``from __future__ import annotations`` here — pandas_udf
infers its eval type from the *resolved* type hints of the wrapped function.
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


def make_cosine_udf(qvec):
    """Vectorized cosine vs a fixed query vector: one (N x d) @ (d,) matmul
    per Arrow batch (the reference loops per row: vectolite.py:151-163)."""
    qarr = np.asarray(list(qvec), dtype=np.float64)
    qn = float(np.sqrt(qarr @ qarr))

    @pandas_udf("double")
    def _cos(emb: pd.Series) -> pd.Series:
        if qn == 0.0:
            return pd.Series(np.zeros(len(emb)))
        mat = np.stack(emb.to_numpy()).astype(np.float64, copy=False)
        norms = np.sqrt((mat * mat).sum(axis=1))
        dots = mat @ qarr
        with np.errstate(divide="ignore", invalid="ignore"):
            scores = np.where(norms == 0.0, 0.0, dots / (norms * qn))
        return pd.Series(scores)

    return _cos
