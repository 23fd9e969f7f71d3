from vectolite_spark.functions.vector import (
    cosine_score,
    cosine_score_pandas,
    dot_product,
    l2_norm,
    l2_normalize,
    query_vector_literal,
)

__all__ = [
    "cosine_score",
    "cosine_score_pandas",
    "dot_product",
    "l2_norm",
    "l2_normalize",
    "query_vector_literal",
]
