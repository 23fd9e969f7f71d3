"""vectolite_spark — a PySpark-native engine with the query/data-processing
capabilities of the reference vector DB (singh47/vectolite, see SURVEY.md).

Design stance (SURVEY.md §7): DataFrame/Spark SQL + built-in functions only in
the hot path; zero custom Catalyst rules; Arrow-batched pandas UDFs where
Python is unavoidable (embedding providers, chunker); MLlib LSH for the
approximate-similarity scale path.
"""

from vectolite_spark.errors import EmbeddingError, VectoliteError
from vectolite_spark.session import ensure_shipped, get_spark

__all__ = [
    "VectoliteError",
    "EmbeddingError",
    "get_spark",
    "ensure_shipped",
    "SparkVectolite",
]
__version__ = "0.1.0"


def __getattr__(name):
    # lazy: importing the facade pulls pyspark.sql; keep package import light
    if name == "SparkVectolite":
        from vectolite_spark.store import SparkVectolite

        return SparkVectolite
    raise AttributeError(name)
