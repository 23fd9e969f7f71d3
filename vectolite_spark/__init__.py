"""vectolite_spark — a PySpark-native engine with the query/data-processing
capabilities of the reference vector DB (singh47/vectolite, see SURVEY.md).

Design stance (SURVEY.md §7): DataFrame/Spark SQL + built-in functions only in
the hot path; zero custom Catalyst rules; Arrow-batched pandas UDFs where
Python is unavoidable (embedding providers, chunker); MLlib LSH for the
approximate-similarity scale path.
"""

from vectolite_spark.errors import EmbeddingError, VectoliteError
from vectolite_spark.session import get_spark

__all__ = ["VectoliteError", "EmbeddingError", "get_spark"]
__version__ = "0.1.0"
