"""Exception hierarchy mirroring the reference's error surface.

Reference: ``VectoliteError`` (base) and ``EmbeddingError``
(/root/reference/vectolite.py:32-39). Every engine-level failure is wrapped
with a contextual message, same contract as the reference's DB methods.
"""


class VectoliteError(Exception):
    """Base error for all engine operations (store, query, ingest)."""


class EmbeddingError(VectoliteError):
    """Raised when an embedding provider is missing, misconfigured or fails."""
