"""Embedding providers (SURVEY.md §2.6 U2-U4).

The reference ships two batch-capable providers — local SentenceTransformers
(/root/reference/vectolite.py:304-324, model cached with lru_cache) and the
OpenAI API (vectolite.py:326-346) — dispatched by ``resolve_embed_fn``
(vectolite.py:349-366). Neither dependency exists in this container, so both
are gated behind import-try and raise ``EmbeddingError`` with the same
missing-dependency contract; the deterministic hash embedder (the same stub
used to measure BASELINE.md) stands in for offline tests.

Spark-first shape: every provider is ``List[str] -> List[List[float]]``
(batch in, batch out). For DataFrame pipelines use ``embed_column`` — an
Arrow-batched pandas UDF that calls the provider once per batch, with the
model held in a per-executor-process singleton (the lru_cache pattern mapped
to Spark's execution model). The reference embeds one row per call in its
ingest loop (vectolite.py:101,521-525); we never do.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable

import numpy as np

from vectolite_spark.errors import EmbeddingError

EmbedFn = Callable[[list[str]], list[list[float]]]

DEFAULT_LOCAL_MODEL = "all-MiniLM-L6-v2"  # vectolite.py:430, Readme.md:123
DEFAULT_OPENAI_MODEL = "text-embedding-3-small"


def stub_embedder(dim: int = 64) -> EmbedFn:
    """Deterministic hash embedder: sha256(text) seeds an RNG -> float32
    vector. Same text -> same vector, across processes and executors."""

    def embed(texts: list[str]) -> list[list[float]]:
        out = []
        for t in texts:
            seed = int.from_bytes(hashlib.sha256(t.encode("utf-8")).digest()[:8], "big")
            rng = np.random.default_rng(seed)
            out.append(rng.standard_normal(dim).astype(np.float32).tolist())
        return out

    return embed


# per-executor-process model cache (maps the reference's lru_cache(2),
# vectolite.py:304-310, onto Spark's long-lived python workers)
_MODEL_CACHE: dict[str, object] = {}


def local_embedder(model_name: str = DEFAULT_LOCAL_MODEL) -> EmbedFn:
    """U2: SentenceTransformers provider (gated — not in this container)."""

    def embed(texts: list[str]) -> list[list[float]]:
        try:
            from sentence_transformers import SentenceTransformer
        except ImportError as e:  # same contract as vectolite.py:313-318
            raise EmbeddingError(
                "sentence-transformers not installed; install it or use "
                "stub_embedder/openai_embedder"
            ) from e
        model = _MODEL_CACHE.get(model_name)
        if model is None:
            model = _MODEL_CACHE.setdefault(model_name, SentenceTransformer(model_name))
        try:
            return [list(map(float, v)) for v in model.encode(texts)]
        except Exception as e:
            raise EmbeddingError(f"Local embedding failed: {e}") from e

    return embed


def openai_embedder(model_name: str = DEFAULT_OPENAI_MODEL) -> EmbedFn:
    """U3: OpenAI API provider (gated; needs OPENAI_API_KEY + network)."""

    def embed(texts: list[str]) -> list[list[float]]:
        try:
            from openai import OpenAI
        except ImportError as e:
            raise EmbeddingError("openai package not installed") from e
        try:
            client = OpenAI()
            resp = client.embeddings.create(input=texts, model=model_name)
            return [d.embedding for d in resp.data]
        except Exception as e:  # vectolite.py:343-346
            raise EmbeddingError(f"OpenAI embedding failed: {e}") from e

    return embed


def resolve_embed_fn(model: str | None = None, local: bool = True) -> EmbedFn:
    """U4 dispatch (vectolite.py:349-366): local -> U2, else U3."""
    if local:
        return local_embedder(model or DEFAULT_LOCAL_MODEL)
    return openai_embedder(model or DEFAULT_OPENAI_MODEL)


def embed_column(provider: str = "stub", dim: int = 64, model: str | None = None):
    """Arrow-batched pandas UDF: embed a string column in DataFrame pipelines.

    One provider call per Arrow batch (typically 10k rows) — the scale path
    for bulk embedding 100 TB of chunks; tune
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` to the model's sweet
    spot. Providers resolve lazily inside the executor process.
    """
    from vectolite_spark._pandas_udfs import make_embed_udf

    return make_embed_udf(provider=provider, dim=dim, model=model)
