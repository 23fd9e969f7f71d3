"""Contract tests for the gated embedding providers (VERDICT r4 item 8).

The container has neither sentence-transformers nor openai, so the gated
code paths in embed.py never execute in CI — these tests pin the REQUEST
SHAPE (model name, batching, response unpacking, error wrapping) against
recorded/monkeypatched transports, without network or the real packages.
Reference contracts: /root/reference/vectolite.py:304-346.
"""

from __future__ import annotations

import sys
import types

import pytest

from vectolite_spark import embed as embed_mod
from vectolite_spark.embed import (
    DEFAULT_LOCAL_MODEL,
    DEFAULT_OPENAI_MODEL,
    local_embedder,
    openai_embedder,
    resolve_embed_fn,
)
from vectolite_spark.errors import EmbeddingError


@pytest.fixture
def fake_sentence_transformers(monkeypatch):
    """A fake sentence_transformers module that records constructions and
    encode() calls and returns deterministic 3-dim vectors."""
    calls = {"constructed": [], "encoded": []}

    class FakeModel:
        def __init__(self, name):
            calls["constructed"].append(name)
            self.name = name

        def encode(self, texts):
            calls["encoded"].append(list(texts))
            return [[float(len(t)), 1.0, -2.5] for t in texts]

    mod = types.ModuleType("sentence_transformers")
    mod.SentenceTransformer = FakeModel
    monkeypatch.setitem(sys.modules, "sentence_transformers", mod)
    monkeypatch.setattr(embed_mod, "_MODEL_CACHE", {})
    return calls


def test_local_embedder_model_name_and_batching(fake_sentence_transformers):
    calls = fake_sentence_transformers
    fn = local_embedder()
    out = fn(["ab", "cdef"])
    # one construction with the reference's default model name
    assert calls["constructed"] == [DEFAULT_LOCAL_MODEL]
    # the whole batch goes to ONE encode call (batch-in/batch-out contract)
    assert calls["encoded"] == [["ab", "cdef"]]
    assert out == [[2.0, 1.0, -2.5], [4.0, 1.0, -2.5]]
    assert all(isinstance(x, float) for v in out for x in v)


def test_local_embedder_caches_model_per_process(fake_sentence_transformers):
    calls = fake_sentence_transformers
    fn = local_embedder("custom-model")
    fn(["a"])
    fn(["b"])
    # second call reuses the cached model (the lru_cache(2) mapping,
    # vectolite.py:304-310) — exactly one construction
    assert calls["constructed"] == ["custom-model"]
    assert len(calls["encoded"]) == 2


def test_local_embedder_wraps_encode_failure(fake_sentence_transformers):
    fn = local_embedder()

    class Boom(Exception):
        pass

    mod = sys.modules["sentence_transformers"]
    orig = mod.SentenceTransformer

    class FailingModel(orig):
        def encode(self, texts):
            raise Boom("gpu fell over")

    mod.SentenceTransformer = FailingModel
    embed_mod._MODEL_CACHE.clear()
    with pytest.raises(EmbeddingError, match="Local embedding failed"):
        fn(["x"])


@pytest.fixture
def fake_openai(monkeypatch):
    """A fake openai module recording embeddings.create request bodies and
    returning the real response shape (.data[i].embedding)."""
    calls = {"create": []}

    class FakeClient:
        def __init__(self):
            class _Embeddings:
                def create(_self, input, model):
                    calls["create"].append({"input": list(input), "model": model})
                    class _Datum:
                        def __init__(self, emb):
                            self.embedding = emb

                    class _Resp:
                        data = [_Datum([0.1 * (i + 1), -0.5]) for i in range(len(input))]

                    return _Resp()

            self.embeddings = _Embeddings()

    mod = types.ModuleType("openai")
    mod.OpenAI = FakeClient
    monkeypatch.setitem(sys.modules, "openai", mod)
    return calls


def test_openai_embedder_request_body(fake_openai):
    calls = fake_openai
    out = openai_embedder()(["hello", "world", "!"])
    # one request for the whole batch, with the documented default model
    assert calls["create"] == [
        {"input": ["hello", "world", "!"], "model": DEFAULT_OPENAI_MODEL}
    ]
    assert out == [[0.1, -0.5], [0.2, -0.5], [0.30000000000000004, -0.5]]


def test_openai_embedder_custom_model(fake_openai):
    calls = fake_openai
    openai_embedder("text-embedding-3-large")(["x"])
    assert calls["create"][0]["model"] == "text-embedding-3-large"


def test_openai_embedder_wraps_api_failure(monkeypatch):
    class FailingClient:
        def __init__(self):
            raise RuntimeError("no api key")

    mod = types.ModuleType("openai")
    mod.OpenAI = FailingClient
    monkeypatch.setitem(sys.modules, "openai", mod)
    with pytest.raises(EmbeddingError, match="OpenAI embedding failed"):
        openai_embedder()(["x"])


def test_resolve_dispatch_routes_models(fake_sentence_transformers, fake_openai):
    # local=True -> U2 with the local default
    resolve_embed_fn(local=True)(["t"])
    assert fake_sentence_transformers["constructed"] == [DEFAULT_LOCAL_MODEL]
    # local=False -> U3 with the OpenAI default
    resolve_embed_fn(local=False)(["t"])
    assert fake_openai["create"][0]["model"] == DEFAULT_OPENAI_MODEL
