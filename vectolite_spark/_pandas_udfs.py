"""Package-level pandas UDF constructors (no ``from __future__ import
annotations`` — pandas_udf needs resolvable type hints)."""

import pandas as pd
from pyspark.sql.functions import pandas_udf


def make_embed_udf(provider="stub", dim=64, model=None):
    def _resolve():
        # resolved inside the executor python worker, once per process
        from vectolite_spark import embed as E

        if provider == "stub":
            return E.stub_embedder(dim=dim)
        if provider == "local":
            return E.local_embedder(model or E.DEFAULT_LOCAL_MODEL)
        if provider == "openai":
            return E.openai_embedder(model or E.DEFAULT_OPENAI_MODEL)
        raise ValueError(f"unknown provider {provider!r}")

    state = {}

    @pandas_udf("array<float>")
    def _embed(texts: pd.Series) -> pd.Series:
        fn = state.get("fn")
        if fn is None:
            fn = state.setdefault("fn", _resolve())
        return pd.Series(fn(texts.tolist()))

    return _embed
