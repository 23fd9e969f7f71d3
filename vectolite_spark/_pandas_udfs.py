"""Package-level pandas UDF constructors (no ``from __future__ import
annotations`` — pandas_udf needs resolvable type hints)."""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


def make_shingle_udf(n=3):
    """Normalized word n-gram shingles, matching the SQL-side semantics
    exactly: lower -> collapse whitespace -> split on single spaces ->
    n-token joins (docs shorter than n tokens fall back to the whole token
    string). Arrow-batched: interpreted JVM higher-order functions cost
    ~ms/row; this costs ~us/row."""
    import re

    ws = re.compile(r"\s+")

    def shingles(text):
        toks = ws.sub(" ", (text or "").strip().lower()).split(" ")
        if len(toks) >= n:
            return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        return [" ".join(toks)]

    @pandas_udf("array<string>")
    def _shingle(texts: pd.Series) -> pd.Series:
        return texts.map(shingles)

    return _shingle


def make_block_cosine_pairs_fn(min_score, decimals=6):
    """applyInPandas per blocking group: pairwise cosine via one upper-
    triangle matmul instead of interpreted per-pair fold expressions."""

    def pairs(pdf):
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "score": []}).astype(
                {"id_a": "int64", "id_b": "int64", "score": "float64"}
            )
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64, copy=False)
        norms = np.sqrt((mat * mat).sum(axis=1))
        sims = mat @ mat.T
        denom = np.outer(norms, norms)
        with np.errstate(divide="ignore", invalid="ignore"):
            sims = np.where(denom == 0.0, 0.0, sims / denom)
        sims = np.round(sims, decimals)
        iu, ju = np.triu_indices(n, k=1)
        keep = sims[iu, ju] >= min_score
        return pd.DataFrame(
            {
                "id_a": ids[iu[keep]],
                "id_b": ids[ju[keep]],
                "score": sims[iu[keep], ju[keep]],
            }
        )

    return pairs


def make_lang_udf(markers):
    """Language-ID argmax in one Arrow pass: tokenize once, intersect all
    marker sets in Python (the expression form re-tokenizes per language —
    Catalyst collapses the shared projection back into each branch).
    Tie-break: highest count, then alphabetically-first language."""
    import re

    ws = re.compile(r"\s+")
    items = sorted((lang, frozenset(ms)) for lang, ms in markers.items())

    @pandas_udf("string")
    def _pred(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = set(ws.sub(" ", (t or "").strip().lower()).split(" "))
            best, best_count = None, -1
            for lang, ms in items:
                c = len(toks & ms)
                if c > best_count:
                    best, best_count = lang, c
            out.append(best)
        return pd.Series(out)

    return _pred


def make_batch_topk_mapper(qids, qvecs, k):
    """mapInPandas mapper: per Arrow batch, score ALL queries against the
    batch with ONE (N x d) @ (d x Q) matmul and emit each query's local
    top-k rows, selected by the exact global ordering (rounded score desc,
    vec_id asc) so the downstream merge never misses a global winner.

    Output per batch: <= k * Q rows — the distributed partial top-k that
    makes batch similarity search shuffle only k*P*Q rows instead of N*Q.
    """
    qarr = np.asarray(qvecs, dtype=np.float64)  # Q x d
    qn = np.sqrt((qarr * qarr).sum(axis=1))  # Q
    qid_arr = np.asarray(qids, dtype=np.int64)

    def mapper(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64, copy=False)
            ids = pdf["vec_id"].to_numpy()
            dn = np.sqrt((mat * mat).sum(axis=1))  # N
            scores = mat @ qarr.T  # N x Q
            denom = np.outer(dn, qn)
            with np.errstate(divide="ignore", invalid="ignore"):
                scores = np.where(denom == 0.0, 0.0, scores / denom)
            scores = np.round(scores, 6)
            out_q, out_id, out_s = [], [], []
            for j in range(len(qid_arr)):
                col = scores[:, j]
                # exact (score desc, id asc) selection: lexsort's LAST key is
                # the primary sort key
                order = np.lexsort((ids, -col))
                if len(order) > k:
                    order = order[:k]
                out_q.append(np.full(len(order), qid_arr[j], dtype=np.int64))
                out_id.append(ids[order])
                out_s.append(col[order])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "vec_id": np.concatenate(out_id),
                    "score": np.concatenate(out_s),
                }
            )

    return mapper


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
