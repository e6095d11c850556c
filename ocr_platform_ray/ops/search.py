"""Distributed BM25 retrieval (Robertson/Okapi, the Lucene-default
scoring) over a text column — the lexical sibling of ops/similarity.py's
embedding ANN.

Reference scope parity: the reference notifies a search indexer per
ingest (apps/web/src/lib/usul-pipeline.ts:187-204) and serves keyword
search over the indexed corpus; this module is the batch analogue for
corpus-scale retrieval inside the engine itself.

Scale shape: ONE tokenize pass projects each document to
(id, doc_len, tf per query term) — a narrow all-integer table that is
materialized once and reused for both the global statistics and the
scoring pass (the train-once/score-many pin, same rationale as
ops/lm.py).  Corpus statistics (N, avg doc len, per-term df) reduce
from per-batch partials map-only; the driver sees one tiny row per
block.  Scoring is then map-only against the broadcast idf table, and
top-k uses the local-prune pattern (k rows per batch leave each task).
Raw tokens never cross an exchange; there are ZERO all-to-all shuffles.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def _query_terms(query: str) -> list[str]:
    """Distinct non-empty lowercased single-space tokens, first-seen
    order (the corpus tokenization below splits the same way)."""
    seen: dict[str, None] = {}
    for t in query.lower().split(" "):
        if t:
            seen.setdefault(t, None)
    return list(seen)


def bm25_project(
    ds: rd.Dataset,
    terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Per-document projection (id, dl, tf_0..tf_{T-1}) for the given
    query terms.  Tokenization = lowercase + split on single spaces
    (exactly DuckDB ``string_split(lower(text), ' ')`` — the corpus'
    oracled tokenization, see token_df); dl counts every segment,
    empties included, so both engines agree on boundary whitespace."""

    def project(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern(pc.utf8_lower(col), pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        offs = toks.offsets.to_numpy().astype(np.int64) - toks.offsets[0].as_py()
        dl = offs[1:] - offs[:-1]
        out = pa.table({id_col: batch.column(id_col), "dl": pa.array(dl, pa.int64())})
        for j, term in enumerate(terms):
            hits = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            cums = np.concatenate([[0], np.cumsum(hits.astype(np.int64))])
            tf = cums[offs[1:]] - cums[offs[:-1]]
            out = out.append_column(f"tf_{j}", pa.array(tf, pa.int64()))
        return out

    return ds.map_batches(project, batch_format="pyarrow")


def bm25_topk(
    ds: rd.Dataset,
    query: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> pd.DataFrame:
    """Top-k documents by BM25 score for ``query``.

    idf = ln(1 + (N - df + 0.5)/(df + 0.5))  (Lucene's non-negative form)
    score(d) = sum_t idf_t * tf / (tf + k1*(1 - b + b*dl/avgdl))
    (the (k1+1) numerator constant is omitted, as in Lucene — it scales
    every document identically and changes no ranking).

    Ties rank by ascending id for a deterministic result."""
    terms = _query_terms(query)
    if not terms:
        return pd.DataFrame({id_col: pd.Series(dtype="int64"), "score": pd.Series(dtype="float64")})
    proj = bm25_project(ds, terms, id_col=id_col, text_col=text_col).materialize()

    tf_cols = [f"tf_{j}" for j in range(len(terms))]

    def partial(bdf: pd.DataFrame) -> pd.DataFrame:
        row = {"n": np.int64(len(bdf)), "sum_dl": bdf["dl"].to_numpy().sum()}
        for c in tf_cols:
            row[f"df_{c}"] = np.int64((bdf[c].to_numpy() > 0).sum())
        return pd.DataFrame([row])

    stats = proj.map_batches(partial, batch_format="pandas").to_pandas()
    # an all-empty input can skip the partial fn entirely -> column-less frame
    n_docs = int(stats["n"].sum()) if "n" in stats.columns else 0
    if n_docs == 0:
        return pd.DataFrame({id_col: pd.Series(dtype="int64"), "score": pd.Series(dtype="float64")})
    avgdl = float(stats["sum_dl"].sum()) / n_docs
    idf = np.array(
        [
            math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
            for df in (int(stats[f"df_{c}"].sum()) for c in tf_cols)
        ],
        dtype=np.float64,
    )

    def score_prune(bdf: pd.DataFrame) -> pd.DataFrame:
        dl = bdf["dl"].to_numpy().astype(np.float64)
        denom_tail = k1 * (1.0 - b + b * dl / avgdl)
        score = np.zeros(len(bdf), dtype=np.float64)
        for j, c in enumerate(tf_cols):
            tf = bdf[c].to_numpy().astype(np.float64)
            score += idf[j] * tf / np.maximum(tf + denom_tail, 1e-300)
        out = pd.DataFrame({id_col: bdf[id_col], "score": score})
        out = out[out["score"] > 0.0]
        # local prune: only k candidates leave each batch
        return out.sort_values(["score", id_col], ascending=[False, True]).head(k)

    pruned = proj.map_batches(score_prune, batch_format="pandas").to_pandas()
    if pruned.empty:
        return pd.DataFrame(
            {id_col: pd.Series(dtype="int64"), "score": pd.Series(dtype="float64")}
        )
    return (
        pruned.sort_values(["score", id_col], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
