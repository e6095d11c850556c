"""Deterministic text embeddings via the hashing trick — the bridge from
the text operators to the embedding operators (ANN / SemDeDup / PCA)
without an external model: character-n-gram counts sign-hashed into a
fixed ``dim``-dimensional vector (Weinberger et al. 2009 feature
hashing; the signed variant keeps E[<x,y>] equal to the n-gram-count
inner product), then L2-normalized so cosine similarity is meaningful.

Character n-grams are the fastText-style sub-word signal: near-duplicate
and same-domain texts share most n-grams, unrelated texts share few, and
no vocabulary needs shipping — the hash IS the vocabulary.  Useful as a
real (if shallow) embedder for dedup/clustering smoke at scale, and as
the deterministic stand-in where a model endpoint would plug in.

Scale shape: MAP-ONLY.  Per batch, texts decode to ONE utf-32 codepoint
array (the textstats reinterpret), every n-gram hashes in n vectorized
multiply-adds (a polynomial over codepoints + splitmix64 finalize — no
n-gram strings are ever built), and the (row, dim) matrix accumulates
with ONE bincount over fused row·dim+idx keys.  Output is a pure
function of (text, dim, n, seed): block-structure independent to the
bit, because integer accumulation is order-free.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

_U64 = np.uint64


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public domain, Steele et al.) — uint64 in,
    well-mixed uint64 out; numpy uint64 arithmetic wraps mod 2^64."""
    x = (x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)
    return x ^ (x >> _U64(31))


def _ngram_hashes(
    cps: np.ndarray, row_ids: np.ndarray, n: int, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """All char n-gram hashes of the flat codepoint array: returns
    (uint64 hashes, owning row id) for every window that lies inside one
    row.  Polynomial accumulate + one finalize — fully vectorized."""
    L = len(cps)
    if L < n:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    m = L - n + 1
    mask = (1 << 64) - 1
    acc = np.full(
        m, _mix64(np.asarray([seed & mask], dtype=np.uint64))[0], dtype=np.uint64
    )
    for j in range(n):
        k_j = _mix64(
            np.asarray([(seed * 1315423911 + j + 1) & mask], dtype=np.uint64)
        )[0]
        acc = acc * _U64(0x100000001B3) + cps[j : m + j].astype(np.uint64) * k_j
    h = _mix64(acc)
    valid = row_ids[: m] == row_ids[n - 1 :]
    return h[valid], row_ids[:m][valid]


def hashed_ngram_embed(
    ds: rd.Dataset,
    text_col: str = "text",
    *,
    dim: int = 128,
    n: int = 3,
    seed: int = 1,
    lowercase: bool = True,
    out_col: str = "embedding",
) -> rd.Dataset:
    """Append ``out_col``: the L2-normalized signed-hash char-n-gram
    vector of ``text_col`` (float64 list cells — the layout every
    embedding operator here consumes).  Texts shorter than ``n`` chars
    embed to the zero vector (cosine 0 against everything)."""
    if dim < 2 or n < 1:
        raise ValueError("hashed_ngram_embed: need dim >= 2 and n >= 1")

    def embed(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        nrows = len(b)
        if nrows == 0:
            out[out_col] = pd.Series([], dtype=object)
            return out
        texts = b[text_col].fillna("").astype(str)
        if lowercase:
            texts = texts.str.lower()
        lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=nrows)
        mat = np.zeros((nrows, dim), dtype=np.float64)
        if int(lens.sum()) >= n:
            flat = "".join(texts.tolist())
            cps = np.frombuffer(flat.encode("utf-32-le"), dtype="<u4")
            row_ids = np.repeat(np.arange(nrows, dtype=np.int64), lens)
            h, rows = _ngram_hashes(cps, row_ids, n, seed)
            if len(h):
                idx = (h % _U64(dim)).astype(np.int64)
                sign = 1.0 - 2.0 * ((h >> _U64(63)) & _U64(1)).astype(np.float64)
                mat = np.bincount(
                    rows * dim + idx, weights=sign, minlength=nrows * dim
                ).reshape(nrows, dim)
        norms = np.sqrt((mat * mat).sum(axis=1))
        nz = norms > 0
        mat[nz] /= norms[nz, None]
        out[out_col] = list(mat)
        return out

    return ds.map_batches(embed, batch_format="pandas")
