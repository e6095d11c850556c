"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) over hashed n-gram features, as Ray Data operators.

The published method: featurize every document as a bag of hashed word
uni+bigrams, estimate bucketed categorical distributions for a TARGET
corpus (what you want more of) and the RAW corpus (what you're selecting
from), weight each raw document by its log importance ratio
``sum_grams log(p_target[bucket] / p_raw[bucket])``, then sample without
replacement via the Gumbel top-k trick.

Scale shape (all map-only + k-bounded reduces — the ``kmeans_fit``
partial-sum pattern):

- ``dsir_fit``: each batch emits ONE ``buckets``-long count vector
  (np.bincount over the batch's flat gram buckets); the driver reduces
  n_blocks fixed-size partials per side.  No exchange, text never moves.
- ``dsir_log_weights``: the (buckets,) log-ratio array broadcasts once
  via ``ray.put``; per-row weight is ``np.add.reduceat`` over the flat
  gram-bucket lookups — segment sums are computed independently per row,
  so weights are block-structure independent (a cross-row cumsum trick
  would not be).
- ``dsir_resample``: Gumbel keys are a pure function of (seed, id) —
  deterministic under any parallelism — and selection is the local-prune
  ``top_k``, so only ~k rows per block leave each batch.

Feature fidelity: lowercased whitespace word tokens, unigrams + bigrams,
bucketed by the house 64-bit content hash mod ``buckets`` (the paper
uses 10k buckets).  Laplace smoothing on both distributions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from ..state.broadcast import cached_get
from .dedup import _sha64
from .relational import top_k


def _gram_buckets_batch(texts, buckets: int) -> tuple[np.ndarray, np.ndarray]:
    """(flat bucket ids, per-row gram counts) for every uni+bigram of the
    batch — ONE vectorized hash call (the _shingle_hashes_batch rule)."""
    all_grams: list[str] = []
    counts = np.empty(len(texts), dtype=np.int64)
    for i, text in enumerate(texts):
        toks = text.lower().split()
        n0 = len(all_grams)
        all_grams.extend(toks)
        all_grams.extend(
            toks[j] + " " + toks[j + 1] for j in range(len(toks) - 1)
        )
        counts[i] = len(all_grams) - n0
    if not all_grams:
        return np.empty(0, dtype=np.int64), counts
    flat = (_sha64(all_grams) % np.uint64(buckets)).astype(np.int64)
    return flat, counts


def _count_vector(ds: rd.Dataset, text_col: str, buckets: int) -> np.ndarray:
    """Total hashed-gram histogram over a corpus: one fixed-size partial
    per batch, driver sums n_blocks vectors."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        flat, _ = _gram_buckets_batch(list(b[text_col]), buckets)
        vec = np.bincount(flat, minlength=buckets).astype(np.int64)
        return pd.DataFrame({"vec": [vec.tolist()]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    total = np.zeros(buckets, dtype=np.int64)
    for v in parts["vec"]:
        total += np.asarray(v, dtype=np.int64)
    return total


def dsir_fit(
    target: rd.Dataset,
    raw: rd.Dataset,
    text_col: str = "text",
    *,
    buckets: int = 10_000,
    alpha: float = 1.0,
) -> np.ndarray:
    """Estimate the (buckets,) log importance ratio
    ``log p_target - log p_raw`` from hashed-gram histograms of the two
    corpora (Laplace ``alpha`` smoothing both)."""
    ct = _count_vector(target, text_col, buckets).astype(np.float64)
    cr = _count_vector(raw, text_col, buckets).astype(np.float64)
    pt = (ct + alpha) / (ct.sum() + alpha * buckets)
    pr = (cr + alpha) / (cr.sum() + alpha * buckets)
    return np.log(pt) - np.log(pr)


def dsir_log_weights(
    ds: rd.Dataset,
    text_col: str,
    log_ratio: np.ndarray,
    *,
    out_col: str = "dsir_logw",
) -> rd.Dataset:
    """Append each document's log importance weight (sum of its grams'
    log ratios).  Map-only; the ratio array broadcasts once."""
    ref = ray.put(np.ascontiguousarray(log_ratio, dtype=np.float64))

    def weigh(b: pd.DataFrame) -> pd.DataFrame:
        lr = cached_get(ref)
        flat, counts = _gram_buckets_batch(list(b[text_col]), len(lr))
        vals = lr[flat]
        offs = np.concatenate([[0], np.cumsum(counts)])[:-1]
        # reduceat sums each row's segment INDEPENDENTLY -> the weight of
        # a row never depends on its batch neighbors (block-independent);
        # rows with zero grams get weight 0
        w = np.zeros(len(b), dtype=np.float64)
        nz = counts > 0
        if vals.size:
            seg = np.add.reduceat(vals, offs[nz])
            w[nz] = seg
        out = b.copy()
        out[out_col] = w
        return out

    return ds.map_batches(weigh, batch_format="pandas")


def _gumbel01(ids, seed: int) -> np.ndarray:
    """Deterministic per-id Gumbel noise: uniform from the 64-bit content
    hash of (seed, id), then -log(-log(u)).  A pure function of the id,
    so resampling is reproducible under any block structure."""
    h = _sha64([f"{seed}:{i}" for i in ids]).astype(np.float64)
    u = (h + 0.5) / np.float64(2**64)  # (0, 1) exclusive
    return -np.log(-np.log(u))


def dsir_resample(
    ds: rd.Dataset,
    text_col: str,
    id_col: str,
    log_ratio: np.ndarray,
    k: int,
    *,
    seed: int = 17,
    gumbel: bool = True,
) -> rd.Dataset:
    """Select ``k`` documents by importance resampling WITHOUT
    replacement: top-k of ``logw + Gumbel(seed, id)`` (the Gumbel top-k
    trick == sampling k items proportionally to exp(logw) without
    replacement).  ``gumbel=False`` degrades to deterministic
    highest-weight selection.  Selection is the local-prune top_k —
    only candidate rows leave each block."""
    weighted = dsir_log_weights(ds, text_col, log_ratio, out_col="dsir_logw")

    def add_key(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        w = out["dsir_logw"].to_numpy(dtype=np.float64)
        out["dsir_key"] = w + _gumbel01(out[id_col], seed) if gumbel else w
        return out

    keyed = weighted.map_batches(add_key, batch_format="pandas")
    return top_k(keyed, "dsir_key", k)
