"""Content-defined chunking (the Rabin-fingerprint boundary family —
Muthitacharoen 2001 LBFS; FastCDC 2016 is the same idea with a faster
rolling hash) — dedup-friendly blob segmentation for the storage layer:
chunk boundaries depend on CONTENT, not offsets, so inserting bytes
into the middle of a large blob shifts only the chunks that contain the
edit — every later chunk re-aligns and its hash matches the original
(fixed-size chunking loses everything after the edit point).  Feeds
chunk-hash dedup across crawl snapshots of near-identical pages and
delta-friendly storage.

The rolling hash is a fixed-``window`` polynomial over an ODD 64-bit
base P, computed for ALL positions vectorized (no per-byte Python):
with wrapping uint64 arithmetic,

    H_i = P^i · (A_{i+1} − A_{i−w+1}),   A_k = Σ_{j<k} b_j · P^{−j}

— P is odd so P^{−1} mod 2^64 exists; prefix sums/products are single
numpy cumsum/cumprod passes.  A position is a CANDIDATE boundary when
the TOP log2(avg_size) bits of a final odd-multiply mix of H_i are
zero — low product bits are parity-biased on low-entropy text (an odd
multiplier preserves low-bit structure, so ``H & mask`` under-fires on
small-alphabet prose; probed), while high bits of wrapping products
mix well.  The min/max walk then runs over the sparse candidate list
only (~len/avg_size entries).  Map-only; one row per
chunk."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data as rd

_P = np.uint64(0x9E3779B97F4A7C15)  # odd -> invertible mod 2^64


def _pinv(p: int) -> int:
    # Newton iteration for the inverse of an odd number mod 2^64
    x = p
    for _ in range(6):
        x = (x * (2 - p * x)) % (1 << 64)
    return x


_PINV = np.uint64(_pinv(int(_P)))


def _rolling_hash(data: np.ndarray, window: int) -> np.ndarray:
    """H_i for every position i >= window-1 (uint64 wrap arithmetic)."""
    n = len(data)
    if n < window:
        return np.empty(0, dtype="uint64")
    idx = np.arange(n, dtype="uint64")
    with np.errstate(over="ignore"):
        pinv_pow = np.empty(n, dtype="uint64")
        pinv_pow[0] = np.uint64(1)
        np.cumprod(np.full(n - 1, _PINV, dtype="uint64"), out=pinv_pow[1:])
        p_pow = np.empty(n, dtype="uint64")
        p_pow[0] = np.uint64(1)
        np.cumprod(np.full(n - 1, _P, dtype="uint64"), out=p_pow[1:])
        terms = data.astype("uint64") * pinv_pow
        a = np.zeros(n + 1, dtype="uint64")
        np.cumsum(terms, out=a[1:])
        i = np.arange(window - 1, n)
        h = p_pow[i] * (a[i + 1] - a[i - window + 1])
    _ = idx
    return h


def _boundaries(
    data: bytes, min_size: int, avg_size: int, max_size: int, window: int
) -> list[int]:
    n = len(data)
    if n == 0:
        return []
    arr = np.frombuffer(data, dtype="uint8")
    h = _rolling_hash(arr, window)
    shift = np.uint64(64 - int(avg_size).bit_length() + 1)
    with np.errstate(over="ignore"):
        mixed = h * np.uint64(0xFF51AFD7ED558CCD)  # murmur3 finalizer odd
    cand = (np.nonzero((mixed >> shift) == np.uint64(0))[0] + (window - 1)).tolist()
    cuts = []
    start = 0
    ci = 0
    while n - start > max_size:
        # next candidate at least min_size past start, else force max
        cut = None
        while ci < len(cand) and cand[ci] < start + min_size:
            ci += 1
        if ci < len(cand) and cand[ci] < start + max_size:
            cut = cand[ci] + 1
            ci += 1
        else:
            cut = start + max_size
        cuts.append(cut)
        start = cut
    return cuts


def content_defined_chunks(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    data_col: str = "blob",
    *,
    min_size: int = 2048,
    avg_size: int = 8192,
    max_size: int = 65536,
    window: int = 48,
) -> rd.Dataset:
    """(id, chunk_idx, start, length, chunk_hash) per content-defined
    chunk; ``avg_size`` must be a power of two (the boundary mask).
    str payloads hash over their UTF-8 bytes; lengths are byte lengths.
    Map-only — each blob chunks inside its own batch."""
    if avg_size & (avg_size - 1):
        raise ValueError("avg_size must be a power of two")
    if not (0 < min_size <= avg_size <= max_size):
        raise ValueError("need 0 < min_size <= avg_size <= max_size")

    def per_batch(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for rid, blob in zip(b[id_col], b[data_col]):
            data = (
                blob.encode("utf-8") if isinstance(blob, str)
                else bytes(blob or b"")
            )
            cuts = _boundaries(data, min_size, avg_size, max_size, window)
            starts = [0] + cuts
            ends = cuts + [len(data)]
            for ci, (s, e) in enumerate(zip(starts, ends)):
                if e <= s:
                    continue
                rows.append(
                    {
                        id_col: rid,
                        "chunk_idx": ci,
                        "start": s,
                        "length": e - s,
                        "chunk_hash": hashlib.sha1(data[s:e]).hexdigest()[:16],
                    }
                )
        cols = [id_col, "chunk_idx", "start", "length", "chunk_hash"]
        return pd.DataFrame(rows, columns=cols)

    return ds.map_batches(per_batch, batch_format="pandas")
