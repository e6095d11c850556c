"""Weighted source mixture: apply per-source sampling weights to a corpus
— the 'mixture proportions' step every large training-data pipeline runs
(GPT-3 Table 2.2 per-dataset sampling rates, Brown et al. 2020; Dolma's
per-source mixing, Soldaini et al. 2024).  The reference has no analogue;
this is one of the beyond-reference training-data operators.

A weight ``w`` per source means every document of that source appears
``floor(w)`` times plus one more with probability ``frac(w)`` — so
``w=0.25`` downsamples to a quarter, ``w=2.5`` emits each doc 2 or 3
times.  The fractional draw is NOT random: it is the seeded bijective
32-bit mix shared with epoch_shuffle (``ops/shuffle.py::shuffle_hash``),
compared against ``floor(frac * 2^32)``, so the SAME (key, seed) always
makes the SAME keep/drop decision regardless of parallelism, block
structure, or input order — reruns and resumed jobs sample identically,
and a SQL oracle mirrors the arithmetic exactly.  Because the mix is a
bijection, the kept fraction is exact to within 1/2^32, not just in
expectation.

Scale shape: MAP-ONLY.  No shuffle, no driver state — the weight table
is dim-sized and ships inside the closure (T2's broadcast-small-side
rule).  Upsampled copies carry ``copy_idx`` (0-based) so downstream
epoch logic can, e.g., shuffle each copy independently by folding
copy_idx into the epoch_shuffle seed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from .shuffle import shuffle_hash

_MOD32F = float(1 << 32)


def weighted_source_mixture(
    ds: rd.Dataset,
    *,
    source_col: str,
    key_col: str,
    weights: dict[str, float],
    seed: int = 0,
    copy_col: str = "copy_idx",
) -> rd.Dataset:
    """Emit each row ``floor(w) + Bernoulli(frac(w))`` times, where ``w``
    is ``weights[row[source_col]]`` and the Bernoulli draw is the
    deterministic hash of ``row[key_col]`` (unique non-negative ints
    below 2^32, the shuffle_hash domain).  Rows whose source is missing
    from ``weights`` raise — silent drops hide mixture bugs; pass an
    explicit 0.0 to exclude a source.  Output: input columns plus
    ``copy_col``."""
    for s, w in weights.items():
        if not (w >= 0.0):
            raise ValueError(f"weight for {s!r} must be >= 0, got {w}")
    wmap = {s: float(w) for s, w in weights.items()}

    def expand(b: pd.DataFrame) -> pd.DataFrame:
        # vectorized lookup: factorize + a dim-sized LUT (Series.map
        # dispatches per element under the hood; np.unique would raise
        # TypeError on a None/mixed source before the diagnostic below)
        inv, cats = pd.factorize(b[source_col], use_na_sentinel=False)
        lut = np.array(
            [wmap.get(c, np.nan) if isinstance(c, str) else np.nan for c in cats],
            dtype="float64",
        )
        if np.isnan(lut).any():
            missing = sorted(str(c) for c in cats[np.isnan(lut)])
            raise KeyError(f"sources missing from weights: {missing}")
        wv = lut[inv]
        n_full = np.floor(wv)
        # threshold in integer hash space; frac is an exact double, and
        # floor() makes the numpy and SQL comparisons bit-identical
        thr = np.floor((wv - n_full) * _MOD32F)
        sk = shuffle_hash(b[key_col].to_numpy(dtype="int64"), seed)
        copies = (n_full + (sk.astype("float64") < thr)).astype("int64")
        total = int(copies.sum())
        rep = b.iloc[np.repeat(np.arange(len(b)), copies)].reset_index(drop=True)
        offs = np.concatenate(([0], np.cumsum(copies)[:-1]))
        rep[copy_col] = np.arange(total) - np.repeat(offs, copies)
        return rep

    return ds.map_batches(expand, batch_format="pandas")
