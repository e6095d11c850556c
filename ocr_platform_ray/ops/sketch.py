"""Mergeable quantile sketch — the approx-at-scale path for grouped
quantiles/medians (q_median_value_by_type stays the exact small-group
oracle; this is what replaces it when a group's values no longer fit one
worker).

Sketch: fixed-size equi-depth anchor set (k weighted order statistics).
Deterministic, associative merge (concat -> sort -> recompress to k by
cumulative weight), error O(1/k) in rank; EXACT while a group's total
count <= k (every value is its own anchor).  This is the classic
histogram-compression sketch (same family as Greenwald-Khanna / t-digest,
simplified to deterministic equi-depth anchors).

Exchange shape: per-batch per-group partial sketches (combiner), one
hash-shard exchange on the group key, per-shard merges; only (group,
quantile-estimate) rows reach the driver."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def _compress(values: np.ndarray, weights: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Sorted weighted value set -> at most k equi-depth anchors."""
    if len(values) <= k:
        return values, weights
    order = np.argsort(values, kind="mergesort")
    v, w = values[order], weights[order]
    cw = np.cumsum(w)
    total = cw[-1]
    # anchor i covers rank window (i, i+1]/k: take the value at the
    # window's weighted midpoint; anchor weight = window weight
    mids = (np.arange(k) + 0.5) * total / k
    idx = np.searchsorted(cw, mids, side="left")
    idx = np.clip(idx, 0, len(v) - 1)
    av = v[idx]
    aw = np.full(k, total / k)
    return av, aw


def sketch_from_values(values: np.ndarray, k: int) -> dict:
    v = np.asarray(values, dtype=np.float64)
    v = v[~np.isnan(v)]
    if v.size == 0:
        return {"v": [], "w": [], "n": 0}
    sv = np.sort(v, kind="mergesort")
    av, aw = _compress(sv, np.ones(len(sv)), k)
    return {"v": av.tolist(), "w": aw.tolist(), "n": int(v.size)}


def merge_sketches(sketches: list[dict], k: int) -> dict:
    vs = np.concatenate([np.asarray(s["v"], dtype=np.float64) for s in sketches if s["n"]])
    ws = np.concatenate([np.asarray(s["w"], dtype=np.float64) for s in sketches if s["n"]])
    n = sum(int(s["n"]) for s in sketches)
    if n == 0:
        return {"v": [], "w": [], "n": 0}
    order = np.argsort(vs, kind="mergesort")
    av, aw = _compress(vs[order], ws[order], k)
    return {"v": av.tolist(), "w": aw.tolist(), "n": n}


def sketch_quantile(sketch: dict, q: float) -> float:
    """Weighted-midpoint interpolation (matches numpy 'linear' exactly
    while every value is its own unit-weight anchor, i.e. n <= k)."""
    v = np.asarray(sketch["v"], dtype=np.float64)
    w = np.asarray(sketch["w"], dtype=np.float64)
    if v.size == 0:
        return float("nan")
    if v.size == 1:
        return float(v[0])
    cw = np.cumsum(w)
    total = cw[-1]
    # midpoint ranks (the anchor represents the middle of its mass)
    mid = cw - w / 2.0
    target = q * (total - w[0] / 2.0 - w[-1] / 2.0) + w[0] / 2.0
    return float(np.interp(target, mid, v))


def grouped_quantile_sketch(
    ds: rd.Dataset,
    key_col: str,
    value_col: str,
    *,
    quantile: float = 0.5,
    k: int = 256,
    n_shards: int = 64,
) -> pd.DataFrame:
    """Approximate grouped quantile via mergeable sketches: per-batch
    per-group partials (combiner), hash-shard exchange on the key,
    per-shard merge, driver sees (key, q_value, n) only.  Exact while a
    group's count <= k; error O(1/k) in rank beyond."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, g in b.groupby(key_col):
            rows.append({key_col: key, "sk": sketch_from_values(g[value_col].to_numpy(), k)})
        if not rows:
            # typed empty (key dtype from the batch itself): a columnless
            # empty frame diverges the per-block schema downstream
            return pd.DataFrame({key_col: b[key_col].iloc[:0], "sk": pd.Series(dtype=object)})
        return pd.DataFrame(rows)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, grp in g.groupby(key_col):
            sk = merge_sketches(list(grp["sk"]), k)
            rows.append(
                {
                    key_col: key,
                    f"q{quantile}": sketch_quantile(sk, quantile),
                    "n": int(sk["n"]),
                }
            )
        if not rows:
            return pd.DataFrame(
                {
                    key_col: g[key_col].iloc[:0],
                    f"q{quantile}": pd.Series(dtype="float64"),
                    "n": pd.Series(dtype="int64"),
                }
            )
        return pd.DataFrame(rows)

    def add_shard(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        out["__shard"] = (pd.util.hash_array(out[key_col].to_numpy()) % n_shards).astype("int64")
        return out

    partials = ds.map_batches(partial, batch_format="pandas")
    out = (
        partials.map_batches(add_shard, batch_format="pandas")
        .groupby("__shard")
        .map_groups(per_shard, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(key_col).reset_index(drop=True)
