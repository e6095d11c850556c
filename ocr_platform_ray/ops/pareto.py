"""Pareto-frontier extraction — multi-objective data selection (e.g.
"documents maximizing quality AND length", "cheapest-and-freshest
source per record"): the rows not dominated by any other row, where x
dominates y iff x is >= y on every objective and > on at least one
(after per-objective direction flips for minimized columns).  Duplicate
points never dominate each other, so exact ties all survive — the same
semantics as the SQL ``NOT EXISTS (dominator)`` mirror.

Scale shape: dominance is closed under composition — the frontier of a
union is the frontier of the union of per-part frontiers — so the local
per-batch prune is a lossless combiner (the house `top_k` shape).  The
exchange payload is each batch's frontier, typically ≪ batch size; the
finish is size-aware (driver merge while the pruned partials fit the
probe, one extra coalesced prune round past it).  The RESULT is the
frontier itself — dimension-like by contract (a frontier too big to
hold is not a selection signal); the combiner rounds are what keep the
corpus-sized input off the driver.

The per-batch kernel is fully vectorized: a sorted cummax scan for two
objectives (O(n log n)), a row-chunked broadcast dominance matrix for
three or more.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from .relational import probe_head


def _signed(df: pd.DataFrame, objectives: list[str], directions: list[str]) -> np.ndarray:
    """(n, k) float matrix with minimized columns negated, so dominance
    is uniformly 'component-wise >='."""
    cols = []
    for col, d in zip(objectives, directions):
        v = df[col].to_numpy(dtype=np.float64)
        if np.isnan(v).any():
            raise ValueError(f"pareto_frontier: objective '{col}' contains NaN/null")
        cols.append(v if d == "max" else -v)
    return np.column_stack(cols)


def _frontier_mask(m: np.ndarray, chunk: int = 512) -> np.ndarray:
    """Boolean keep-mask of non-dominated rows of the signed matrix.

    k == 2 fast path: sort by (obj0 desc, obj1 desc); a row is dominated
    iff a strictly-better-or-equal earlier row has obj1 >= its obj1 with
    at least one strict inequality — one cummax scan.  k >= 3: chunked
    (chunk, n, k) broadcast dominance so memory stays bounded."""
    n, k = m.shape
    if n == 0:
        return np.zeros(0, dtype=bool)
    if k == 2:
        order = np.lexsort((-m[:, 1], -m[:, 0]))
        s = m[order]
        # best obj1 among STRICTLY better obj0 rows: group ranks by obj0
        grp = np.concatenate(([0], np.cumsum(s[1:, 0] != s[:-1, 0])))
        run_max = np.maximum.accumulate(s[:, 1])
        # last index of the previous obj0 group, per row (-1 for group 0)
        first_of_grp = np.concatenate(([0], np.flatnonzero(np.diff(grp)) + 1))
        prev_end = first_of_grp[grp] - 1
        best_above = np.where(prev_end >= 0, run_max[np.maximum(prev_end, 0)], -np.inf)
        dominated_sorted = best_above >= s[:, 1]
        # equal-obj0 rows: dominated iff another same-obj0 row has
        # strictly larger obj1 (within-group cummax over earlier rows,
        # which are sorted obj1-descending -> just the group's first row)
        grp_best1 = s[first_of_grp, 1][grp]
        dominated_sorted |= grp_best1 > s[:, 1]
        keep = np.ones(n, dtype=bool)
        keep[order] = ~dominated_sorted
        return keep
    keep = np.ones(n, dtype=bool)
    for lo in range(0, n, chunk):
        sub = m[lo : lo + chunk]  # (c, k)
        ge = (m[:, None, :] >= sub[None, :, :]).all(-1)  # (n, c)
        gt = (m[:, None, :] > sub[None, :, :]).any(-1)
        keep[lo : lo + chunk] = ~(ge & gt).any(axis=0)
    return keep


def _prune(b: pd.DataFrame, objectives: list[str], directions: list[str]) -> pd.DataFrame:
    if len(b) == 0:
        return b
    return b[_frontier_mask(_signed(b, objectives, directions))]


def pareto_frontier(
    ds: rd.Dataset,
    objectives: list[str],
    directions: list[str] | None = None,
    *,
    driver_threshold_rows: int = 2_000_000,
) -> pd.DataFrame:
    """All non-dominated rows of ``ds`` under the given objectives
    (``directions[i]`` is ``"max"`` or ``"min"``, default all max), every
    input column preserved.  Exact — equals the SQL NOT-EXISTS-dominator
    definition including duplicate-point survival."""
    if len(objectives) < 2:
        raise ValueError("pareto_frontier: need at least two objectives")
    directions = directions or ["max"] * len(objectives)
    if len(directions) != len(objectives) or any(
        d not in ("max", "min") for d in directions
    ):
        raise ValueError("pareto_frontier: directions must be 'max'/'min' per objective")

    pruned = ds.map_batches(
        lambda b: _prune(b, objectives, directions), batch_format="pandas"
    )
    head = probe_head(pruned, driver_threshold_rows)
    if head is None:
        # one coalesced prune round cuts cross-batch redundancy before
        # the driver merge (frontier-of-frontiers is lossless)
        n_blocks = max(1, pruned.num_blocks() // 8)
        pruned = pruned.repartition(n_blocks).map_batches(
            lambda b: _prune(b, objectives, directions), batch_format="pandas"
        )
        head = pruned.to_pandas()
    if head.shape[1] == 0:  # empty Dataset -> columnless probe frame
        head = pd.DataFrame({c: pd.Series(dtype="object") for c in ds.schema().names})
    out = _prune(head, objectives, directions) if len(head) else head
    return out.sort_values(objectives).reset_index(drop=True)
