"""One-pass dataset profiling (the engine's ``ANALYZE``): per-column
min / max / null count / row count — the zone-map statistics a warehouse
collects before planning, and the first sanity pass a 100 TB ingest runs.

Scale shape: ONE ``map_batches`` pass emits one fixed-size partial row
per (column, batch) — min/max/nulls/count are all mergeable — and the
driver reduces |columns| x n_batches tiny rows in a single vectorized
groupby.  Zero exchanges; the data never moves.  Approximate distinct
counts compose separately via `ops/sketch.hll_distinct` (mergeable HLL
registers) when requested — kept out of the exact profile so the exact
half stays SQL-oracle-comparable."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from .relational import auto_group_agg


def _render(v) -> str | None:
    """Stable cross-engine string rendering for min/max values: ints must
    not print as floats (pandas upcasts int columns with NaNs)."""
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return None
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


def dataset_profile(
    ds: rd.Dataset,
    columns: list[str],
) -> pd.DataFrame:
    """Profile ``columns``: one row per column with ``min_v`` / ``max_v``
    (string-rendered, None for all-null), ``n_null`` and ``n_rows``.
    Deterministic and block-structure independent (min/max/sum are
    associative)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in columns:
            s = b[c]
            nn = s.notna()
            has = bool(nn.any())
            rows.append(
                {
                    "col": c,
                    "min_v": s[nn].min() if has else None,
                    "max_v": s[nn].max() if has else None,
                    "n_null": int((~nn).sum()),
                    "n_rows": int(len(s)),
                }
            )
        return pd.DataFrame(rows)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return pd.DataFrame(
            {
                "col": pd.Series(columns, dtype="object"),
                "min_v": pd.Series([None] * len(columns), dtype="object"),
                "max_v": pd.Series([None] * len(columns), dtype="object"),
                "n_null": pd.Series([0] * len(columns), dtype="int64"),
                "n_rows": pd.Series([0] * len(columns), dtype="int64"),
            }
        )
    # per-column reduce in plain python: the min_v/max_v partial column is
    # object-dtype MIXED across columns (ints next to strings), which
    # pandas' cython/numpy groupby-min chokes on; |columns| x n_batches
    # rows make this trivially driver-sized
    def _clean(vals):
        return [
            v
            for v in vals
            if v is not None and not (isinstance(v, float) and pd.isna(v))
        ]

    rows = []
    for c, grp in parts.groupby("col", sort=True):
        mns, mxs = _clean(grp["min_v"]), _clean(grp["max_v"])
        rows.append(
            {
                "col": c,
                "min_v": _render(min(mns)) if mns else None,
                "max_v": _render(max(mxs)) if mxs else None,
                "n_null": int(grp["n_null"].sum()),
                "n_rows": int(grp["n_rows"].sum()),
            }
        )
    g = pd.DataFrame(rows)
    g["n_null"] = g["n_null"].astype("int64")
    g["n_rows"] = g["n_rows"].astype("int64")
    return g.reset_index(drop=True)


def grouped_histogram(
    ds: "rd.Dataset",
    value_col: str,
    *,
    lo: float,
    hi: float,
    n_bins: int,
    group_cols: list[str] | None = None,
    bin_col: str = "bin",
    count_col: str = "n",
    driver_threshold_rows: int = 2_000_000,
    n_shards: int = 64,
):
    """Fixed-width histogram of ``value_col`` over ``[lo, hi)``,
    optionally per group — the distribution pass behind quality-score
    cutoffs and skew audits.  Bin assignment is ``min(floor((v - lo) /
    w), n_bins - 1)`` with ``w = (hi - lo) / n_bins`` — every step one
    IEEE double op, so a SQL mirror computes the identical bin (the
    LEAST guard absorbs the one-ulp case where ``(v - lo) / w`` rounds
    up to ``n_bins`` at the top edge).  Rows outside ``[lo, hi)`` and
    NaNs are dropped (SQL: a WHERE clause).  Only observed bins are
    emitted, matching a GROUP BY.

    Scale shape: map-side combiner (one (group, bin, n) row per group x
    bin per batch — bounded by n_bins x |groups|) + the size-aware
    `auto_group_agg` finish; the values themselves never move."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    gcols = list(group_cols or [])
    w = (hi - lo) / n_bins

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        v = b[value_col].to_numpy(dtype="float64")
        keep = (v >= lo) & (v < hi)  # NaN compares False on both sides
        sub = b.loc[keep, gcols].copy() if gcols else pd.DataFrame(index=b.index[keep])
        sub[bin_col] = np.minimum(
            np.floor((v[keep] - lo) / w), n_bins - 1
        ).astype("int64")
        return sub.groupby([*gcols, bin_col], as_index=False).agg(
            **{count_col: (bin_col, "size")}
        )

    reduced = auto_group_agg(
        ds.map_batches(partial, batch_format="pandas"),
        [*gcols, bin_col],
        {count_col: (count_col, "sum")},
        driver_threshold_rows=driver_threshold_rows,
        n_shards=n_shards,
    )
    if not isinstance(reduced, pd.DataFrame):
        reduced = reduced.to_pandas()
    reduced[count_col] = reduced[count_col].astype("int64")
    return reduced.sort_values([*gcols, bin_col]).reset_index(drop=True)
