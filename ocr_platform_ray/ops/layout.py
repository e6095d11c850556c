"""Clustered data layout + zone-map pruned reads — the data-skipping
half of a lakehouse: write a table RANGE-CLUSTERED on a column (each
output file owns a value range) and record per-file min/max (the zone
map); a later range scan opens ONLY the files whose zone intersects the
predicate.  Parquet row-group statistics give the same idea inside one
file; this gives it ACROSS files, which is what matters when the table
is 100k files on object storage and the scan wants 0.3 % of them.

Scale shape:
- cutoffs come from ONE mergeable quantile-sketch reduce
  (`ops/sketch.py` — map-side partials, k-anchor summaries; the values
  never move), so the range buckets are balanced even under skew;
- the write is ONE range exchange (bucket label from broadcast cutoffs,
  `groupby(bucket)`), each bucket task sorts its slice and writes its
  own file — append-friendly and resumable per file;
- `pruned_read` is driver-side planning over the zone map (n_files
  rows) + `read_parquet` on the selected files with the residual
  predicate applied map-side, so results are EXACT regardless of how
  coarse the zones are.

Duplicate cutoffs under extreme skew collapse (a bucket can be empty —
no file written); correctness never depends on the cutoffs, only
balance does.  Multi-node: same shared-storage rule as
ops/incremental.py.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from .sketch import grouped_sketches, sketch_quantile

_ZONEMAP = "zonemap.parquet"


def _cutoffs_from_sketch(ds: rd.Dataset, value_col: str, n_files: int, k: int) -> np.ndarray:
    tagged = ds.map_batches(
        lambda b: b[[value_col]].assign(__all=0), batch_format="pandas"
    )
    merged = grouped_sketches(tagged, "__all", value_col, k=k)
    if len(merged) == 0:
        return np.array([], dtype="float64")
    sk = merged["sk"].iloc[0]
    qs = [sketch_quantile(sk, i / n_files) for i in range(1, n_files)]
    return np.unique(np.asarray(qs, dtype="float64"))


def cluster_write(
    ds: rd.Dataset,
    value_col: str,
    out_dir: str,
    *,
    n_files: int = 32,
    sketch_k: int = 4096,
) -> pd.DataFrame:
    """Write ``ds`` range-clustered on ``value_col``: quantile-balanced
    value buckets, one sorted parquet file per non-empty bucket, and a
    ``zonemap.parquet`` manifest (file, vmin, vmax, n_rows).  Returns
    the zone map.  NaNs in ``value_col`` are rejected (a zone cannot
    bound them; filter or fill upstream)."""
    os.makedirs(out_dir, exist_ok=True)
    cutoffs = _cutoffs_from_sketch(ds, value_col, n_files, sketch_k)

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        v = b[value_col].to_numpy(dtype="float64")
        if np.isnan(v).any():
            raise ValueError(f"NaN in cluster column {value_col}")
        out = b.copy()
        out["__bucket"] = np.searchsorted(cutoffs, v, side="right").astype("int64")
        return out

    def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
        k = int(g["__bucket"].iloc[0])
        body = g.drop(columns="__bucket").sort_values(value_col, kind="mergesort")
        fname = f"cluster_{k:05d}.parquet"
        tmp = os.path.join(out_dir, fname + ".tmp")
        pq.write_table(pa.Table.from_pandas(body, preserve_index=False), tmp)
        os.replace(tmp, os.path.join(out_dir, fname))
        v = body[value_col].to_numpy(dtype="float64")
        return pd.DataFrame(
            {
                "file": [fname],
                "vmin": [float(v[0])],
                "vmax": [float(v[-1])],
                "n_rows": [len(body)],
            }
        )

    zonemap = (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(write_bucket, batch_format="pandas")
        .to_pandas()
        .sort_values("vmin")
        .reset_index(drop=True)
    )
    tmp = os.path.join(out_dir, _ZONEMAP + ".tmp")
    pq.write_table(pa.Table.from_pandas(zonemap, preserve_index=False), tmp)
    os.replace(tmp, os.path.join(out_dir, _ZONEMAP))
    return zonemap


def plan_pruned_read(
    out_dir: str, lo: float | None, hi: float | None
) -> tuple[list[str], int]:
    """Zone-map planning: the files whose [vmin, vmax] intersects the
    CLOSED interval [lo, hi] (None = unbounded), plus the total file
    count — the evidence a scan can cite for its skipping ratio."""
    zm = pq.read_table(os.path.join(out_dir, _ZONEMAP)).to_pandas()
    keep = np.ones(len(zm), dtype=bool)
    if lo is not None:
        keep &= zm["vmax"].to_numpy() >= lo
    if hi is not None:
        keep &= zm["vmin"].to_numpy() <= hi
    files = [os.path.join(out_dir, f) for f in zm.loc[keep, "file"]]
    return files, len(zm)


def pruned_read(
    out_dir: str,
    value_col: str,
    *,
    lo: float | None = None,
    hi: float | None = None,
    columns: list[str] | None = None,
) -> rd.Dataset:
    """Exact range scan ``lo <= value_col <= hi`` over a `cluster_write`
    layout: zone-map file pruning + the residual predicate map-side, so
    the result equals a full-scan filter while opening only the
    intersecting files."""
    files, _ = plan_pruned_read(out_dir, lo, hi)
    if columns is not None and value_col not in columns:
        columns = [*columns, value_col]
    if not files:
        # typed-empty: zero-row dataset with the layout's schema
        zm = pq.read_table(os.path.join(out_dir, _ZONEMAP)).to_pandas()
        if len(zm) == 0:
            raise ValueError(f"empty clustered layout at {out_dir}")
        any_file = os.path.join(out_dir, zm["file"].iloc[0])
        # Ray drops empty blocks' schema on to_pandas — build the typed
        # empty from the layout's parquet schema instead
        schema = pq.read_schema(any_file)
        names = [n for n in schema.names if columns is None or n in columns]
        empty = schema.empty_table().select(names).to_pandas()
        return rd.from_pandas(empty)

    def residual(b: pd.DataFrame) -> pd.DataFrame:
        v = b[value_col].to_numpy(dtype="float64")
        m = np.ones(len(b), dtype=bool)
        if lo is not None:
            m &= v >= lo
        if hi is not None:
            m &= v <= hi
        return b[m]

    return rd.read_parquet(files, columns=columns).map_batches(
        residual, batch_format="pandas"
    )
