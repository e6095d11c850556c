"""Relational operators, Ray-Data-first (SURVEY.md §2.4-2.6).

Join strategy (ray_guide / SURVEY §2.4):
  * small build side -> broadcast hash join: ``ray.put`` the built lookup
    ONCE, probe inside ``map_batches`` (J1/J2/J5 — the reference's
    dict-probe joins, texts.airtable.ts:62-104).
  * both sides large -> explicit partitioned hash join: add
    ``bucket = hash(key) % B`` to both sides, co-group per bucket, pandas
    merge per bucket (portable; ``Dataset.join`` exists in this Ray but the
    explicit form documents the partitioning and survives API drift).
  * semi/anti -> broadcast the key set, filter inside ``map_batches``
    (J4/J6, incl. the ``none:{}`` anti-filter at usul/texts/page.tsx:79-85).

Aggregation at scale: ``pre_aggregate`` computes per-batch partials inside
``map_batches`` (one row per key per batch) so the shuffle moves partials,
not rows (ray_guide "Aggregation at scale").
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

# imported at module top so pickle-by-value captures it — a lazy relative
# import inside a worker-executed body would fail on workers that cannot
# import the package from disk (foreign-cwd drivers)
from ..state.broadcast import cached_get


# --------------------------------------------------------------------------
# Broadcast hash join (small build side)
# --------------------------------------------------------------------------
class _BroadcastJoin:
    def __init__(self, small_ref, on: str, how: str, suffix: str):
        self.small_ref = small_ref
        self.on, self.how, self.suffix = on, how, suffix

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        small: pd.DataFrame = cached_get(self.small_ref)
        return batch.merge(small, on=self.on, how=self.how, suffixes=("", self.suffix))


def broadcast_hash_join(
    large: rd.Dataset,
    small: rd.Dataset | pd.DataFrame,
    on: str,
    *,
    how: str = "left",
    suffix: str = "_r",
    batch_size: int = 65536,
) -> rd.Dataset:
    """Join a large Dataset against a small one without a shuffle: the small
    side is materialized once into the object store and probed per batch."""
    small_df = small if isinstance(small, pd.DataFrame) else small.to_pandas()
    ref = ray.put(small_df)
    return large.map_batches(
        _BroadcastJoin(ref, on, how, suffix), batch_format="pandas", batch_size=batch_size
    )


# --------------------------------------------------------------------------
# Partitioned (bucketed) hash join — both sides large
# --------------------------------------------------------------------------
def _with_bucket(ds: rd.Dataset, on: list[str], n_buckets: int, side: str) -> rd.Dataset:
    def add(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        # deterministic bucket: hash of the key value(s) modulo B (never
        # Python hash(), which is salted per process); composite keys (J3)
        # combine per-column hashes with xor-shift
        h = pd.util.hash_array(batch[on[0]].to_numpy())
        for col in on[1:]:
            h = h * np.uint64(0x9E3779B97F4A7C15) ^ pd.util.hash_array(batch[col].to_numpy())
        out["__bucket"] = h % n_buckets
        out["__side"] = side
        return out

    return ds.map_batches(add, batch_format="pandas")


def bucketed_hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str | list[str],
    *,
    how: str = "inner",
    n_buckets: int = 32,
    right_prefix: str = "r_",
) -> rd.Dataset:
    """Explicit partitioned hash join: both sides tagged with
    ``hash(key) % n_buckets``, unioned, co-grouped per bucket, merged with
    pandas inside ``map_groups``.  One all-to-all shuffle total.

    Partitioning assumption: a single bucket's rows fit in a worker's heap;
    for skewed keys raise ``n_buckets`` or salt the hot key upstream."""
    keys = [on] if isinstance(on, str) else list(on)
    lcols = left.schema().names
    rcols = right.schema().names
    overlap = (set(lcols) & set(rcols)) - set(keys)

    l = _with_bucket(left, keys, n_buckets, "l")
    r = _with_bucket(right, keys, n_buckets, "r")

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == "l"].drop(columns=["__bucket", "__side"]).dropna(axis=1, how="all")
        rg = g[g["__side"] == "r"].drop(columns=["__bucket", "__side"]).dropna(axis=1, how="all")
        lg = lg[[c for c in lcols if c in lg.columns]]
        rg = rg[[c for c in rcols if c in rg.columns]]
        rg = rg.rename(columns={c: right_prefix + c for c in overlap})
        merged = lg.merge(rg, on=keys, how=how)
        return merged

    u = l.union(r)
    return u.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")


def native_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    *,
    how: str = "inner",
    num_partitions: int = 32,
) -> rd.Dataset:
    """Ray's built-in hash-partitioned ``Dataset.join`` (2.49+) — the
    same exchange shape as ``bucketed_hash_join`` but implemented by Ray's
    hash-shuffle aggregators.  Kept alongside the explicit version: the
    explicit one documents its partitioning and is portable across Ray
    releases; this one exercises the native path (equivalence tested)."""
    return left.join(
        right,
        join_type=how,
        num_partitions=num_partitions,
        on=(on,),
    )


def salted_groupby_sum(
    ds: rd.Dataset,
    key: str,
    value_col: str,
    *,
    n_salts: int = 16,
) -> pd.DataFrame:
    """Skew-safe grouped sum: every row's key is salted with
    ``hash(row) % n_salts`` so a hot key's rows spread over ``n_salts``
    reduce partitions; the per-(key, salt) partials then collapse in a
    second, tiny aggregation.  Use when one key holds a large fraction of
    all rows (the 10k-page-book / hot-domain case, SURVEY.md §4 skew).
    Result: (key, sum_<value_col>, n_rows) exact, order-insensitive."""
    import numpy as np

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        out = b[[key, value_col]].copy()
        out["__salt"] = np.arange(len(b)) % n_salts
        return out.groupby([key, "__salt"], as_index=False).agg(
            s=(value_col, "sum"), n=(value_col, "size")
        )

    from ray.data.aggregate import Sum

    partials = ds.map_batches(partial, batch_format="pandas")
    agg = partials.groupby([key, "__salt"]).aggregate(
        Sum("s", alias_name="s"), Sum("n", alias_name="n")
    )
    final = agg.to_pandas().groupby(key, as_index=False).agg(n_rows=("n", "sum"), s=("s", "sum"))
    final = final.rename(columns={"s": f"sum_{value_col}"})
    return final.sort_values(key).reset_index(drop=True)


# --------------------------------------------------------------------------
# Semi / anti joins (broadcast key set)
# --------------------------------------------------------------------------
class _KeyFilter:
    def __init__(self, keys_ref, on: str, keep_in: bool):
        self.keys_ref = keys_ref
        self.on, self.keep_in = on, keep_in

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        mask = batch[self.on].isin(cached_get(self.keys_ref))
        return batch[mask if self.keep_in else ~mask]


def _key_set_ref(keys: rd.Dataset, on: str):
    vals = set()
    for b in keys.select_columns([on]).iter_batches(batch_format="pyarrow"):
        vals.update(b.column(on).to_pylist())
    return ray.put(frozenset(vals))


def semi_join(ds: rd.Dataset, keys: rd.Dataset, on: str) -> rd.Dataset:
    """Rows of ``ds`` whose key appears in ``keys`` (J6 semi-filter)."""
    ref = _key_set_ref(keys, on)
    return ds.map_batches(_KeyFilter(ref, on, True), batch_format="pandas")


def anti_join(ds: rd.Dataset, keys: rd.Dataset, on: str) -> rd.Dataset:
    """Rows of ``ds`` whose key does NOT appear in ``keys`` (the
    ``AdvancedGenreToBook: {none:{}}`` anti-filter, J6)."""
    ref = _key_set_ref(keys, on)
    return ds.map_batches(_KeyFilter(ref, on, False), batch_format="pandas")


# --------------------------------------------------------------------------
# Sort / limit / pagination / distinct
# --------------------------------------------------------------------------
def top_k(ds: rd.Dataset, key: str | list[str], k: int, *, descending: bool = True) -> rd.Dataset:
    """Top-k (O1): per-batch local top-k prune first so the global sort
    moves at most k rows per input block, then sort+limit."""
    keys = [key] if isinstance(key, str) else key

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(keys, ascending=not descending).head(k)

    pruned = ds.map_batches(local_topk, batch_format="pandas")
    return pruned.sort(keys, descending=descending).limit(k)


def paginate(ds: rd.Dataset, sort_key: str, *, page: int, page_size: int, descending: bool = False) -> pd.DataFrame:
    """Offset/limit page window (A5, lib/pagination.ts:6-16): sort, then
    slice [page*size, (page+1)*size) via limit on the sorted stream."""
    start = page * page_size
    sorted_ds = ds.sort(sort_key, descending=descending)
    head = sorted_ds.limit(start + page_size).to_pandas()
    return head.iloc[start:].reset_index(drop=True)


def distinct_sorted(ds: rd.Dataset, col: str) -> pd.DataFrame:
    """Distinct values of one column (A6): per-batch dedup prunes before the
    global unique."""
    def local(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({col: pc.unique(batch.column(col))})

    vals = sorted(ds.select_columns([col]).map_batches(local, batch_format="pyarrow").unique(col))
    return pd.DataFrame({col: vals})


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    key: str,
    ts: str,
    right_cols: list[str],
    suffix: str = "_r",
) -> rd.Dataset:
    """As-of join (ray_guide pattern): for each left row, the latest right
    row of the same key with right.ts <= left.ts.  One co-grouping shuffle
    on the key, then ``pd.merge_asof`` over the ts-sorted group.  Ordering
    comes from the explicit in-group sort, never arrival order."""

    def tag(ds: rd.Dataset, side: str, cols: list[str]) -> rd.Dataset:
        def add(b: pd.DataFrame) -> pd.DataFrame:
            out = b[cols].copy()
            out["__side"] = side
            return out

        return ds.map_batches(add, batch_format="pandas")

    lcols = left.schema().names
    l = tag(left, "l", lcols)
    r = tag(right, "r", [key, ts] + [c for c in right_cols if c not in (key, ts)])

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == "l"].drop(columns="__side").dropna(axis=1, how="all")
        rg = g[g["__side"] == "r"].drop(columns="__side").dropna(axis=1, how="all")
        lg = lg[[c for c in lcols if c in lg.columns]].sort_values(ts)
        if rg.empty:
            for c in right_cols:
                if c not in (key, ts):
                    lg[c + suffix] = pd.NA
            return lg
        rg = rg[[c for c in [key, ts] + right_cols if c in rg.columns]].sort_values(ts)
        return pd.merge_asof(
            lg, rg.drop(columns=[key]), on=ts, direction="backward", suffixes=("", suffix)
        )

    u = l.union(r)
    return u.groupby(key).map_groups(per_key, batch_format="pandas")


def stratified_sample(
    ds: rd.Dataset,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    *,
    default_fraction: float = 0.0,
) -> rd.Dataset:
    """Deterministic per-stratum sampling: keep a row iff
    ``knuth_hash(id) < fraction(stratum) * 2^32`` — stable under any
    parallelism, re-run, or row order (no RNG state), and exactly
    SQL-mirrorable (pure integer arithmetic).  The training-data
    'downsample language X to y%' operation; the reference has no sampling
    operators (SURVEY §2.6), this is an extension."""
    KNUTH = 2654435761
    M = 1 << 32

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        h = (b[id_col].astype("int64") * KNUTH) % M
        thresholds = b[strata_col].map(lambda s: int(fractions.get(s, default_fraction) * M))
        return b[h < thresholds]

    return ds.map_batches(pick, batch_format="pandas")


# --------------------------------------------------------------------------
# Pre-aggregated groupby (combiner pattern)
# --------------------------------------------------------------------------
def pre_aggregate(
    ds: rd.Dataset,
    keys: list[str],
    partial_fn: Callable[[pd.DataFrame], pd.DataFrame],
    final_fn: Callable[[pd.DataFrame], pd.DataFrame],
    *,
    batch_size: int = 65536,
) -> pd.DataFrame:
    """Two-phase aggregate: ``partial_fn`` runs per batch (emit one row per
    key per batch — the combiner), the tiny partials table is then grouped
    on the driver by ``final_fn``.  The shuffle payload is |keys| x
    |batches| rows instead of every input row."""
    partials = ds.map_batches(partial_fn, batch_format="pandas", batch_size=batch_size).to_pandas()
    return final_fn(partials)
