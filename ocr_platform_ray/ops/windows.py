"""Event-time bucket / session operators (SURVEY.md §2.8, ray_guide
"Streaming-shaped workloads").

Ray Data has no event-time windows; the batch rendering treats the events
table as an ordered partitioned log — partition by key, sort by ts inside
the group, window with pandas.  The ordering assumption (correctness only
from the explicit in-group sort, never block arrival order) is the same one
document reassembly makes.

Scale shape: the tumbling/hopping aggregates pre-combine per batch (one row
per (key, bucket) per batch) and finish with the distributed hash-shard
exchange (ops.relational.sharded_group_agg) — the (key × bucket) partial
cardinality at corpus scale can exceed one machine, so the finalize must be
distributed too (only the caller's final result lands on the driver).
``sessionize``
shuffles a bounded ``hash(key) % n_shards`` label and runs one vectorized
pandas pass per shard instead of one Python call per key."""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from .relational import sharded_group_agg


def time_bucket_agg(
    events: rd.Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    freq: str = "h",
    as_dataset: bool = False,
) -> pd.DataFrame | rd.Dataset:
    """Tumbling-window aggregate: count + sum(value) per (key, time bucket).
    The bucket column is computed vectorized per batch, a combiner
    pre-aggregates in-batch so the shuffle moves partials only, and the
    partials are reduced by a distributed hash-shard exchange (the
    (key × bucket) partial set never lands on the driver un-reduced)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[[key_col, ts_col, value_col]].copy()
        b["bucket"] = b[ts_col].dt.floor(freq)
        g = b.groupby([key_col, "bucket"], as_index=False).agg(
            n_events=(value_col, "size"), sum_value=(value_col, "sum")
        )
        return g

    partials = events.map_batches(partial, batch_format="pandas")
    reduced = sharded_group_agg(
        partials, [key_col, "bucket"], {"n_events": ("n_events", "sum"), "sum_value": ("sum_value", "sum")}
    )
    if as_dataset:
        # corpus-scale consumers (write_parquet / further stages): the
        # (key x bucket) RESULT never lands on the driver
        return reduced
    out = reduced.to_pandas()
    return out.sort_values([key_col, "bucket"]).reset_index(drop=True)


def hopping_window_agg(
    events: rd.Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    size_hours: int = 2,
    step_hours: int = 1,
    as_dataset: bool = False,
) -> pd.DataFrame | rd.Dataset:
    """Hopping (sliding) windows: each event belongs to size/step
    overlapping windows; the explode happens vectorized per batch (one
    extra row per hop), then the same combiner pre-aggregation + native
    distributed finish as the tumbling case.  Emits
    (key, window_start, n_events, sum_value)."""
    hops = size_hours // step_hours

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[[key_col, ts_col, value_col]].copy()
        b["base"] = b[ts_col].dt.floor(f"{step_hours}h")
        frames = []
        for h in range(hops):
            f = b.copy()
            f["window_start"] = f["base"] - pd.Timedelta(hours=h * step_hours)
            frames.append(f)
        e = pd.concat(frames, ignore_index=True)
        return e.groupby([key_col, "window_start"], as_index=False).agg(
            n_events=(value_col, "size"), sum_value=(value_col, "sum")
        )

    partials = events.map_batches(partial, batch_format="pandas")
    reduced = sharded_group_agg(
        partials,
        [key_col, "window_start"],
        {"n_events": ("n_events", "sum"), "sum_value": ("sum_value", "sum")},
    )
    if as_dataset:
        return reduced
    out = reduced.to_pandas()
    return out.sort_values([key_col, "window_start"]).reset_index(drop=True)


def sessionize(
    events: rd.Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    n_shards: int = 64,
    as_dataset: bool = False,
) -> pd.DataFrame | rd.Dataset:
    """Session windows: ONE shuffle on ``hash(key) % n_shards`` (the
    reassemble_docs shard-exchange — every event of a key lands in the same
    shard), then a single vectorized pandas pass per shard: sort by
    (key, ts), session boundary = key change OR gap > ``gap_minutes``,
    cumsum the boundaries, aggregate per session label.  No per-key Python
    calls.  Emits (key, session_id, session_start, session_end, n_events)."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def add_shard(b: pd.DataFrame) -> pd.DataFrame:
        out = b[[key_col, ts_col]].copy()
        out["__shard"] = (pd.util.hash_array(out[key_col].to_numpy()) % n_shards).astype("int64")
        return out

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col], kind="mergesort")
        boundary = g[key_col].ne(g[key_col].shift()) | (g[ts_col].diff() > gap)
        out = (
            g.assign(__s=boundary.cumsum())
            .groupby("__s", as_index=False)
            .agg(
                **{key_col: (key_col, "first")},
                session_start=(ts_col, "min"),
                session_end=(ts_col, "max"),
                n_events=(ts_col, "size"),
            )
        )
        out["session_id"] = out.groupby(key_col).cumcount()
        return out[[key_col, "session_id", "session_start", "session_end", "n_events"]]

    sharded = events.map_batches(add_shard, batch_format="pandas")
    sessions = sharded.groupby("__shard").map_groups(per_shard, batch_format="pandas")
    if as_dataset:
        # at corpus scale the SESSION TABLE itself is corpus-sized —
        # keep it distributed for write_parquet / downstream stages
        return sessions
    return (
        sessions.to_pandas()
        .sort_values([key_col, "session_id"])
        .reset_index(drop=True)
    )
