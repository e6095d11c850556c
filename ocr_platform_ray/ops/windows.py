"""Event-time bucket / session operators (SURVEY.md §2.8, ray_guide
"Streaming-shaped workloads").

Ray Data has no event-time windows; the batch rendering treats the events
table as an ordered partitioned log — partition by key, sort by ts inside
the group, window with pandas.  The ordering assumption (correctness only
from the explicit in-group sort, never block arrival order) is the same one
document reassembly makes."""

from __future__ import annotations

import pandas as pd
import ray.data as rd


def time_bucket_agg(
    events: rd.Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    freq: str = "h",
) -> pd.DataFrame:
    """Tumbling-window aggregate: count + sum(value) per (key, time bucket).
    The bucket column is computed vectorized per batch, then a combiner
    pre-aggregates in-batch so the shuffle moves partials only."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[[key_col, ts_col, value_col]].copy()
        b["bucket"] = b[ts_col].dt.floor(freq)
        g = b.groupby([key_col, "bucket"], as_index=False).agg(
            n_events=(value_col, "size"), sum_value=(value_col, "sum")
        )
        return g

    partials = events.map_batches(partial, batch_format="pandas").to_pandas()
    out = partials.groupby([key_col, "bucket"], as_index=False).agg(
        n_events=("n_events", "sum"), sum_value=("sum_value", "sum")
    )
    return out.sort_values([key_col, "bucket"]).reset_index(drop=True)


def hopping_window_agg(
    events: rd.Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    size_hours: int = 2,
    step_hours: int = 1,
) -> pd.DataFrame:
    """Hopping (sliding) windows: each event belongs to size/step
    overlapping windows; the explode happens vectorized per batch (one
    extra row per hop), then the same combiner pre-aggregation as the
    tumbling case.  Emits (key, window_start, n_events, sum_value)."""
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

    partials = events.map_batches(partial, batch_format="pandas").to_pandas()
    out = partials.groupby([key_col, "window_start"], as_index=False).agg(
        n_events=("n_events", "sum"), sum_value=("sum_value", "sum")
    )
    return out.sort_values([key_col, "window_start"]).reset_index(drop=True)


def sessionize(
    events: rd.Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> pd.DataFrame:
    """Session windows: one shuffle (groupby key), in-group sort by ts, new
    session whenever the gap to the previous event exceeds ``gap_minutes``.
    Emits (key, session_id, n_events, session_start, session_end)."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col)
        new_session = (g[ts_col].diff() > gap).cumsum()
        out = g.groupby(new_session).agg(
            session_start=(ts_col, "min"), session_end=(ts_col, "max"), n_events=(ts_col, "size")
        )
        out[key_col] = g[key_col].iloc[0]
        out["session_id"] = range(len(out))
        return out[[key_col, "session_id", "session_start", "session_end", "n_events"]]

    return (
        events.groupby(key_col)
        .map_groups(per_key, batch_format="pandas")
        .to_pandas()
        .sort_values([key_col, "session_id"])
        .reset_index(drop=True)
    )
