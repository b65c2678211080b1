"""Streaming window operators (tumbling / sliding / session) over an
event-time column — the structured-streaming surface the north rule
requires.  Reference semantic anchors: the mutable segment as in-window
state and session-window close-on-watermark (SURVEY §2.12).

All three are expressed Ray-Data-first: window keys are derived vectorized
in ``map_batches``; the only wide step is one ``groupby`` hash shuffle.
Session windows use ``groupby(key).map_groups`` (per-key ordered scan),
which assumes per-key data fits a worker — the same assumption as any
per-session state store; hot keys are bounded by the session gap.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from paradedb_ray.pipelines.aggregate import sql_aggregate, _parse_fixed_interval


def _ts_us(batch: pa.Table, ts_col: str) -> np.ndarray:
    return batch.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)


def tumbling_window(
    ds: ray.data.Dataset,
    ts_col: str,
    every: str,
    aggs: dict,
    keys: Optional[list] = None,
    window_col: str = "window_start",
) -> ray.data.Dataset:
    """Non-overlapping windows of width ``every`` ('30s'/'5m'/'1h'/'1d')."""
    us = _parse_fixed_interval(every)

    def assign(batch: pa.Table) -> pa.Table:
        t = _ts_us(batch, ts_col)
        w = (t // us) * us
        return batch.append_column(window_col,
                                   pa.array(w).cast(pa.timestamp("us")))

    ds2 = ds.map_batches(assign, batch_format="pyarrow", batch_size=None)
    group = [window_col] + list(keys or [])
    return sql_aggregate(ds2, group, aggs).sort(group)


def sliding_window(
    ds: ray.data.Dataset,
    ts_col: str,
    size: str,
    slide: str,
    aggs: dict,
    keys: Optional[list] = None,
    window_col: str = "window_start",
) -> ray.data.Dataset:
    """Overlapping windows: each row replicates into size/slide windows
    (flat_map expansion inside map_batches, still vectorized)."""
    size_us = _parse_fixed_interval(size)
    slide_us = _parse_fixed_interval(slide)
    if size_us % slide_us != 0:
        raise ValueError("size must be a multiple of slide")
    n = size_us // slide_us

    def expand(batch: pa.Table) -> pa.Table:
        t = _ts_us(batch, ts_col)
        idx = np.repeat(np.arange(batch.num_rows), n)
        offs = np.tile(np.arange(n, dtype=np.int64) * slide_us, batch.num_rows)
        base = (np.repeat(t, n) // slide_us) * slide_us
        w = base - offs
        keep = np.repeat(t, n) < w + size_us
        out = batch.take(pa.array(idx[keep], pa.int64()))
        return out.append_column(window_col,
                                 pa.array(w[keep]).cast(pa.timestamp("us")))

    ds2 = ds.map_batches(expand, batch_format="pyarrow", batch_size=None)
    group = [window_col] + list(keys or [])
    return sql_aggregate(ds2, group, aggs).sort(group)


def session_window(
    ds: ray.data.Dataset,
    ts_col: str,
    key: str,
    gap: str,
    aggs: Optional[dict] = None,
) -> ray.data.Dataset:
    """Gap-based sessions per key: a session closes when the next event for
    the key is more than ``gap`` later (watermark-expiry analogue of
    closing a conversation's segment, SURVEY §2.12).

    Output: one row per session with ``session_start``/``session_end``/
    ``n_events`` plus requested (kind, col) aggs.
    """
    gap_us = _parse_fixed_interval(gap)
    aggs = aggs or {}

    _PD_AGG = {"count": "count", "sum": "sum", "avg": "mean",
               "min": "min", "max": "max"}

    def sessions(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(ts_col, kind="mergesort")
        t = g[ts_col].astype("int64").to_numpy()
        new = np.ones(len(t), dtype=bool)
        new[1:] = (t[1:] - t[:-1]) > gap_us
        sid = np.cumsum(new) - 1
        g = g.assign(__sid=sid, __ts_us=t)
        spec = {"session_start": ("__ts_us", "min"),
                "session_end": ("__ts_us", "max"),
                "n_events": ("__ts_us", "count")}
        for name, (kind, col) in aggs.items():
            spec[name] = (col, _PD_AGG[kind])
        out = g.groupby("__sid", sort=True).agg(**spec).reset_index(drop=True)
        for c in ("session_start", "session_end"):
            out[c] = pd.to_datetime(out[c], unit="us")
        out.insert(0, key, g[key].iloc[0])
        return out

    return ds.groupby(key).map_groups(sessions, batch_format="pandas")


