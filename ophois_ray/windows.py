"""Event-time windowed aggregates (SURVEY.md §2.10 extension surface):
tumbling and hopping (sliding) windows over a timestamp column — the
streaming-aggregate shape Ray Data has no primitive for, expressed as
batch transforms.

Scale design: the input NEVER shuffles raw. Each batch (a) assigns
window ids with integer arithmetic (hopping windows explode each row
to its size/hop covering windows via np.repeat — the 1-D analog of the
cell-covering explode in the spatial join), then (b) pre-aggregates to
at most one PARTIAL row per (key, window) per batch. Only those
partials shuffle (one int hash-bucket exchange, joins.grouped_apply),
where an exact merge combines them. Supported aggregations are the
mergeable semigroup ops (count/sum/min/max) so partial+merge is exact;
arbitrary non-mergeable aggs belong in grouped_apply directly.

Window id convention: window ``w`` covers event times
[w*hop_us, w*hop_us + size_us) microseconds; an event at t belongs to
windows floor(t/hop_us) - size_us//hop_us + 1 .. floor(t/hop_us).
Tumbling = hop_us == size_us (each event in exactly one window).
size_us must be a multiple of hop_us.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .joins import grouped_apply

__all__ = ["hopping_window", "tumbling_window"]

_PARTIAL = {
    "count": lambda s: s.size(),
    "sum": "sum",
    "min": "min",
    "max": "max",
}
_MERGE = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}


def hopping_window(ds, *, ts_col: str, size_us: int, hop_us: int,
                   keys=(), aggs=None, window_col: str = "window_id",
                   num_buckets: int = 32):
    """Hopping (sliding) windowed aggregate; see module docstring.

    ``aggs``: {out_col: (op, in_col)} with op in count/sum/min/max
    (in_col ignored for count). Default {"n": ("count", None)}.
    Timestamps must already be int64 microseconds (callers convert
    once; keeps the arithmetic integer-exact and SQL-mirrorable).
    Returns a Dataset of keys + window_col + agg columns.
    """
    if size_us % hop_us != 0:
        raise ValueError("size_us must be a multiple of hop_us")
    m = size_us // hop_us
    keys = list(keys)
    aggs = dict(aggs) if aggs else {"n": ("count", None)}
    for out, (op, _c) in aggs.items():
        if op not in _PARTIAL:
            raise ValueError(
                f"agg {out}: op {op!r} is not mergeable (count/sum/min/max)"
            )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = df[ts_col].to_numpy(np.int64)
        base = np.floor_divide(t, hop_us)
        rows = np.repeat(np.arange(len(df), dtype=np.int64), m)
        wid = np.repeat(base, m) - np.tile(
            np.arange(m, dtype=np.int64), len(df)
        )
        sub = df.iloc[rows].reset_index(drop=True)
        sub[window_col] = wid
        g = sub.groupby(keys + [window_col], as_index=False)
        named = {}
        for out, (op, col) in aggs.items():
            if op == "count":
                named[out] = (window_col, "size")
            else:
                named[out] = (col, op)
        out = g.agg(**named)
        for c, (op, _col) in aggs.items():
            if op == "count":
                out[c] = out[c].astype(np.int64)
        return out

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys + [window_col], as_index=False)
        out = g.agg(**{c: (c, _MERGE[aggs[c][0]]) for c in aggs})
        for c, (op, _col) in aggs.items():
            if op == "count":
                out[c] = out[c].astype(np.int64)
        return out

    partials = ds.map_batches(partial, batch_format="pandas")
    return grouped_apply(
        partials, keys + [window_col], merge, num_buckets=num_buckets
    )


def tumbling_window(ds, *, ts_col: str, size_us: int, keys=(), aggs=None,
                    window_col: str = "window_id", num_buckets: int = 32):
    """Tumbling windowed aggregate: hop == size (one window per event)."""
    return hopping_window(
        ds, ts_col=ts_col, size_us=size_us, hop_us=size_us, keys=keys,
        aggs=aggs, window_col=window_col, num_buckets=num_buckets,
    )
