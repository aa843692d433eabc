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

__all__ = ["hopping_window", "tumbling_window", "watermark_late_counts"]

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


def watermark_late_counts(ds, *, us_col: str = "us",
                          arrival_col: str = "akey",
                          id_col: str = "event_id",
                          window_us: int, lateness_us: int,
                          num_buckets: int = 64,
                          sample_denom: int = 16):
    """Streaming watermark semantics replayed exactly: events arrive in
    ``(arrival_col, id_col)`` order; the watermark after each arrival
    is (running max event time) - ``lateness_us``; an event is LATE iff
    its time is below the watermark at its arrival. Returns per
    ``(win, late)`` int64 counts (win = tumbling window id over
    ``us_col``) — the allowed-lateness accounting a streaming engine
    emits, made exact and batch-replayable.

    Scale shape — a distributed ordered prefix-MAX on the TeraSort
    skeleton (sampling.rank_global: data-deterministic sampled cut
    points, so arbitrary key distributions — e.g. epoch-microsecond
    arrivals clustered in a tiny slice of int64 — still split into
    balanced ranges): (1) cuts from rows with split_hash(id) %
    sample_denom == 0, layout/rerun-independent; (2) bucket ONCE and
    materialize (both consumers reuse it); (3) per-range MAX(us) fold
    on the driver (num_buckets ints) -> exclusive running-max bases
    broadcast back; (4) per-range scan: sort by (arrival, id),
    in-range exclusive prefix max OR the base, flag lateness, emit
    (win, late) int partials; (5) tiny int-key merge. The global first
    arrival has no watermark (sentinel base) and is on time, matching
    SQL's NULL window frame.
    """
    from .sampling import range_bucket_of, sampled_range_cuts

    keys = [arrival_col, id_col]
    neg = np.int64(-(1 << 62))
    cuts = sampled_range_cuts(ds, keys, num_buckets=num_buckets,
                              sample_denom=sample_denom)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__rb"] = range_bucket_of(df, keys, cuts)
        return df

    bucketed = ds.map_batches(add_bucket, batch_format="pandas").materialize()

    def max_pass(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"b": df["__rb"].to_numpy(np.int64),
                          "m": df[us_col].to_numpy(np.int64)})
        g = g.groupby("b", as_index=False)["m"].max()
        g["m"] = g["m"].astype(np.int64)
        return g

    mparts = [p for p in bucketed.select_columns(["__rb", us_col])
              .map_batches(max_pass, batch_format="pandas")
              .iter_batches(batch_format="pandas", batch_size=None)]
    n_rb = len(cuts) + 1
    maxima = np.full(n_rb, neg, dtype=np.int64)
    for p in mparts:
        np.maximum.at(maxima, p["b"].to_numpy(), p["m"].to_numpy())
    bases = np.concatenate([[neg], np.maximum.accumulate(maxima)[:-1]])

    empty = pd.DataFrame({"win": pd.Series(dtype=np.int64),
                          "late": pd.Series(dtype=np.int64),
                          "n": pd.Series(dtype=np.int64)})

    def scan_one(df: pd.DataFrame, base: np.int64) -> pd.DataFrame:
        df = df.sort_values(keys, ignore_index=True)
        us = df[us_col].to_numpy(np.int64)
        wm = np.full(len(us), base, dtype=np.int64)
        if len(us) > 1:
            wm[1:] = np.maximum(wm[1:], np.maximum.accumulate(us[:-1]))
        late = (wm > neg) & (us < wm - np.int64(lateness_us))
        out = pd.DataFrame({"win": us // np.int64(window_us),
                            "late": late.astype(np.int64),
                            "n": np.ones(len(us), np.int64)})
        return out.groupby(["win", "late"], as_index=False)["n"].sum()

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        outs = [scan_one(g, bases[int(b)])
                for b, g in df.groupby("__rb", sort=False)]
        return pd.concat(outs, ignore_index=True) if outs else empty.copy()

    parts = grouped_apply(bucketed, "__rb", scan,
                          num_buckets=max(num_buckets, n_rb))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["win", "late"], as_index=False)["n"].sum()
        g["n"] = g["n"].astype(np.int64)
        return g

    return grouped_apply(parts, ["win", "late"], merge, num_buckets=8)


def interval_coverage(ds, *, group_col: str = "g", start_col: str = "s",
                      end_col: str = "e"):
    """Per-group sweep-line interval analytics: union coverage length,
    maximum overlap depth and interval count over half-open [s, e)
    integer intervals (the crawl-window / availability-range rollup).

    One int-keyed grouped shuffle (groups complete per bucket), then a
    fully vectorized sweep across the WHOLE bucket: +1/-1 boundary
    deltas are pre-aggregated per (group, position) — matching SQL's
    GROUP BY before the running sum, so equal-position opens/closes
    never create transient depths — and the running cumsum needs no
    per-group reset because each group's deltas sum to zero. Output
    (group_col, n_intervals, covered, max_depth)."""
    from .joins import grouped_apply

    def sweep(df: pd.DataFrame) -> pd.DataFrame:
        g = df[group_col].to_numpy(np.int64)
        s = df[start_col].to_numpy(np.int64)
        e = df[end_col].to_numpy(np.int64)
        g2 = np.concatenate([g, g])
        pos = np.concatenate([s, e])
        d = np.concatenate([np.ones(len(s), np.int64),
                            -np.ones(len(e), np.int64)])
        # aggregate deltas per (group, position), sorted by construction
        uniq, inv = np.unique(np.stack([g2, pos], axis=1),
                              axis=0, return_inverse=True)
        dd = np.bincount(inv, weights=d).astype(np.int64)
        ug, up = uniq[:, 0], uniq[:, 1]
        depth = np.cumsum(dd)  # resets at group starts: deltas sum to 0
        same = np.zeros(len(ug), dtype=bool)
        same[:-1] = ug[1:] == ug[:-1]
        seg = np.zeros(len(up), np.int64)
        seg[:-1] = np.where(same[:-1], up[1:] - up[:-1], 0)
        starts = np.r_[0, np.flatnonzero(~same[:-1]) + 1]
        lens = np.diff(np.r_[starts, len(ug)])
        covered = np.add.reduceat(np.where(depth > 0, seg, 0), starts)
        max_depth = np.maximum.reduceat(depth, starts)
        counts = pd.Series(g).value_counts().sort_index()
        out = pd.DataFrame({
            group_col: ug[starts],
            "covered": covered.astype(np.int64),
            "max_depth": max_depth.astype(np.int64)})
        out["n_intervals"] = counts.reindex(out[group_col]).to_numpy(np.int64)
        return out[[group_col, "n_intervals", "covered", "max_depth"]]

    return grouped_apply(ds, group_col, sweep)


def funnel_counts(ds, steps, *, user_col: str = "user_id",
                  type_col: str = "event_type", us_col: str = "us",
                  window_us: int = 7 * 86_400_000_000,
                  num_buckets: int = 32) -> pd.DataFrame:
    """Ordered conversion funnel: per user, step 1 anchors at the MIN
    timestamp of ``steps[0]``; step k anchors at the MIN timestamp of
    ``steps[k-1]`` STRICTLY AFTER the step-(k-1) anchor, and (for
    k >= 2) within ``window_us`` of the step-1 anchor. Strict-> on the
    integer microsecond column alone keeps every anchor a well-defined
    min — no tie-break column needed, so the SQL mirror is a stack of
    join-filter-min CTEs.

    Returns the tiny (step, users, sum_lag_us) frame: completer count
    per step and the exact int64 sum of (anchor_k - anchor_1) lags
    (integer sums — order-free, mergeable).

    Scale shape: one user-bucket shuffle of the pruned (user, type, us)
    rows; each bucket computes per-user anchors with vectorized
    groupby-mins and emits ONE partial row per step; the driver merge
    sums len(steps) rows per bucket. The raw event table never
    re-shuffles and nothing user-sized leaves the buckets."""
    if len(steps) < 1:
        raise ValueError("funnel needs at least one step")

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        cur = (df[df[type_col] == steps[0]]
               .groupby(user_col, as_index=False)[us_col].min()
               .rename(columns={us_col: "a"}))
        out_steps = [1]
        out_users = [np.int64(len(cur))]
        out_lag = [np.int64(0)]
        first = cur.rename(columns={"a": "a1"})
        for k, st in enumerate(steps[1:], start=2):
            ev = df[df[type_col] == st].merge(cur, on=user_col)
            ev = ev[ev[us_col] > ev["a"]]
            ev = ev.merge(first, on=user_col)
            ev = ev[ev[us_col] - ev["a1"] <= window_us]
            nxt = (ev.groupby(user_col, as_index=False)[us_col].min()
                   .rename(columns={us_col: "a"}))
            m = nxt.merge(first, on=user_col)
            lag = m["a"] - m["a1"]
            out_steps.append(k)
            out_users.append(np.int64(len(nxt)))
            out_lag.append(np.int64(lag.sum()) if len(nxt) else np.int64(0))
            cur = nxt
        return pd.DataFrame({"step": np.array(out_steps, np.int64),
                             "users": np.array(out_users, np.int64),
                             "sum_lag_us": np.array(out_lag, np.int64)})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("step", as_index=False).agg(
            users=("users", "sum"), sum_lag_us=("sum_lag_us", "sum"))
        g["users"] = g["users"].astype(np.int64)
        g["sum_lag_us"] = g["sum_lag_us"].astype(np.int64)
        return g

    parts = grouped_apply(ds, user_col, bucket, num_buckets=num_buckets)
    out = parts.to_pandas()
    if not len(out):     # 0-row Ray datasets drop their schema
        return pd.DataFrame({"step": pd.Series(dtype=np.int64),
                             "users": pd.Series(dtype=np.int64),
                             "sum_lag_us": pd.Series(dtype=np.int64)})
    return (merge(out).sort_values("step", ignore_index=True)
            [["step", "users", "sum_lag_us"]])
