"""Data-profiling sweep — the pre-ingest audit every large pipeline
runs before trusting a new drop of data: per-column row count, null
count and min/max in ONE streaming pass over the table (the
Deequ/dbt-test shape, expressed as per-batch partials that fold to a
|columns|-row result).

min/max are reported as strings for a uniform output schema but folded
TYPED (a lexicographic fold over stringified ints would rank "100" <
"99"); restricted to integer and string columns because their string
forms are identical between numpy and DuckDB (``CAST(BIGINT AS
VARCHAR)`` == ``str(int)``; binary string collation == Python
codepoint comparison on ASCII) — float/timestamp formatting differs
between engines, so profiling them exactly needs an integer encoding
upstream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def profile_table(ds, columns: list[str] | None = None):
    """Per-column profile of a Dataset: returns a pandas frame
    ``(column, n, n_null, min_s, max_s)`` sorted by column name, one
    row per profiled (int/string) column. One fused zero-shuffle pass;
    each batch contributes a <= |columns|-row partial (typed min/max
    objects) and the fold is a tiny driver-side merge (sum counts,
    min-of-mins, max-of-maxes in the COLUMN's type, stringified last).
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        cols = columns if columns is not None else list(df.columns)
        for c in cols:
            s = df[c]
            is_int = pd.api.types.is_integer_dtype(s)
            if not (is_int or s.dtype == object
                    or pd.api.types.is_string_dtype(s)):
                continue
            null = s.isna()
            sv = s[~null]
            if is_int:
                mn = int(sv.min()) if len(sv) else None
                mx = int(sv.max()) if len(sv) else None
            else:
                sv = sv.astype(str)
                mn = sv.min() if len(sv) else None
                mx = sv.max() if len(sv) else None
            rows.append((c, np.int64(len(s)), np.int64(int(null.sum())),
                         mn, mx))
        out = pd.DataFrame(
            rows, columns=["column", "n", "n_null", "vmin", "vmax"])
        out["n"] = out["n"].astype(np.int64)
        out["n_null"] = out["n_null"].astype(np.int64)
        return out

    parts = [b for b in ds.map_batches(partial, batch_format="pandas")
             .iter_batches(batch_format="pandas", batch_size=None)]
    empty = pd.DataFrame({
        "column": pd.Series(dtype=object),
        "n": pd.Series(dtype=np.int64),
        "n_null": pd.Series(dtype=np.int64),
        "min_s": pd.Series(dtype=object),
        "max_s": pd.Series(dtype=object)})
    if not parts:
        return empty
    allp = pd.concat(parts, ignore_index=True)
    rows = []
    for c, g in allp.groupby("column", sort=True):
        mns = [v for v in g["vmin"] if v is not None]
        mxs = [v for v in g["vmax"] if v is not None]
        mn = min(mns) if mns else None  # typed fold (int OR str, never mixed)
        mx = max(mxs) if mxs else None
        rows.append((c, np.int64(int(g["n"].sum())),
                     np.int64(int(g["n_null"].sum())),
                     None if mn is None else str(mn),
                     None if mx is None else str(mx)))
    out = pd.DataFrame(
        rows, columns=["column", "n", "n_null", "min_s", "max_s"])
    out["n"] = out["n"].astype(np.int64)
    out["n_null"] = out["n_null"].astype(np.int64)
    return out
