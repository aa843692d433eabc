"""Data-profiling sweep — the pre-ingest audit every large pipeline
runs before trusting a new drop of data: per-column row count, null
count and min/max in ONE streaming pass over the table (the
Deequ/dbt-test shape, expressed as per-batch partials that fold to a
|columns|-row result).

Partials run in ARROW, not pandas: an int64 column with a null in the
batch would degrade to float64 under pandas batch format (the
documented Arrow-nulls trap) and mis-profile — `pc.min_max` /
`null_count` keep integer columns integer whatever the nulls. min/max
are reported as strings for a uniform output schema but folded TYPED
(a lexicographic fold over stringified ints would rank "100" < "99");
restricted to integer and string columns because their string forms
are identical between numpy and DuckDB (``CAST(BIGINT AS VARCHAR)`` ==
``str(int)``; binary string collation == Python codepoint comparison
on ASCII) — float/timestamp formatting differs between engines, so
profiling them exactly needs an integer encoding upstream.
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
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(t: "pa.Table") -> pd.DataFrame:
        rows = []
        cols = columns if columns is not None else t.schema.names
        for c in cols:
            col = t.column(c)
            ty = col.type
            if not (pa.types.is_integer(ty) or pa.types.is_string(ty)
                    or pa.types.is_large_string(ty)):
                continue
            nn = col.null_count
            kind = "i" if pa.types.is_integer(ty) else "s"
            if len(col) - nn > 0:
                mm = pc.min_max(col).as_py()  # skips nulls, stays typed
                mn, mx = str(mm["min"]), str(mm["max"])
            else:
                mn = mx = None
            # min/max travel as STRINGS + a type tag: an object column
            # mixing ints and None would round-trip Ray's block
            # conversion as int64-with-nulls and degrade to float64
            rows.append((c, np.int64(len(col)), np.int64(nn),
                         mn, mx, kind))
        out = pd.DataFrame(
            rows,
            columns=["column", "n", "n_null", "vmin", "vmax", "kind"])
        out["n"] = out["n"].astype(np.int64)
        out["n_null"] = out["n_null"].astype(np.int64)
        return out

    parts = [b for b in ds.map_batches(partial, batch_format="pyarrow")
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
    if not len(allp):
        return empty
    rows = []
    for c, g in allp.groupby("column", sort=True):
        conv = int if (g["kind"] == "i").any() else str
        mns = [conv(v) for v in g["vmin"] if v is not None]
        mxs = [conv(v) for v in g["vmax"] if v is not None]
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
