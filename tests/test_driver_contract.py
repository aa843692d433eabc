"""Replicates the driver's verification: run every queries() entry at
sf0.01 and compare the SQL-checked ones against DuckDB exactly
(row count + sorted-column value equality)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

pytestmark = pytest.mark.usefixtures("ray_session")

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    try:
        import pyarrow as pa

        if isinstance(res, pa.Table):
            return res.to_pandas()
    except ImportError:
        pass
    return res.to_pandas()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


SQL_CHECKED = sorted(entrymod.oracle_sql())


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_duckdb(name, con):
    ray_fn = entrymod.queries()[name]
    got_raw = to_pandas(ray_fn(SF))
    exp_raw = con.sql(entrymod.oracle_sql()[name]).df()
    # The driver's value hash is dtype-sensitive: an engine int64 vs an
    # oracle float64 (e.g. un-cast DuckDB HUGEINT sums) fails its hash
    # even when values compare equal. Replicate that here by requiring
    # matching dtype *kind* per column BEFORE normalization.
    assert sorted(got_raw.columns) == sorted(exp_raw.columns), (
        sorted(got_raw.columns), sorted(exp_raw.columns))
    for c in got_raw.columns:
        gk = got_raw[c].dtype.kind
        ek = exp_raw[c].dtype.kind
        # unsigned vs signed int both hash as integers after the int64
        # normalize; object-vs-string unify to str. Everything else must
        # match exactly (i vs f is the pip_zonal failure mode).
        kind = lambda k: {"u": "i", "O": "s", "U": "s"}.get(k, k)
        assert kind(gk) == kind(ek), (c, gk, ek)
    got = normalize(got_raw)
    exp = normalize(exp_raw)
    assert list(got.columns) == list(exp.columns), (got.columns, exp.columns)
    assert len(got) == len(exp)
    for c in got.columns:
        if np.issubdtype(got[c].dtype, np.floating):
            assert np.array_equal(
                got[c].to_numpy(), exp[c].to_numpy(), equal_nan=True
            ), c
        else:
            assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c


ROWS_ONLY = sorted(set(entrymod.queries()) - set(SQL_CHECKED) - {"knn_pages_snap"})


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name):
    res = to_pandas(entrymod.queries()[name](SF))
    assert len(res) >= 0
    # determinism: second run identical
    res2 = to_pandas(entrymod.queries()[name](SF))
    a = normalize(res) if len(res) else res
    b = normalize(res2) if len(res2) else res2
    if len(res):
        pd.testing.assert_frame_equal(a, b)
    # determinism under a DIFFERENT block layout: the driver's
    # rows-only check runs a query twice and diffs, and a float or
    # order-sensitive partial merge can pass a same-layout rerun yet
    # diverge when the block boundaries move. Shrink
    # target_max_block_size so every map stage emits many more, smaller
    # blocks and assert the result is still bit-identical.
    import ray

    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 64 * 1024
    try:
        res3 = to_pandas(entrymod.queries()[name](SF))
    finally:
        ctx.target_max_block_size = old
    if len(res):
        pd.testing.assert_frame_equal(a, normalize(res3))


def test_entry_smoke():
    out = entrymod.entry()
    df = to_pandas(out)
    assert len(df) > 0
    assert {"url", "u", "v", "dist_m"} <= set(df.columns)


def test_flagship_query_runs():
    res = to_pandas(entrymod.queries()["knn_pages_snap"]("/root/testdata/sf0.001"))
    assert len(res) > 0
