"""sampling.py — deterministic splits / samples / distinct counts /
hash shards. Kernel-level checks plus distributed-vs-sequential parity;
the DuckDB bit-parity of the four catalog queries is covered by
test_driver_contract.py."""

import os

import numpy as np
import pandas as pd
import pytest

import ray.data

from ophois_ray import sampling

pytestmark = pytest.mark.usefixtures("ray_session")


def test_split_hash_exact_and_bounded():
    k = np.array([0, 1, 7, (1 << 31) - 1], dtype=np.int64)
    h = sampling.split_hash(k)
    # reference values computed with exact Python ints
    exp = [(int(x) * 1103515245 + 12345) % ((1 << 61) - 1) for x in k]
    assert h.tolist() == exp
    assert (h >= 0).all() and (h < (1 << 61) - 1).all()


def test_split_hash_rejects_unsafe_keys():
    with pytest.raises(ValueError):
        sampling.split_hash(np.array([1 << 31], dtype=np.int64))
    with pytest.raises(ValueError):
        sampling.split_hash(np.array([-1], dtype=np.int64))
    with pytest.raises(TypeError):
        sampling.split_hash(np.array([0.5]))


def _df(n=1000, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "key": np.arange(n, dtype=np.int64),
            "grp": rng.choice(["a", "b", "c"], size=n),
            "val": rng.integers(0, 50, size=n, dtype=np.int64),
        }
    )


def test_hash_split_deterministic_across_block_layouts():
    df = _df()
    one = sampling.hash_split(ray.data.from_pandas(df), "key").to_pandas()
    many = sampling.hash_split(
        ray.data.from_pandas(df).repartition(7), "key"
    ).to_pandas()
    a = one.sort_values("key").reset_index(drop=True)
    b = many.sort_values("key").reset_index(drop=True)
    assert a["split"].tolist() == b["split"].tolist()
    # fractions roughly honored (hash-uniform; wide tolerance)
    frac = (a["split"] == "train").mean()
    assert 0.7 < frac < 0.9
    assert set(a["split"]) == {"train", "val", "test"}


def test_sample_per_group_matches_sequential_topn():
    df = _df()
    got = (
        sampling.sample_per_group(
            ray.data.from_pandas(df).repartition(9), "grp", "key", 5
        )
        .to_pandas()
        .sort_values(["grp", "rk"])
        .reset_index(drop=True)
    )
    # sequential oracle: n smallest (hash, key) per group, ranked
    seq = df.assign(__h=sampling.split_hash(df["key"].to_numpy()))
    seq = seq.sort_values(["__h", "key"]).groupby("grp", sort=False).head(5)
    seq = seq.assign(rk=seq.groupby("grp", sort=False).cumcount() + 1)
    seq = seq.sort_values(["grp", "rk"]).reset_index(drop=True)
    assert got["key"].tolist() == seq["key"].tolist()
    assert got["rk"].tolist() == seq["rk"].tolist()


def test_distinct_count_exact():
    df = _df()
    got = sampling.distinct_count(
        ray.data.from_pandas(df).repartition(9), "grp", "val"
    )
    exp = df.groupby("grp")["val"].nunique()
    assert dict(zip(got["grp"], got["n_distinct"])) == exp.to_dict()


def test_shard_by_hash_writes_disjoint_readable_shards(tmp_path):
    df = _df(300)
    out = str(tmp_path / "shards")
    counts = sampling.shard_by_hash(
        ray.data.from_pandas(df).repartition(5), "key", 4, out
    )
    assert int(counts["n"].sum()) == len(df)
    # every row readable from exactly the shard its hash names
    back = []
    for s in range(4):
        d = os.path.join(out, f"shard={s:04d}")
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        if not files:
            continue
        part = pd.concat(
            [pd.read_parquet(os.path.join(d, f)) for f in files],
            ignore_index=True,
        )
        assert (
            sampling.split_hash(part["key"].to_numpy()) % 4 == s
        ).all()
        back.append(part)
    allback = pd.concat(back, ignore_index=True).sort_values("key")
    assert allback["key"].tolist() == df["key"].tolist()


def test_mixture_sample_layout_independent_and_fractions():
    import numpy as np
    import pandas as pd
    import ray.data

    from ophois_ray.sampling import mixture_sample, split_hash

    n = 20_000
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "g": np.where(np.arange(n) % 2 == 0, "a", "b"),
    })
    rates = {"a": 2500, "b": 7500}
    one = mixture_sample(ray.data.from_pandas(df), "id", "g", rates
                         ).to_pandas().sort_values("id").reset_index(drop=True)
    many = mixture_sample(
        ray.data.from_pandas(df).repartition(13), "id", "g", rates
    ).to_pandas().sort_values("id").reset_index(drop=True)
    assert one.equals(many)  # layout-independent membership
    fa = (one["g"] == "a").sum() / (n / 2)
    fb = (one["g"] == "b").sum() / (n / 2)
    assert abs(fa - 0.25) < 0.02 and abs(fb - 0.75) < 0.02
    # membership really is the hash rule
    h = split_hash(one["id"].to_numpy()) % 10000
    thr = np.where(one["g"].to_numpy(object) == "a", 2500, 7500)
    assert (h < thr).all()
    # unknown group -> default_num drops everything
    z = mixture_sample(ray.data.from_pandas(df), "id", "g", {"zzz": 10000})
    assert z.count() == 0


def test_rank_global_exact_and_layout_independent():
    import numpy as np
    import pandas as pd
    import ray.data

    from ophois_ray.sampling import rank_global

    rng = np.random.default_rng(3)
    n = 5000
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        # heavy ties so per-bucket order must fall back to id
        "k": rng.integers(0, 40, n).astype(np.int64),
    })
    exp = df.sort_values(["k", "id"]).reset_index(drop=True)
    exp["rank"] = np.arange(n, dtype=np.int64)
    for parts in (1, 17):
        src = ray.data.from_pandas(df)
        if parts > 1:
            src = src.repartition(parts)
        got = (rank_global(src, ["k", "id"], num_buckets=8)
               .to_pandas().sort_values("rank").reset_index(drop=True))
        assert got[["id", "k", "rank"]].equals(exp[["id", "k", "rank"]])


def test_rank_global_tiny_and_empty_sample():
    import numpy as np
    import pandas as pd
    import ray.data

    from ophois_ray.sampling import rank_global

    # 3 rows: the deterministic sample is almost surely empty ->
    # single bucket, still exact
    df = pd.DataFrame({"id": np.array([7, 3, 5], dtype=np.int64),
                       "k": np.array([1, 1, 0], dtype=np.int64)})
    got = (rank_global(ray.data.from_pandas(df), ["k", "id"])
           .to_pandas().sort_values("rank").reset_index(drop=True))
    assert got["id"].tolist() == [5, 3, 7]
    assert got["rank"].tolist() == [0, 1, 2]


def test_sample_global_matches_sequential_and_layout_independent():
    rng = np.random.RandomState(7)
    df = pd.DataFrame({"key": rng.permutation(400).astype(np.int64),
                       "val": rng.randint(0, 50, 400).astype(np.int64)})
    seq = df.assign(__h=sampling.sample_hash(df["key"].to_numpy()))
    seq = seq.sort_values(["__h", "key"]).head(25)
    seq = seq.assign(rk=np.arange(1, 26, dtype=np.int64))
    # the priority must NOT be order-preserving on contiguous ids
    # (split_hash is affine — sorting by it would just take ids 0..24)
    assert seq["key"].tolist() != sorted(seq["key"].tolist())
    for nparts in (1, 9):
        got = (
            sampling.sample_global(
                ray.data.from_pandas(df).repartition(nparts), "key", 25)
            .to_pandas().sort_values("rk").reset_index(drop=True)
        )
        assert got["key"].tolist() == seq["key"].tolist()
        assert got["rk"].tolist() == seq["rk"].tolist()
        assert got["val"].tolist() == seq["val"].tolist()
        assert "__g" not in got.columns


def test_rendezvous_minimal_disruption(ray_session):
    """sampling.rendezvous_shard: keys spread over all shards, growth
    n -> n+1 moves ONLY keys that land on the new shard (HRW minimal
    disruption, exact by construction), at roughly 1/(n+1)."""
    import ray

    from ophois_ray.sampling import rendezvous_shard, rendezvous_stability

    keys = np.arange(1, 20001, dtype=np.int64)
    s9 = rendezvous_shard(keys, 9)
    s10 = rendezvous_shard(keys, 10)
    assert set(np.unique(s10)) == set(range(10))
    moved = s9 != s10
    # every moved key moved TO the new shard, never between old shards
    assert (s10[moved] == 9).all()
    frac = moved.mean()
    assert 0.05 < frac < 0.15  # ~1/10
    # balance: no shard under half or over double the fair share
    counts = np.bincount(s10, minlength=10)
    assert counts.min() > 1000 and counts.max() < 4000
    # the distributed audit matches the local kernel
    ds = ray.data.from_pandas(pd.DataFrame({"k": keys})).repartition(6)
    got = rendezvous_stability(ds, "k", 9)
    exp = (pd.DataFrame({"shard": s10, "n": 1, "moved": moved.astype(int)})
           .groupby("shard", as_index=False).agg(n=("n", "sum"),
                                                 moved=("moved", "sum"))
           .astype(np.int64))
    pd.testing.assert_frame_equal(got, exp)


def test_apportion_slots_sums_exact_with_ties(ray_session):
    """sampling.apportion_slots: slots always sum to total; remainder
    ties break to the smaller group key; zero-remainder case adds
    nothing."""
    import ray

    from ophois_ray.sampling import apportion_slots

    # groups 1,2,3 with counts 1,1,2 and total 10: quotas 2,2,5,
    # remainders 2,2,0 -> one leftover goes to group 1 (tie 1 vs 2)
    df = pd.DataFrame({"g": np.array([1, 2, 3, 3], np.int64)})
    got = apportion_slots(ray.data.from_pandas(df), "g", 10, num_buckets=4)
    assert got.to_dict("records") == [
        {"g": 1, "n": 1, "slots": 3},
        {"g": 2, "n": 1, "slots": 2},
        {"g": 3, "n": 2, "slots": 5}]
    # exact division: no +1 anywhere
    df2 = pd.DataFrame({"g": np.repeat(np.arange(4, dtype=np.int64), 5)})
    got2 = apportion_slots(ray.data.from_pandas(df2).repartition(3), "g", 40)
    assert got2["slots"].tolist() == [10, 10, 10, 10]
    # random weights: sum invariant
    rng = np.random.default_rng(3)
    df3 = pd.DataFrame({"g": rng.integers(0, 17, 500).astype(np.int64)})
    got3 = apportion_slots(ray.data.from_pandas(df3).repartition(7), "g", 9973)
    assert int(got3["slots"].sum()) == 9973


def test_stab_lookup_gaps_edges_and_overlap_guard(ray_session):
    """joins.stab_lookup: half-open [lo, hi) membership, gap values
    miss, below-first-lo misses, overlap raises."""
    import ray

    from ophois_ray.joins import stab_lookup

    iv = pd.DataFrame({"lo": np.array([10, 30], np.int64),
                       "hi": np.array([20, 40], np.int64),
                       "iv_id": np.array([7, 8], np.int64)})
    df = pd.DataFrame({"v": np.array([5, 10, 19, 20, 25, 30, 39, 40],
                                     np.int64)})
    got = (stab_lookup(ray.data.from_pandas(df), "v", iv)
           .to_pandas().sort_values("v", ignore_index=True))
    assert got["iv_id"].tolist() == [-1, 7, 7, -1, -1, 8, 8, -1]
    with pytest.raises(ValueError):
        stab_lookup(ray.data.from_pandas(df), "v",
                    pd.DataFrame({"lo": [10, 15], "hi": [20, 25],
                                  "iv_id": [1, 2]}))


def test_stab_lookup_empty_interval_table(ray_session):
    """joins.stab_lookup on a ZERO-row interval table: every probe
    misses (regression — searchsorted pos=-1 / safe=0 used to index
    into the empty hi array and raise IndexError)."""
    import ray

    from ophois_ray.joins import stab_lookup

    iv = pd.DataFrame({"lo": pd.Series(dtype=np.int64),
                       "hi": pd.Series(dtype=np.int64),
                       "iv_id": pd.Series(dtype=np.int64)})
    df = pd.DataFrame({"v": np.array([0, 5, 123], np.int64)})
    got = (stab_lookup(ray.data.from_pandas(df), "v", iv, miss=-9)
           .to_pandas().sort_values("v", ignore_index=True))
    assert got["iv_id"].tolist() == [-9, -9, -9]


def test_rendezvous_hash_exact_over_full_int64_domain():
    """sampling.rendezvous_hash: keys are reduced mod 2^31-1 BEFORE
    the first multiply, so weights match unbounded python-int
    arithmetic even for keys far beyond 2^31 (regression — the raw
    key*C1 form wrapped int64 at keys >= ~3.47e9 while a HUGEINT SQL
    mirror would not)."""
    from ophois_ray.sampling import _HRW_C1, _HRW_C2, _HRW_P, \
        rendezvous_hash

    keys = np.array([0, 1, 2**31 - 2, 2**31, 3_470_000_000,
                     2**53 + 17, 2**62 + 12345], dtype=np.int64)
    for s in (0, 3, 9):
        got = rendezvous_hash(keys, s)
        b = s * _HRW_C2 % _HRW_P
        exp = [((int(k) % _HRW_P * _HRW_C1 % _HRW_P) ^ b)
               * _HRW_C1 % _HRW_P for k in keys]
        assert got.tolist() == exp
