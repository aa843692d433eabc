"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard verification, embedding-cosine
near-dup. Hot paths are vectorized numpy inside map_batches; the only
shuffles are the hash-bucket groupbys; candidate verification joins the
(small) candidate id set against broadcast payloads.

Scale notes (documented per operator): bucket groupbys are
hash-partitioned on content-derived keys so they scale horizontally;
the final union-find over verified duplicate PAIRS runs on the driver —
the pair set is tiny relative to the corpus (near-dup rate bound), the
standard design until pair counts approach memory, at which point the
label-propagation components from components.py take over.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


from .joins import BroadcastIndex, stable_hash

_MERSENNE = np.uint64((1 << 61) - 1)


# ------------------------------------------------------------------ exact


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup by content hash, keeping the smallest id per group
    (hash-partition + per-group first). Returns a Dataset with one row
    per distinct content: (content_hash, keep_id, n_copies).
    """

    def hash_batch(df: pd.DataFrame) -> pd.DataFrame:
        h = stable_hash(df[text_col].to_numpy(object)).astype(np.int64)
        return pd.DataFrame({"content_hash": h, "keep_id": df[id_col], "n": 1})

    hashed = ds.map_batches(hash_batch, batch_format="pandas")
    from .joins import grouped_apply

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("content_hash", as_index=False).agg(
            keep_id=("keep_id", "min"), n_copies=("n", "sum")
        )
        g["n_copies"] = g["n_copies"].astype(np.int64)
        return g

    return grouped_apply(hashed, "content_hash", agg)


def exact_dedup_filter(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Filter variant: drop all but the keeper row per distinct content."""
    winners = exact_dedup(ds, text_col, id_col).to_pandas()
    import ray

    ref = ray.put(
        BroadcastIndex(
            winners["keep_id"].to_numpy(), {}
        )
    )

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        idx = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        return df[idx.contains(df[id_col].to_numpy())]

    return ds.map_batches(keep, batch_format="pandas")


# ----------------------------------------------------------------- shingles


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """uint64 hashes of the k-character shingles of a document."""
    if not isinstance(text, str) or len(text) < k:
        return np.array([hash_text_u64(text or "")], dtype=np.uint64)
    shingles = [text[i : i + k] for i in range(len(text) - k + 1)]
    return np.unique(stable_hash(np.array(shingles, dtype=object)))


def hash_text_u64(text: str) -> np.uint64:
    return stable_hash(np.array([text], dtype=object))[0]


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two unique-hash sets (n-gram Jaccard verifier)."""
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 1.0


# ------------------------------------------------------------------ minhash


def _perm_params(num_perm: int, seed: int = 7):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.randint(0, (1 << 61) - 1, num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm minimum values of (a*x + b) mod M over the shingle set."""
    x = shingle_hashes[:, None]  # (n, 1)
    vals = (x * a[None, :] + b[None, :]) % _MERSENNE
    return vals.min(axis=0)


def minhash_lsh_candidates(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    seed: int = 7,
):
    """shingle -> minhash -> band -> bucket groupby -> candidate pairs.

    Returns a Dataset of (id_a, id_b) candidate pairs (id_a < id_b,
    deduplicated). One shuffle keyed on (band_id, band_hash).
    """
    a, b = _perm_params(num_perm, seed)
    rows_per_band = num_perm // bands

    def sigs(df: pd.DataFrame) -> pd.DataFrame:
        out_band, out_hash, out_id = [], [], []
        for doc_id, text in zip(df[id_col], df[text_col]):
            sh = _shingle_hashes(text, shingle_k)
            sig = minhash_signature(sh, a, b)
            for band in range(bands):
                chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
                bh = int(np.bitwise_xor.reduce(stable_hash(chunk)))
                out_band.append(band)
                out_hash.append(bh)
                out_id.append(doc_id)
        return pd.DataFrame(
            {
                "band": np.array(out_band, dtype=np.int64),
                "bucket": np.array(out_hash, dtype=np.uint64).astype(np.int64),
                "id": out_id,
            }
        )

    banded = ds.map_batches(sigs, batch_format="pandas")

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(group["id"].unique())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": pd.Series(dtype=ids.dtype if len(ids) else np.int64),
                                 "id_b": pd.Series(dtype=ids.dtype if len(ids) else np.int64)})
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})

    from .joins import grouped_apply

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        outs = [pairs(g) for _, g in df.groupby(["band", "bucket"], sort=False)]
        return (
            pd.concat(outs, ignore_index=True)
            if outs
            else pairs(df)
        )

    cand = grouped_apply(banded, ["band", "bucket"], bucket_pairs, num_buckets=32)
    return grouped_apply(
        cand,
        ["id_a", "id_b"],
        lambda df: df.drop_duplicates(),
        drop_partial=lambda df: df.drop_duplicates(),
    )


def minhash_near_dup_groups(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    seed: int = 7,
    broadcast_cap: int = 2_000_000,
):
    """Full near-dup pipeline: LSH candidates -> exact n-gram Jaccard
    verification -> connected duplicate groups.

    Returns a pandas DataFrame (id, group) for every document in a
    near-dup group of size >= 2. Verification broadcasts the texts of
    candidate ids only (small by construction); the pair union-find runs
    on the driver (see module docstring for the scale story).
    """
    cand = minhash_lsh_candidates(
        ds, text_col=text_col, id_col=id_col, shingle_k=shingle_k,
        num_perm=num_perm, bands=bands, seed=seed,
    ).to_pandas()
    if len(cand) == 0:
        return pd.DataFrame({"id": pd.Series(dtype=np.int64), "group": pd.Series(dtype=np.int64)})
    cand_ids = np.unique(np.concatenate([cand["id_a"].to_numpy(), cand["id_b"].to_numpy()]))
    if len(cand_ids) > broadcast_cap:
        raise ValueError("candidate set exceeds broadcast cap; shard the verify stage")

    import ray

    id_ref = ray.put(set(cand_ids.tolist()))

    def texts_of(df: pd.DataFrame) -> pd.DataFrame:
        wanted = ray.get(id_ref) if isinstance(id_ref, ray.ObjectRef) else id_ref
        sub = df[[id_col, text_col]][df[id_col].isin(wanted)]
        return sub.rename(columns={id_col: "id", text_col: "text"})

    texts = ds.map_batches(texts_of, batch_format="pandas").to_pandas()
    text_by_id = dict(zip(texts["id"], texts["text"]))

    # verify pairs (vectorized set ops per pair)
    sh_cache: dict = {}

    def sh(i):
        if i not in sh_cache:
            sh_cache[i] = _shingle_hashes(text_by_id[i], shingle_k)
        return sh_cache[i]

    keep = [
        (ia, ib)
        for ia, ib in zip(cand["id_a"], cand["id_b"])
        if jaccard(sh(ia), sh(ib)) >= threshold
    ]
    if not keep:
        return pd.DataFrame({"id": pd.Series(dtype=cand_ids.dtype), "group": pd.Series(dtype=cand_ids.dtype)})

    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for ia, ib in keep:
        ra, rb = find(ia), find(ib)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members = sorted({i for p in keep for i in p})
    return pd.DataFrame({"id": members, "group": [find(i) for i in members]})


# ------------------------------------------------------------------ simhash


def simhash_bits(text: str, nbits: int = 64) -> int:
    """64-bit SimHash over whitespace tokens (deterministic)."""
    toks = text.split() if isinstance(text, str) else []
    if not toks:
        return 0
    hs = stable_hash(np.array(toks, dtype=object)).astype(np.uint64)
    shifts = np.arange(nbits, dtype=np.uint64)[None, :]
    bits = ((hs[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
    acc = np.where(bits == 1, 1, -1).sum(axis=0)
    out = 0
    for i in range(nbits):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash(ds, text_col: str = "text"):
    """Adds a simhash int64 column (bit pattern reinterpreted)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["simhash"] = np.array(
            [simhash_bits(t) for t in df[text_col]], dtype=np.uint64
        ).astype(np.int64)
        return df

    return ds.map_batches(fn, batch_format="pandas")


def simhash_near_dup_pairs(
    ds, *, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3
):
    """SimHash near-dup: band the 64 bits into 4x16-bit keys (any pair
    within hamming distance 3 collides on >= 1 band), groupby bucket,
    verify hamming distance exactly. Returns pandas (id_a, id_b, hamming).
    """
    with_sh = simhash(ds, text_col)

    def bandify(df: pd.DataFrame) -> pd.DataFrame:
        sh = df["simhash"].to_numpy(np.int64).view(np.uint64)
        out = []
        for band in range(4):
            key = ((sh >> np.uint64(16 * band)) & np.uint64(0xFFFF)).astype(np.int64)
            out.append(
                pd.DataFrame(
                    {"band": band, "bucket": key, "id": df[id_col], "simhash": df["simhash"]}
                )
            )
        return pd.concat(out, ignore_index=True)

    banded = with_sh.map_batches(bandify, batch_format="pandas")

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(subset=["id"]).sort_values("id")
        if len(g) < 2:
            return pd.DataFrame(
                {"id_a": pd.Series(dtype=np.int64), "id_b": pd.Series(dtype=np.int64),
                 "hamming": pd.Series(dtype=np.int64)}
            )
        ids = g["id"].to_numpy()
        sh = g["simhash"].to_numpy(np.int64).view(np.uint64)
        ia, ib = np.triu_indices(len(ids), k=1)
        x = sh[ia] ^ sh[ib]
        ham = np.array([bin(int(v)).count("1") for v in x], dtype=np.int64)
        m = ham <= max_hamming
        return pd.DataFrame({"id_a": ids[ia][m], "id_b": ids[ib][m], "hamming": ham[m]})

    from .joins import grouped_apply

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        outs = [pairs(g) for _, g in df.groupby(["band", "bucket"], sort=False)]
        return pd.concat(outs, ignore_index=True) if outs else pairs(df)

    out = grouped_apply(banded, ["band", "bucket"], bucket_pairs, num_buckets=32).to_pandas()
    return out.drop_duplicates(subset=["id_a", "id_b"]).reset_index(drop=True)


# ------------------------------------------------------- embedding near-dup


def embedding_near_dup_pairs(
    ds,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 13,
    dim: int | None = None,
):
    """Embedding-cosine near-dup via random-hyperplane LSH buckets.

    Vectors whose signs agree on all n_planes hyperplanes land in the
    same bucket; within-bucket exact cosine >= threshold pairs are
    emitted. Approximate by design (pairs split across buckets are
    missed — raise n_planes' complement or multiprobe for recall);
    deterministic given the seed. Returns pandas (id_a, id_b, cosine).
    """

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack([np.asarray(v, dtype=np.float64) for v in df[vec_col]])
        d = vecs.shape[1]
        rng = np.random.RandomState(seed)
        planes = rng.normal(size=(d, n_planes))
        signs = (vecs @ planes) >= 0
        bucket = np.zeros(len(vecs), dtype=np.int64)
        for i in range(n_planes):
            bucket |= signs[:, i].astype(np.int64) << i
        norm = np.linalg.norm(vecs, axis=1)
        norm[norm == 0] = 1.0
        unit = vecs / norm[:, None]
        return pd.DataFrame(
            {"bucket": bucket, "id": df[id_col], "vec": [v for v in unit]}
        )

    bucketed = ds.map_batches(bucketize, batch_format="pandas")

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(subset=["id"]).sort_values("id")
        if len(g) < 2:
            return pd.DataFrame(
                {"id_a": pd.Series(dtype=np.int64), "id_b": pd.Series(dtype=np.int64),
                 "cosine": pd.Series(dtype=np.float64)}
            )
        vecs = np.stack(g["vec"].to_list())
        ids = g["id"].to_numpy()
        sim = vecs @ vecs.T
        ia, ib = np.triu_indices(len(ids), k=1)
        cs = sim[ia, ib]
        m = cs >= threshold
        return pd.DataFrame({"id_a": ids[ia][m], "id_b": ids[ib][m], "cosine": cs[m]})

    from .joins import grouped_apply

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        outs = [pairs(g) for _, g in df.groupby("bucket", sort=False)]
        return pd.concat(outs, ignore_index=True) if outs else pairs(df)

    out = grouped_apply(bucketed, "bucket", bucket_pairs, num_buckets=32).to_pandas()
    return out.drop_duplicates(subset=["id_a", "id_b"]).reset_index(drop=True)
