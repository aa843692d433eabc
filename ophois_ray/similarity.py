"""Similarity search over an embedding column (list<float>).

- brute_force_topk: the exact baseline — numpy matmul per batch against
  a broadcast query matrix (ray.put once, fetched per actor), per-batch
  partial top-k, driver merge of the tiny partials. One streaming pass,
  zero shuffle.
- lsh_topk: scale path 1 — random-hyperplane signature buckets with
  multiprobe (flip each bit); candidates scored exactly within probed
  buckets via per-batch partial top-k (same shape as the brute path —
  only n_query x k rows per task reach the driver). Approximate;
  recall rises with multiprobe depth.
- train_ivf_centroids / ivf_topk: scale path 2 — inverted-file probing
  over deterministically-seeded k-means-lite centroids (hash-smallest
  ids seed; Lloyd rounds are streaming passes emitting per-centroid
  partial sums). nprobe == n_centroids is bit-equal to brute force;
  smaller nprobe does ~nprobe/n_centroids of the scan.
- pq_train / pq_encode / pq_adc_topk: scale path 3 — product
  quantization (m codes per vector instead of d floats; the memory
  play). ADC scoring is m LUT hops per candidate; the int64-codebook
  variant is exact end-to-end and SQL-mirrored (`pq_adc`).
- kmeans_int / ivf_topk_int: integer-exact distributed Lloyd's
  k-means over a quantized grid, and IVF probing over its centroids —
  the hash-checkable clustering + ANN pair (SQL-mirrored
  `embed_kmeans` / `embed_ivf_topk_int`); the exact twins of
  train_ivf_centroids / ivf_topk.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    return m / n[:, None]


def brute_force_topk(ds, queries: np.ndarray, *, k: int = 10, vec_col: str = "embedding",
                     id_col: str = "vec_id") -> pd.DataFrame:
    """Exact cosine top-k for each query row. Returns pandas
    (query_id, vec_id, cosine, rank) sorted by (query_id, rank);
    deterministic tiebreak on (cosine desc, vec_id asc).

    Task-pool function with a per-worker broadcast cache
    (pages._fetch_cached), not an actor pool: the stage's only state
    is the broadcast query matrix (normalized ONCE on the driver), and
    an actor pool costs seconds of startup per run while its explicit
    batch_size/concurrency poison read fusion (the repo's measured
    rule) — fixed overhead dominated this stage at bench scale."""
    import ray

    from .pages import _fetch_cached

    qref = ray.put(_unit(np.asarray(queries, dtype=np.float64)))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        q = _fetch_cached(qref)
        vecs = _unit(np.stack([np.asarray(v, dtype=np.float64) for v in df[vec_col]]))
        ids = df[id_col].to_numpy()
        sims = q @ vecs.T  # (n_query, n_batch)
        kk = min(k, sims.shape[1])
        # deterministic (cosine desc, vec_id asc) tiebreak INSIDE the
        # batch: argpartition alone resolves boundary ties by row order,
        # which depends on block arrival
        out_v, out_c = [], []
        for qi in range(sims.shape[0]):
            order = np.lexsort((ids, -sims[qi]))[:kk]
            out_v.append(ids[order])
            out_c.append(sims[qi][order])
        qidx = np.repeat(np.arange(sims.shape[0]), kk)
        return pd.DataFrame(
            {
                "query_id": qidx.astype(np.int64),
                "vec_id": np.concatenate(out_v),
                "cosine": np.concatenate(out_c),
            }
        )

    partials = ds.map_batches(score, batch_format="pandas").to_pandas()
    out = []
    for qid, grp in partials.groupby("query_id"):
        grp = grp.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        grp = grp.assign(rank=np.arange(len(grp), dtype=np.int64))
        out.append(grp)
    return (
        pd.concat(out, ignore_index=True)
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def quantized_topk(ds, queries: np.ndarray, *, k: int = 10, vec_col: str = "embedding",
                   id_col: str = "vec_id", shift: int = 20) -> pd.DataFrame:
    """ORACLE-EXACT integer inner-product top-k: embeddings quantized
    floor(x * 2^shift) to int64 on both engines; scores are exact
    int64 dot products (64 dims x 21-bit components < 2^63), so
    ranking is bit-reproducible in ANSI SQL — no float summation order
    anywhere. Returns pandas (query_id, vec_id, score, rank) with the
    deterministic (score desc, vec_id asc) tiebreak — bit-identical to
    the DuckDB mirror in queries.py. Task-pool function + per-worker
    broadcast cache (see brute_force_topk for the measured reasoning);
    queries are quantized once on the driver."""
    import ray

    from .pages import _fetch_cached

    qref = ray.put(
        np.floor(np.asarray(queries, dtype=np.float64) * (1 << shift))
        .astype(np.int64))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        q = _fetch_cached(qref)
        vecs = np.floor(
            np.stack([np.asarray(v, dtype=np.float64) for v in df[vec_col]])
            * (1 << shift)
        ).astype(np.int64)
        ids = df[id_col].to_numpy()
        scores = q @ vecs.T  # exact int64
        kk = min(k, scores.shape[1])
        out_v, out_s = [], []
        for qi in range(scores.shape[0]):
            order = np.lexsort((ids, -scores[qi]))[:kk]
            out_v.append(ids[order])
            out_s.append(scores[qi][order])
        qidx = np.repeat(np.arange(scores.shape[0]), kk)
        return pd.DataFrame(
            {
                "query_id": qidx.astype(np.int64),
                "vec_id": np.concatenate(out_v),
                "score": np.concatenate(out_s),
            }
        )

    partials = ds.map_batches(score, batch_format="pandas").to_pandas()
    out = []
    for qid, grp in partials.groupby("query_id"):
        grp = grp.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        out.append(grp.assign(rank=np.arange(len(grp), dtype=np.int64)))
    return (
        pd.concat(out, ignore_index=True)
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def lsh_topk(ds, queries: np.ndarray, *, k: int = 10, vec_col: str = "embedding",
             id_col: str = "vec_id", n_planes: int = 8, seed: int = 13,
             multiprobe: int = 1) -> pd.DataFrame:
    """Approximate cosine top-k: vectors bucketed by hyperplane sign
    signature; each query probes its own bucket plus every bucket within
    `multiprobe` sign flips, then scores candidates exactly.

    Zero-shuffle: queries + probe table broadcast once; every batch
    emits only its n_query x k partial winners (deterministic
    (cosine desc, vec_id asc) tiebreak) and the driver merges the tiny
    partials — the same scaling shape as brute_force_topk, minus the
    non-probed candidates it never scores.
    """
    queries = _unit(np.asarray(queries, dtype=np.float64))
    d = queries.shape[1]
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(d, n_planes))

    def sig_of(m: np.ndarray) -> np.ndarray:
        s = (m @ planes) >= 0
        out = np.zeros(len(m), dtype=np.int64)
        for i in range(n_planes):
            out |= s[:, i].astype(np.int64) << i
        return out

    q_sigs = sig_of(queries)
    probe_sets = []
    for qs in q_sigs:
        probes = {int(qs)}
        if multiprobe >= 1:
            probes |= {int(qs) ^ (1 << i) for i in range(n_planes)}
        if multiprobe >= 2:
            probes |= {
                int(qs) ^ (1 << i) ^ (1 << j)
                for i in range(n_planes)
                for j in range(i + 1, n_planes)
            }
        probe_sets.append(probes)
    # query-id x signature probe table: row qi True at every bucket qi
    # probes (2^n_planes kept small — the LSH design point)
    n_sigs = 1 << n_planes
    probe_tbl = np.zeros((len(queries), n_sigs), dtype=bool)
    for qi, probes in enumerate(probe_sets):
        probe_tbl[qi, list(probes)] = True

    import ray

    from .pages import _fetch_cached

    qref = ray.put((queries, planes, probe_tbl))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        """Per-batch partial top-k per query (the same shape as
        brute_force_topk): candidates outside a query's probed buckets
        are masked to -inf, survivors are ranked with the deterministic
        (cosine desc, vec_id asc) tiebreak, and only n_query x k tiny
        partial rows leave the task — never raw candidates. Task-pool
        function + per-worker broadcast cache (see brute_force_topk)."""
        q, pl, tbl = _fetch_cached(qref)
        vecs = _unit(np.stack([np.asarray(v, dtype=np.float64) for v in df[vec_col]]))
        s = (vecs @ pl) >= 0
        sig = np.zeros(len(vecs), dtype=np.int64)
        for i in range(n_planes):
            sig |= s[:, i].astype(np.int64) << i
        any_probe = tbl.any(axis=0)
        m = any_probe[sig]
        empty = pd.DataFrame(
            {"query_id": pd.Series(dtype=np.int64),
             "vec_id": pd.Series(dtype=df[id_col].dtype),
             "cosine": pd.Series(dtype=np.float64)}
        )
        if not m.any():
            return empty
        cand = vecs[m]
        cand_ids = df[id_col].to_numpy()[m]
        cand_sig = sig[m]
        sims = q @ cand.T  # (n_query, n_cand)
        valid = tbl[:, cand_sig]  # (n_query, n_cand)
        sims = np.where(valid, sims, -np.inf)
        out_q, out_v, out_c = [], [], []
        for qi in range(sims.shape[0]):
            row = sims[qi]
            nvalid = int(valid[qi].sum())
            if nvalid == 0:
                continue
            kk = min(k, nvalid)
            order = np.lexsort((cand_ids, -row))[:kk]
            out_q.append(np.full(kk, qi, dtype=np.int64))
            out_v.append(cand_ids[order])
            out_c.append(row[order])
        if not out_q:
            return empty
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "vec_id": np.concatenate(out_v),
                "cosine": np.concatenate(out_c),
            }
        )

    partials = ds.map_batches(score, batch_format="pandas").to_pandas()
    out = []
    for qid, grp in partials.groupby("query_id"):
        grp = grp.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        out.append(grp.assign(rank=np.arange(len(grp), dtype=np.int64)))
    if not out:
        return pd.DataFrame(
            {"query_id": pd.Series(dtype=np.int64), "vec_id": pd.Series(dtype=np.int64),
             "cosine": pd.Series(dtype=np.float64), "rank": pd.Series(dtype=np.int64)}
        )
    return (
        pd.concat(out, ignore_index=True)
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def train_ivf_centroids(ds, n_centroids: int, *, vec_col: str = "embedding",
                        id_col: str = "vec_id", iters: int = 2) -> np.ndarray:
    """Deterministic distributed k-means-lite for IVF: returns a unit
    (n_centroids, d) centroid matrix.

    Seeds are the vectors of the n_centroids smallest keyed-hash ids
    (sampling.split_hash — a pure function of the id, so training is
    reproducible across block layouts and cluster widths, unlike
    random-init k-means). Each Lloyd round is one streaming pass:
    every batch emits per-centroid partial (count, sum-vector-bytes)
    rows — fixed-width bytes, never ragged array cells — and the
    driver merges n_centroids x n_blocks tiny rows. The data itself
    is never collected or shuffled.
    """
    import ray

    from .sampling import split_hash

    def seed_partial(df: pd.DataFrame) -> pd.DataFrame:
        h = split_hash(df[id_col].to_numpy())
        order = np.argsort(h, kind="stable")[:n_centroids]
        vecs = np.stack(
            [np.asarray(v, dtype=np.float64) for v in df[vec_col].iloc[order]]
        )
        return pd.DataFrame(
            {"h": h[order], "vec": [r.tobytes() for r in vecs]}
        )

    seeds = ds.map_batches(seed_partial, batch_format="pandas").to_pandas()
    seeds = seeds.sort_values("h", kind="stable").head(n_centroids)
    cent = _unit(np.stack([np.frombuffer(b, dtype=np.float64) for b in seeds["vec"]]))
    d = cent.shape[1]

    for _ in range(iters):
        cref = ray.put(cent)

        def lloyd_partial(df: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(cref) if isinstance(cref, ray.ObjectRef) else cref
            vecs = _unit(
                np.stack([np.asarray(v, dtype=np.float64) for v in df[vec_col]])
            )
            assign = np.argmax(c @ vecs.T, axis=0)
            rows = []
            for cid in np.unique(assign):
                sel = vecs[assign == cid]
                rows.append(
                    {
                        "cid": int(cid),
                        "n": len(sel),
                        "s": sel.sum(axis=0).tobytes(),
                    }
                )
            return pd.DataFrame(rows, columns=["cid", "n", "s"])

        p = ds.map_batches(lloyd_partial, batch_format="pandas").to_pandas()
        nxt = cent.copy()
        # canonical fold order (sorted bytes) -> bit-identical refits:
        # blocks arrive in completion order, so an arrival-order float
        # sum drifts by last-ulp between reruns of the same input
        for cid, grp in p.sort_values("cid").groupby("cid", sort=True):
            s = np.zeros(d)
            for b in sorted(grp["s"]):
                s += np.frombuffer(b, dtype=np.float64)
            nxt[int(cid)] = s / int(grp["n"].sum())
        cent = _unit(nxt)
    return cent


def ivf_topk(ds, queries: np.ndarray, centroids: np.ndarray, *, k: int = 10,
             nprobe: int = 2, vec_col: str = "embedding",
             id_col: str = "vec_id") -> pd.DataFrame:
    """Approximate cosine top-k via inverted-file probing: every vector
    belongs to its nearest centroid's list; a query scores only vectors
    in its ``nprobe`` nearest centroids' lists.

    Same zero-shuffle scaling shape as brute/lsh: (queries, centroids,
    probe table) broadcast once, each batch emits at most n_query x k
    partial winners with the deterministic (cosine desc, vec_id asc)
    tiebreak, the driver merges tiny partials. With nprobe ==
    n_centroids this scores every candidate and is bit-identical to
    brute_force_topk (the pytest gate); smaller nprobe trades recall
    for a ~nprobe/n_centroids fraction of the matmul work — the 100-TB
    path where a full scan per query is off the table.
    """
    import ray

    queries = _unit(np.asarray(queries, dtype=np.float64))
    centroids = np.asarray(centroids, dtype=np.float64)
    n_cent = len(centroids)
    nprobe = min(nprobe, n_cent)
    # per-query probed centroids -> boolean (n_query, n_centroids);
    # deterministic probe choice: (similarity desc, centroid id asc)
    qc = queries @ centroids.T
    probe_tbl = np.zeros((len(queries), n_cent), dtype=bool)
    for qi in range(len(queries)):
        order = np.lexsort((np.arange(n_cent), -qc[qi]))[:nprobe]
        probe_tbl[qi, order] = True

    from .pages import _fetch_cached

    qref = ray.put((queries, centroids, probe_tbl))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        # task-pool function + per-worker broadcast cache (see
        # brute_force_topk for the measured actor-pool reasoning)
        q, c, tbl = _fetch_cached(qref)
        vecs = _unit(
            np.stack([np.asarray(v, dtype=np.float64) for v in df[vec_col]])
        )
        ids = df[id_col].to_numpy()
        assign = np.argmax(c @ vecs.T, axis=0)
        valid = tbl[:, assign]  # (n_query, n_batch)
        empty = pd.DataFrame(
            {"query_id": pd.Series(dtype=np.int64),
             "vec_id": pd.Series(dtype=ids.dtype),
             "cosine": pd.Series(dtype=np.float64)}
        )
        if not valid.any():
            return empty
        # subset the batch to vectors in SOME probed list BEFORE the
        # query matmul — this is where the ~nprobe/n_centroids work
        # reduction actually happens (masking after a full matmul
        # would do strictly more work than brute force)
        keep = valid.any(axis=0)
        vecs = vecs[keep]
        ids = ids[keep]
        valid = valid[:, keep]
        sims = np.where(valid, q @ vecs.T, -np.inf)
        out_q, out_v, out_c = [], [], []
        for qi in range(sims.shape[0]):
            nvalid = int(valid[qi].sum())
            if nvalid == 0:
                continue
            kk = min(k, nvalid)
            order = np.lexsort((ids, -sims[qi]))[:kk]
            out_q.append(np.full(kk, qi, dtype=np.int64))
            out_v.append(ids[order])
            out_c.append(sims[qi][order])
        if not out_q:
            return empty
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "vec_id": np.concatenate(out_v),
                "cosine": np.concatenate(out_c),
            }
        )

    partials = ds.map_batches(score, batch_format="pandas").to_pandas()
    out = []
    for qid, grp in partials.groupby("query_id"):
        grp = grp.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        out.append(grp.assign(rank=np.arange(len(grp), dtype=np.int64)))
    if not out:
        return pd.DataFrame(
            {"query_id": pd.Series(dtype=np.int64), "vec_id": pd.Series(dtype=np.int64),
             "cosine": pd.Series(dtype=np.float64), "rank": pd.Series(dtype=np.int64)}
        )
    return (
        pd.concat(out, ignore_index=True)
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


# ------------------------------------------------------------------- PCA


def pca_train(ds, n_components: int, *, vec_col: str = "embedding",
              id_col: str | None = None, num_buckets: int = 32):
    """Distributed PCA fit over an embedding column — the canonical
    one-pass Gram accumulation: partial ``(sum x, sum x x^T, n)``
    moments (d and d x d — tiny next to the data, shipped as packed
    buffers since ragged ndarrays cannot ride pandas blocks) merge on
    the driver into the exact covariance, and ``eigh`` runs on the
    d x d matrix. Sign convention: each component is flipped so its
    largest-|coeff| entry is positive. Returns ``(components [k, d],
    mean [d], explained_var [k])``.

    With ``id_col=None`` (the fast path) every BATCH contributes one
    moment partial and the driver folds them in canonical sorted-blob
    order — bit-identical across reruns on the same layout, but the
    partials themselves depend on block boundaries, so refits across
    different layouts drift by last-ulp. Pass ``id_col`` for the
    LAYOUT-INDEPENDENT fit (same discipline as kll_sketch_grouped):
    rows co-partition by ``id % num_buckets``, each id-bucket reduces
    its FULL vector set in sorted-id order (one blob per id-bucket —
    a task holds at most a shuffle-bucket of rows, so size
    ``num_buckets`` to ~rows/2M at fleet scale and the per-task heap
    stays bounded), and the driver folds the <= num_buckets moment
    blobs in bucket order — every float add is a pure function of the
    data, never of the layout, so the fit is bit-identical under any
    repartition/block-size change (the driver's rerun-and-diff
    survives a layout shuffle). Costs one exchange of the vectors —
    the inherent price of bit-reproducibility; keep the id-less fast
    path when last-ulp layout drift is acceptable. Ids must be unique
    int64.
    """
    if id_col is not None:
        from .joins import grouped_apply

        def pack_rows(df: pd.DataFrame) -> pd.DataFrame:
            ids = df[id_col].to_numpy(np.int64)
            return pd.DataFrame({
                "__pb": ids % num_buckets,
                "__id": ids,
                "__v": pd.Series(
                    [np.asarray(v, dtype=np.float64).tobytes()
                     for v in df[vec_col]], dtype=object),
            })

        def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
            pbs, blobs = [], []
            for pb, g in df.groupby("__pb", sort=True):
                g = g.sort_values("__id", kind="stable")
                m = np.stack([np.frombuffer(b, dtype=np.float64)
                              for b in g["__v"]])
                head = np.array([m.shape[1], len(m)],
                                dtype=np.int64).tobytes()
                blobs.append(head + m.sum(axis=0).tobytes()
                             + (m.T @ m).astype(np.float64).tobytes())
                pbs.append(int(pb))
            return pd.DataFrame({
                "__pb": np.array(pbs, np.int64),
                "blob": pd.Series(blobs, dtype=object)})

        parts = grouped_apply(
            ds.map_batches(pack_rows, batch_format="pandas"),
            "__pb", per_bucket, num_buckets=min(num_buckets, 64),
        ).to_pandas()
        ordered = [b for _, b in
                   sorted(zip(parts["__pb"].tolist(), parts["blob"].tolist()))]
    else:
        blobs = [
            blob
            for b in ds.map_batches(
                lambda df: pd.DataFrame({"blob": [_pack_moments(df, vec_col)]}),
                batch_format="pandas",
            ).iter_batches(batch_format="pandas", batch_size=None)
            for blob in b["blob"]
        ]
        # float partial sums: merge in a CANONICAL order (sorted blobs)
        # so the fit is bit-identical across reruns despite
        # nondeterministic batch arrival order
        ordered = sorted(blobs)
    s = g = None
    n = 0
    for blob in ordered:
        bs, bg, bn = _unpack_moments(blob)
        s = bs if s is None else s + bs
        g = bg if g is None else g + bg
        n += bn
    if n == 0:
        raise ValueError("pca_train: empty dataset")
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)          # ascending eigenvalues
    order = np.argsort(w)[::-1][:n_components]
    comps = v[:, order].T
    # deterministic sign: largest-|coeff| entry of each component > 0
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps, mean, w[order]


def _pack_moments(df, vec_col):
    """(sum, gram, n) of one batch as a single bytes cell — ragged
    ndarrays cannot ride pandas blocks (TensorArray concat crash), so
    moments ship as raw buffers."""
    m = np.stack([np.asarray(v, dtype=np.float64) for v in df[vec_col]]) \
        if len(df) else np.zeros((0, 1))
    d = m.shape[1]
    s = m.sum(axis=0)
    g = m.T @ m
    head = np.array([d, len(m)], dtype=np.int64).tobytes()
    return head + s.tobytes() + g.astype(np.float64).tobytes()


def _unpack_moments(blob: bytes):
    d, n = np.frombuffer(blob[:16], dtype=np.int64)
    d = int(d)
    s = np.frombuffer(blob[16:16 + 8 * d], dtype=np.float64)
    g = np.frombuffer(blob[16 + 8 * d:], dtype=np.float64).reshape(d, d)
    return s, g, int(n)


def pca_project(ds, components: np.ndarray, mean: np.ndarray, *,
                vec_col: str = "embedding", id_col: str = "vec_id"):
    """Project every vector onto fitted components in one fused
    zero-shuffle map (broadcast the [k, d] matrix once). Returns a
    Dataset ``(id, proj)`` with ``proj`` a length-k list column.

    The projection accumulates over the d axis in a FIXED loop order
    (vectorized across rows) instead of one BLAS matmul: dgemm blocks
    by the batch's shape, so the same row's dot product drifts by
    last-ulp when block boundaries move — this way each row's
    projection is a pure function of that row and the fitted matrices,
    bit-identical under any layout (the rows-only rerun gate)."""
    import ray

    cref = ray.put((np.ascontiguousarray(components),
                    np.ascontiguousarray(mean)))

    def fn(df):
        comps, mu = ray.get(cref) if isinstance(cref, ray.ObjectRef) else cref
        m = np.stack([np.asarray(v, dtype=np.float64) for v in df[vec_col]])
        c = m - mu
        p = np.zeros((len(c), comps.shape[0]), dtype=np.float64)
        for j in range(comps.shape[0]):
            acc = np.zeros(len(c), dtype=np.float64)
            for t in range(comps.shape[1]):
                acc += c[:, t] * comps[j, t]
            p[:, j] = acc
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(np.int64),
            "proj": [row.tolist() for row in p],
        })

    return ds.map_batches(fn, batch_format="pandas")


# -------------------------------------------------- product quantization
# PQ (Jégou et al. 2011, "Product Quantization for Nearest Neighbor
# Search"): split d into m subspaces, k-means each subspace to n_codes
# codewords, store each vector as m uint8 codes (d*4 bytes -> m bytes,
# the 100-TB memory play), answer queries by Asymmetric Distance
# Computation — per-query (m, n_codes) lookup table, score = m table
# hops per candidate instead of a d-wide matmul.


def pq_train(ds, *, m: int = 4, n_codes: int = 16, iters: int = 2,
             vec_col: str = "embedding", id_col: str = "vec_id") -> np.ndarray:
    """Distributed per-subspace k-means for PQ codebooks. Returns
    float64 codebooks (m, n_codes, d//m).

    Same deterministic shape as train_ivf_centroids: seeds are the
    subvectors of the n_codes smallest keyed-hash ids (layout- and
    width-independent), every Lloyd round is ONE streaming pass whose
    batches emit per-(subspace, code) partial (count, sum-bytes) rows
    — all m subspaces learned in the same pass, the data never
    collected or shuffled; the driver merge is m x n_codes x n_blocks
    tiny rows, folded in canonical sorted order so RERUNS on the same
    layout are bit-identical. Like pca_train, the per-batch float
    partial sums themselves depend on block boundaries, so refits
    across different layouts can drift by last-ulp on general data
    (the fixture pytest's exact cross-layout equality holds because
    its float32-derived sums are exactly representable).
    """
    import ray

    from .sampling import split_hash

    def seed_partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"h": pd.Series(dtype=np.uint64),
                                 "vec": pd.Series(dtype=object)})
        h = split_hash(df[id_col].to_numpy())
        order = np.argsort(h, kind="stable")[:n_codes]
        vecs = np.stack(
            [np.asarray(v, dtype=np.float64) for v in df[vec_col].iloc[order]])
        return pd.DataFrame({"h": h[order], "vec": [r.tobytes() for r in vecs]})

    seeds = ds.map_batches(seed_partial, batch_format="pandas").to_pandas()
    seeds = seeds.sort_values("h", kind="stable").head(n_codes)
    seed_m = np.stack([np.frombuffer(b, dtype=np.float64) for b in seeds["vec"]])
    d = seed_m.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    books = np.ascontiguousarray(
        seed_m.reshape(n_codes, m, dsub).transpose(1, 0, 2))  # (m, n_codes, dsub)

    for _ in range(iters):
        bref = ray.put(books)

        def lloyd_partial(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame({"j": pd.Series(dtype=np.int64),
                                     "cid": pd.Series(dtype=np.int64),
                                     "n": pd.Series(dtype=np.int64),
                                     "s": pd.Series(dtype=object)})
            bk = ray.get(bref) if isinstance(bref, ray.ObjectRef) else bref
            vecs = np.stack(
                [np.asarray(v, dtype=np.float64) for v in df[vec_col]]
            ).reshape(len(df), m, dsub)
            rows = []
            for j in range(m):
                sub = vecs[:, j, :]
                d2 = (np.einsum("ij,ij->i", sub, sub)[:, None]
                      - 2.0 * sub @ bk[j].T
                      + np.einsum("ij,ij->i", bk[j], bk[j])[None, :])
                assign = np.argmin(d2, axis=1)
                for cid in np.unique(assign):
                    sel = sub[assign == cid]
                    rows.append({"j": j, "cid": int(cid), "n": len(sel),
                                 "s": sel.sum(axis=0).tobytes()})
            return pd.DataFrame(rows, columns=["j", "cid", "n", "s"])

        p = ds.map_batches(lloyd_partial, batch_format="pandas").to_pandas()
        nxt = books.copy()
        # canonical fold order (sorted bytes) -> bit-identical refits
        for (j, cid), grp in p.sort_values(
                ["j", "cid"]).groupby(["j", "cid"], sort=True):
            s = np.zeros(dsub)
            for b in sorted(grp["s"]):
                s += np.frombuffer(b, dtype=np.float64)
            nxt[int(j), int(cid)] = s / int(grp["n"].sum())
        books = nxt
    return books


def _pq_assign(q: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, d) vectors x (m, n_codes, dsub) codebooks (both int64 OR
    both float64 — the arithmetic below is dtype-generic and exact on
    the int64 path) -> (n, m) int64 codes; nearest by squared L2,
    ties -> lowest code (argmin takes the first minimum)."""
    n = q.shape[0]
    m, n_codes, dsub = books.shape
    sub = q.reshape(n, m, dsub)
    codes = np.empty((n, m), dtype=np.int64)
    for j in range(m):
        s = sub[:, j, :]
        d2 = (np.einsum("ij,ij->i", s, s)[:, None]
              - 2 * s @ books[j].T
              + np.einsum("ij,ij->i", books[j], books[j])[None, :])
        codes[:, j] = np.argmin(d2, axis=1)
    return codes


def pq_encode(ds, codebooks: np.ndarray, *, shift: int = 12,
              vec_col: str = "embedding", id_col: str = "vec_id"):
    """Compress the corpus: every vector -> m int64 codes (ship as m
    uint8/uint16 at rest; int64 here for exact downstream arithmetic).
    Codebooks are broadcast once; the encode fuses with the read —
    zero shuffle. Integer-exact when codebooks are int64 (pair with
    dedup.quantize_embeddings); float codebooks use float L2.
    Returns a Dataset (id, code_0..code_{m-1})."""
    import ray

    from .dedup import quantize_embeddings

    books = np.ascontiguousarray(codebooks)
    bref = ray.put(books)
    integer = books.dtype == np.int64

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        bk = ray.get(bref) if isinstance(bref, ray.ObjectRef) else bref
        m = bk.shape[0]
        out = {id_col: df[id_col].to_numpy(np.int64)}
        if len(df) == 0:
            for j in range(m):
                out[f"code_{j}"] = np.array([], dtype=np.int64)
            return pd.DataFrame(out)
        vecs = np.stack([np.asarray(v, dtype=np.float64) for v in df[vec_col]])
        qv = quantize_embeddings(vecs, shift) if integer else vecs
        codes = _pq_assign(qv, bk)
        for j in range(m):
            out[f"code_{j}"] = codes[:, j]
        return pd.DataFrame(out)

    return ds.map_batches(fn, batch_format="pandas")


def pq_adc_topk(ds, queries: np.ndarray, codebooks: np.ndarray, *,
                k: int = 10, shift: int | None = 12,
                vec_col: str = "embedding", id_col: str = "vec_id",
                query_ids: np.ndarray | None = None) -> pd.DataFrame:
    """PQ top-k by Asymmetric Distance Computation. Zero-shuffle brute
    shape: (queries, codebooks) broadcast once; each batch encodes its
    vectors and scores them by LUT gather — per-query (m, n_codes)
    distance table, dist = sum of m hops — then emits a partial top-k
    (dist asc, id asc); the driver merges n_query x k x n_blocks rows.

    With int64 codebooks and ``shift`` set, EVERY op is exact int64
    (quantized diffs <= 2^13, per-subspace d2 < 2^31, ADC sum < 2^33)
    — the DuckDB-mirrorable variant (`pq_adc` query). ``shift=None``
    runs the float64 path for float codebooks (pq_train output).

    Returns (query_id, vec_id, dist, rank) — rank 0..k-1 per query,
    dist int64 on the integer path.
    """
    import ray

    from .dedup import quantize_embeddings

    books = np.ascontiguousarray(codebooks)
    integer = shift is not None and books.dtype == np.int64
    m, n_codes, dsub = books.shape
    qm = np.asarray(queries, dtype=np.float64)
    qsub = (quantize_embeddings(qm, shift) if integer else qm).reshape(
        len(qm), m, dsub)
    # per-query LUT: (n_query, m, n_codes) exact squared distances
    lut = np.empty((len(qm), m, n_codes),
                   dtype=np.int64 if integer else np.float64)
    for j in range(m):
        qs = qsub[:, j, :]
        lut[:, j, :] = (np.einsum("ij,ij->i", qs, qs)[:, None]
                        - 2 * qs @ books[j].T
                        + np.einsum("ij,ij->i", books[j], books[j])[None, :])
    qids = (np.asarray(query_ids, dtype=np.int64) if query_ids is not None
            else np.arange(len(qm), dtype=np.int64))
    ref = ray.put((books, lut, qids))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        bk, tbl, qi_ids = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        empty = pd.DataFrame({
            "query_id": pd.Series(dtype=np.int64),
            "vec_id": pd.Series(dtype=np.int64),
            "dist": pd.Series(dtype=tbl.dtype),
        })
        if len(df) == 0:
            return empty
        vecs = np.stack([np.asarray(v, dtype=np.float64) for v in df[vec_col]])
        qv = quantize_embeddings(vecs, shift) if integer else vecs
        codes = _pq_assign(qv, bk)
        ids = df[id_col].to_numpy(np.int64)
        # ADC: gather per subspace, sum -> (n_query, n_batch)
        dist = tbl[:, 0, codes[:, 0]]
        for j in range(1, bk.shape[0]):
            dist = dist + tbl[:, j, codes[:, j]]
        kk = min(k, dist.shape[1])
        out_q, out_v, out_d = [], [], []
        for qi in range(dist.shape[0]):
            order = np.lexsort((ids, dist[qi]))[:kk]
            out_q.append(np.full(kk, qi_ids[qi], dtype=np.int64))
            out_v.append(ids[order])
            out_d.append(dist[qi][order])
        return pd.DataFrame({"query_id": np.concatenate(out_q),
                             "vec_id": np.concatenate(out_v),
                             "dist": np.concatenate(out_d)})

    partials = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = []
    for qid, grp in partials.groupby("query_id"):
        grp = grp.sort_values(["dist", "vec_id"],
                              ascending=[True, True]).head(k)
        out.append(grp.assign(rank=np.arange(len(grp), dtype=np.int64)))
    if not out:
        return pd.DataFrame({
            "query_id": pd.Series(dtype=np.int64),
            "vec_id": pd.Series(dtype=np.int64),
            "dist": pd.Series(dtype=np.int64 if integer else np.float64),
            "rank": pd.Series(dtype=np.int64)})
    return (pd.concat(out, ignore_index=True)
            .sort_values(["query_id", "rank"]).reset_index(drop=True))


def ivf_pq_topk(ds, queries: np.ndarray, centroids: np.ndarray,
                codebooks: np.ndarray, *, k: int = 10, nprobe: int = 2,
                shift: int | None = None, vec_col: str = "embedding",
                id_col: str = "vec_id") -> pd.DataFrame:
    """IVF-PQ — the production ANN configuration: the inverted file
    restricts WHICH vectors each query scores (nprobe nearest centroid
    lists, ivf_topk's probe table), product quantization restricts HOW
    (per-query LUT + m code gathers instead of a d-dim matmul). Same
    zero-shuffle shape as brute/ivf/pq: (centroids, probe table,
    codebooks, LUT) broadcast once, per-batch partial top-k (dist asc,
    id asc), tiny driver merge.

    With ``nprobe == n_centroids`` every vector is scored and the
    output is bit-identical to pq_adc_topk (the pytest gate, mirroring
    ivf_topk's nprobe==m ≡ brute gate). ``shift`` as in pq_adc_topk:
    int64 codebooks + shift -> exact int64 ADC; None -> float64.
    Returns (query_id, vec_id, dist, rank).
    """
    import ray

    from .dedup import quantize_embeddings

    books = np.ascontiguousarray(codebooks)
    integer = shift is not None and books.dtype == np.int64
    m, n_codes, dsub = books.shape
    qm = np.asarray(queries, dtype=np.float64)
    cen = np.asarray(centroids, dtype=np.float64)
    n_cent = len(cen)
    nprobe = min(nprobe, n_cent)
    qc = _unit(qm) @ cen.T
    probe_tbl = np.zeros((len(qm), n_cent), dtype=bool)
    for qi in range(len(qm)):
        order = np.lexsort((np.arange(n_cent), -qc[qi]))[:nprobe]
        probe_tbl[qi, order] = True
    qsub = (quantize_embeddings(qm, shift) if integer else qm).reshape(
        len(qm), m, dsub)
    lut = np.empty((len(qm), m, n_codes),
                   dtype=np.int64 if integer else np.float64)
    for j in range(m):
        qs = qsub[:, j, :]
        lut[:, j, :] = (np.einsum("ij,ij->i", qs, qs)[:, None]
                        - 2 * qs @ books[j].T
                        + np.einsum("ij,ij->i", books[j], books[j])[None, :])
    ref = ray.put((cen, probe_tbl, books, lut))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c, tbl, bk, L = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        empty = pd.DataFrame({
            "query_id": pd.Series(dtype=np.int64),
            "vec_id": pd.Series(dtype=np.int64),
            "dist": pd.Series(dtype=L.dtype),
        })
        if len(df) == 0:
            return empty
        vecs = np.stack([np.asarray(v, dtype=np.float64) for v in df[vec_col]])
        ids = df[id_col].to_numpy(np.int64)
        assign = np.argmax(c @ _unit(vecs).T, axis=0)
        valid = tbl[:, assign]
        keep = valid.any(axis=0)
        if not keep.any():
            return empty
        vecs, ids, valid = vecs[keep], ids[keep], valid[:, keep]
        qv = quantize_embeddings(vecs, shift) if integer else vecs
        codes = _pq_assign(qv, bk)
        dist = L[:, 0, codes[:, 0]]
        for j in range(1, bk.shape[0]):
            dist = dist + L[:, j, codes[:, j]]
        out_q, out_v, out_d = [], [], []
        for qi in range(dist.shape[0]):
            sel = valid[qi]
            nv = int(sel.sum())
            if nv == 0:
                continue
            kk = min(k, nv)
            di, ii = dist[qi][sel], ids[sel]
            order = np.lexsort((ii, di))[:kk]
            out_q.append(np.full(kk, qi, dtype=np.int64))
            out_v.append(ii[order])
            out_d.append(di[order])
        if not out_q:
            return empty
        return pd.DataFrame({"query_id": np.concatenate(out_q),
                             "vec_id": np.concatenate(out_v),
                             "dist": np.concatenate(out_d)})

    partials = ds.map_batches(partial, batch_format="pandas").to_pandas()
    typed_empty = pd.DataFrame({
        "query_id": pd.Series(dtype=np.int64),
        "vec_id": pd.Series(dtype=np.int64),
        "dist": pd.Series(dtype=np.int64 if integer else np.float64),
        "rank": pd.Series(dtype=np.int64)})
    if not len(partials):     # 0-row Ray datasets drop their schema
        return typed_empty
    out = []
    for _qid, grp in partials.groupby("query_id"):
        grp = grp.sort_values(["dist", "vec_id"],
                              ascending=[True, True]).head(k)
        out.append(grp.assign(rank=np.arange(len(grp), dtype=np.int64)))
    if not out:
        return typed_empty
    return (pd.concat(out, ignore_index=True)
            .sort_values(["query_id", "rank"]).reset_index(drop=True))


def _list_flat(col):
    """Flattened values array + element count per row for an arrow
    list / fixed_size_list / tensor-extension column."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.ExtensionArray):   # Ray ArrowTensorArray
        col = col.storage
    n = len(col)
    flat = col.values if isinstance(col, pa.FixedSizeListArray) else col.flatten()
    d = len(flat) // n if n else 0
    return flat, d


def _fixed_list_mat(col, d: int | None = None) -> np.ndarray:
    """(rows, d) int64 matrix from an arrow (fixed-size-)list column,
    zero-copy through the flattened values buffer."""
    flat, dd = _list_flat(col)
    if d is None:
        d = dd
    return flat.to_numpy(zero_copy_only=False).reshape(-1, d)


def quantize_grid_int(ds, *, vec_col: str = "embedding",
                      id_col: str = "vec_id", levels: int = 1024,
                      scale: float = 512.0):
    """Quantize a list<float> column to non-negative int64 grid
    coordinates: floor((float64(v) + 1.0) * scale) clipped to
    [0, levels-1].

    Non-negative by construction so downstream floor divisions equal
    DuckDB's truncating `//` (the numpy-floors/DuckDB-truncates trap —
    see CLAUDE.md). Arrow-native: the list column is flattened
    zero-copy and returned as a fixed_size_list<int64> column ``x``;
    the float payload is dropped.
    """
    import pyarrow as pa

    def fn(batch: "pa.Table") -> "pa.Table":
        flat, d = _list_flat(batch[vec_col])
        v = flat.to_numpy(zero_copy_only=False).astype(np.float64)
        q = np.clip(np.floor((v + 1.0) * scale), 0, levels - 1)
        xs = pa.FixedSizeListArray.from_arrays(
            pa.array(q.astype(np.int64)), d)
        return pa.table({id_col: batch[id_col], "x": xs})

    return ds.map_batches(fn, batch_format="pyarrow")


def _subset_rows(batch, ids: np.ndarray, idx: np.ndarray, id_col: str):
    """Tiny (id, x) projection of selected rows, preserving the x
    column's fixed_size_list type even when the selection (or the
    batch) is empty — FixedSizeListArray.from_arrays rejects
    list_size 0, so the type is taken from the input schema."""
    import pyarrow as pa

    xtype = batch.schema.field("x").type
    if len(idx) == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "x": pa.array([], xtype)})
    flat, d = _list_flat(batch["x"])
    X = flat.to_numpy(zero_copy_only=False).reshape(-1, d)[idx]
    xs = pa.FixedSizeListArray.from_arrays(
        pa.array(X.ravel(), pa.int64()), d)
    return pa.table({id_col: pa.array(ids[idx].astype(np.int64)),
                     "x": xs})


def _kmeans_assign(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Exact int64 squared-Euclidean argmin; numpy integer matmul is
    exact (no BLAS float path) and np.argmin takes the FIRST minimum,
    i.e. ties break to the lowest cluster id — matching the SQL
    mirror's ORDER BY dist, cid."""
    d2 = ((X * X).sum(axis=1, keepdims=True)
          - 2 * (X @ C.T)
          + (C * C).sum(axis=1)[None, :])
    return np.argmin(d2, axis=1)


def kmeans_int(ds, *, k: int = 8, iters: int = 2,
               vec_col: str = "embedding", id_col: str = "vec_id",
               levels: int = 1024, scale: float = 512.0):
    """Integer-exact distributed Lloyd's k-means — the hash-checkable
    clustering operator (cf. `train_ivf_centroids`, the float
    k-means-lite inside IVF, which is only rows-checked).

    Everything is integer, so the fixpoint is bit-reproducible across
    block layouts and parallelism AND constructible by an unrolled SQL
    mirror (queries._sql_embed_kmeans):

    - coordinates: `quantize_grid_int` non-negative grid ints;
    - seeds: the vectors of the k smallest ids, cid in id order;
    - assignment: exact int64 squared distance, ties to lowest cid;
    - update: per-dimension floor division sum // count (operands
      non-negative, so numpy floor == DuckDB trunc); empty clusters
      keep their previous centroid;
    - partials are per-block (count[k], sum[k, d]) int64 buffers —
      an associative semigroup, so merge order cannot change the
      result (no float canonical-order caveat).

    One streaming pass per round over the materialized quantized
    dataset (id + d int64 — the float payload is dropped before the
    loop); vectors are never collected or shuffled. Returns
    (summary DataFrame [cluster_id, n_points, id_sum, cnorm2],
    centroids int64 (k, d)).
    """
    import pyarrow as pa

    # the loop re-reads the (tiny-rows) quantized projection each
    # round: materialize once (lazy Datasets recompute per consumer)
    qds = quantize_grid_int(ds, vec_col=vec_col, id_col=id_col,
                            levels=levels, scale=scale).materialize()

    def seed_partial(batch: "pa.Table") -> "pa.Table":
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")[:k]
        return _subset_rows(batch, ids, order, id_col)

    seeds = pa.concat_tables(
        qds.map_batches(seed_partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None))
    if len(seeds) == 0:
        raise ValueError("kmeans_int: empty input dataset")
    sids = seeds[id_col].to_numpy(zero_copy_only=False)
    order = np.argsort(sids, kind="stable")[:k]
    C = _fixed_list_mat(seeds["x"])[order].astype(np.int64)
    d = C.shape[1]

    def lloyd_partial(batch: "pa.Table") -> "pa.Table":
        X = _fixed_list_mat(batch["x"], d)
        assign = _kmeans_assign(X, C)
        counts = np.bincount(assign, minlength=k).astype(np.int64)
        sums = np.zeros((k, d), dtype=np.int64)
        np.add.at(sums, assign, X)
        return pa.table({"n": pa.array([counts.tobytes()]),
                         "s": pa.array([sums.tobytes()])})

    for _ in range(iters):
        parts = qds.map_batches(
            lloyd_partial, batch_format="pyarrow").take_all()
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, d), dtype=np.int64)
        for row in parts:
            counts += np.frombuffer(row["n"], dtype=np.int64)
            sums += np.frombuffer(row["s"], dtype=np.int64).reshape(k, d)
        nxt = C.copy()
        nz = counts > 0
        nxt[nz] = sums[nz] // counts[nz, None]   # non-negative: floor==trunc
        C = nxt

    def final_partial(batch: "pa.Table") -> "pa.Table":
        X = _fixed_list_mat(batch["x"], d)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        assign = _kmeans_assign(X, C)
        counts = np.bincount(assign, minlength=k).astype(np.int64)
        idsum = np.zeros(k, dtype=np.int64)
        np.add.at(idsum, assign, ids)
        return pa.table({"n": pa.array([counts.tobytes()]),
                         "i": pa.array([idsum.tobytes()])})

    parts = qds.map_batches(
        final_partial, batch_format="pyarrow").take_all()
    counts = np.zeros(k, dtype=np.int64)
    idsum = np.zeros(k, dtype=np.int64)
    for row in parts:
        counts += np.frombuffer(row["n"], dtype=np.int64)
        idsum += np.frombuffer(row["i"], dtype=np.int64)

    summary = pd.DataFrame({
        "cluster_id": np.arange(k, dtype=np.int64),
        "n_points": counts,
        "id_sum": idsum,
        "cnorm2": (C * C).sum(axis=1).astype(np.int64),
    })
    return summary, C


def ivf_topk_int(ds, query_ids: np.ndarray, *, k: int = 10,
                 nprobe: int = 3, n_centroids: int = 8, iters: int = 2,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 levels: int = 1024, scale: float = 512.0):
    """Integer-exact IVF top-k — the hash-checkable twin of `ivf_topk`
    (whose float Lloyd centroids keep it rows-only): trains
    `kmeans_int` centroids on the quantized grid, assigns every vector
    to its exact-nearest centroid (ties -> lowest cid), probes each
    query's ``nprobe`` nearest centroids, and ranks candidates by
    exact int64 squared L2 (dist asc, vec_id asc).

    Queries are the corpus vectors with ids in ``query_ids`` (the
    SQL-derivable convention pq_adc uses). Same zero-shuffle scaling
    shape as ivf_topk: (queries, centroids, probe table) broadcast
    once, every batch emits at most n_query x k partial winners, the
    driver merges tiny partials. nprobe == n_centroids scores every
    candidate, so it is bit-equal to the unpartitioned scan (the
    pytest gate); smaller nprobe does ~nprobe/n_centroids of the work.
    """
    import pyarrow as pa
    import ray

    _summary, C = kmeans_int(ds, k=n_centroids, iters=iters,
                             vec_col=vec_col, id_col=id_col,
                             levels=levels, scale=scale)
    qds = quantize_grid_int(ds, vec_col=vec_col, id_col=id_col,
                            levels=levels, scale=scale).materialize()

    qid_set = np.asarray(sorted(int(q) for q in query_ids), dtype=np.int64)

    def pick_queries(batch: "pa.Table") -> "pa.Table":
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sel = np.flatnonzero(np.isin(ids, qid_set))
        return _subset_rows(batch, ids, sel, id_col)

    qtab = pa.concat_tables(
        qds.map_batches(pick_queries, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None))
    qorder = np.argsort(qtab[id_col].to_numpy(zero_copy_only=False),
                        kind="stable")
    qids = qtab[id_col].to_numpy(zero_copy_only=False)[qorder]
    Q = _fixed_list_mat(qtab["x"])[qorder]
    nprobe = min(nprobe, n_centroids)

    # per-query probed centroids: exact int distance, ties lowest cid
    probe_tbl = np.zeros((len(Q), n_centroids), dtype=bool)
    qc = ((Q * Q).sum(axis=1, keepdims=True) - 2 * (Q @ C.T)
          + (C * C).sum(axis=1)[None, :])
    for qi in range(len(Q)):
        order = np.lexsort((np.arange(n_centroids), qc[qi]))[:nprobe]
        probe_tbl[qi, order] = True

    bref = ray.put((Q, qids, C, probe_tbl))

    def partial(batch: "pa.Table") -> "pa.Table":
        Qm, qid_arr, Cm, tbl = (ray.get(bref)
                                if isinstance(bref, ray.ObjectRef) else bref)
        X = _fixed_list_mat(batch["x"])
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        assign = _kmeans_assign(X, Cm)
        valid = tbl[:, assign]                       # (n_query, n_batch)
        keep = valid.any(axis=0)
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "vec_id": pa.array([], pa.int64()),
                          "dist": pa.array([], pa.int64())})
        if not keep.any():
            return empty
        X, ids, valid = X[keep], ids[keep], valid[:, keep]
        d2 = ((X * X).sum(axis=1)[None, :] - 2 * (Qm @ X.T)
              + (Qm * Qm).sum(axis=1)[:, None])
        out_q, out_v, out_d = [], [], []
        for qi in range(len(Qm)):
            sel = valid[qi]
            nv = int(sel.sum())
            if nv == 0:
                continue
            kk = min(k, nv)
            di, ii = d2[qi][sel], ids[sel]
            order = np.lexsort((ii, di))[:kk]
            out_q.append(np.full(kk, qid_arr[qi], dtype=np.int64))
            out_v.append(ii[order])
            out_d.append(di[order])
        if not out_q:
            return empty
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         "vec_id": pa.array(np.concatenate(out_v)),
                         "dist": pa.array(np.concatenate(out_d))})

    parts = qds.map_batches(partial, batch_format="pyarrow").to_pandas()
    typed_empty = pd.DataFrame({
        "query_id": pd.Series(dtype=np.int64),
        "vec_id": pd.Series(dtype=np.int64),
        "dist": pd.Series(dtype=np.int64),
        "rank": pd.Series(dtype=np.int64)})
    if not len(parts):        # 0-row Ray datasets drop their schema
        return typed_empty
    out = []
    for _qid, grp in parts.groupby("query_id"):
        grp = grp.sort_values(["dist", "vec_id"],
                              ascending=[True, True]).head(k)
        out.append(grp.assign(rank=np.arange(len(grp), dtype=np.int64)))
    if not out:
        return typed_empty
    return (pd.concat(out, ignore_index=True)
            .sort_values(["query_id", "rank"]).reset_index(drop=True))
