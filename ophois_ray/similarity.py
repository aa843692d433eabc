"""Similarity search over an embedding column (list<float>).

- brute_force_topk: the exact baseline — numpy matmul per batch against
  a broadcast query matrix (ray.put once, fetched per actor), per-batch
  partial top-k, driver merge of the tiny partials. One streaming pass,
  zero shuffle.
- lsh_topk: the scale path — random-hyperplane signature buckets with
  multiprobe (flip each bit); candidates searched exactly within
  probed buckets. Approximate; recall rises with n_probe planes.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    return m / n[:, None]


class _BruteScorer:
    """Actor-pool stage: holds the broadcast (normalized) query matrix."""

    def __init__(self, query_ref, vec_col: str, id_col: str, k: int):
        import ray

        q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        self.q = _unit(np.asarray(q, dtype=np.float64))
        self.vec_col = vec_col
        self.id_col = id_col
        self.k = k

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        vecs = _unit(np.stack([np.asarray(v, dtype=np.float64) for v in df[self.vec_col]]))
        ids = df[self.id_col].to_numpy()
        sims = self.q @ vecs.T  # (n_query, n_batch)
        k = min(self.k, sims.shape[1])
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        qidx = np.repeat(np.arange(sims.shape[0]), k)
        vidx = part.ravel()
        return pd.DataFrame(
            {
                "query_id": qidx.astype(np.int64),
                "vec_id": ids[vidx],
                "cosine": sims[qidx, vidx],
            }
        )


def brute_force_topk(ds, queries: np.ndarray, *, k: int = 10, vec_col: str = "embedding",
                     id_col: str = "vec_id", concurrency: int = 4, batch_size: int = 4096
                     ) -> pd.DataFrame:
    """Exact cosine top-k for each query row. Returns pandas
    (query_id, vec_id, cosine, rank) sorted by (query_id, rank);
    deterministic tiebreak on (cosine desc, vec_id asc)."""
    import ray

    qref = ray.put(np.asarray(queries, dtype=np.float64))
    partials = ds.map_batches(
        _BruteScorer,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        fn_constructor_args=(qref, vec_col, id_col, k),
    ).to_pandas()
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


def lsh_topk(ds, queries: np.ndarray, *, k: int = 10, vec_col: str = "embedding",
             id_col: str = "vec_id", n_planes: int = 8, seed: int = 13,
             multiprobe: int = 1) -> pd.DataFrame:
    """Approximate cosine top-k: vectors bucketed by hyperplane sign
    signature; each query probes its own bucket plus every bucket within
    `multiprobe` sign flips, then scores candidates exactly.

    At cluster scale the buckets are the shuffle key (groupby bucket)
    and queries are broadcast; here candidates stream back per batch.
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
    wanted = set().union(*probe_sets) if probe_sets else set()

    import ray

    qref = ray.put((queries, planes, sorted(wanted)))

    class Scorer:
        def __init__(self):
            q, pl, want = ray.get(qref) if isinstance(qref, ray.ObjectRef) else qref
            self.q, self.planes, self.want = q, pl, np.array(want, dtype=np.int64)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            vecs = _unit(np.stack([np.asarray(v, dtype=np.float64) for v in df[vec_col]]))
            s = (vecs @ self.planes) >= 0
            sig = np.zeros(len(vecs), dtype=np.int64)
            for i in range(n_planes):
                sig |= s[:, i].astype(np.int64) << i
            m = np.isin(sig, self.want)
            if not m.any():
                return pd.DataFrame(
                    {"vec_id": pd.Series(dtype=df[id_col].dtype),
                     "sig": pd.Series(dtype=np.int64),
                     "cos": pd.Series(dtype=object)}
                )
            cand = vecs[m]
            sims = self.q @ cand.T
            return pd.DataFrame(
                {
                    "vec_id": df[id_col].to_numpy()[m],
                    "sig": sig[m],
                    "cos": [sims[:, i] for i in range(cand.shape[0])],
                }
            )

    cands = ds.map_batches(Scorer, batch_format="pandas", concurrency=(1, 4)).to_pandas()
    rows = []
    for qi in range(len(queries)):
        probes = probe_sets[qi]
        heap: list = []
        for vid, sig, cos in zip(cands["vec_id"], cands["sig"], cands["cos"]):
            if int(sig) in probes:
                heapq.heappush(heap, (-float(cos[qi]), vid))
        got = []
        while heap and len(got) < k:
            c, vid = heapq.heappop(heap)
            got.append((qi, vid, -c, len(got)))
        rows.extend(got)
    return pd.DataFrame(rows, columns=["query_id", "vec_id", "cosine", "rank"])
