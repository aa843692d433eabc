"""Linear text classification over hashed bag-of-n-gram features —
the fastText shape (Joulin et al. 2016, "Bag of Tricks for Efficient
Text Classification") as a Ray Data training loop: the model is the
small broadcast side (C x B weights), the corpus is never collected.

- featurize: word unigram+bigram -> stable 64-bit hash -> bucket id
  (pd.util.hash_array, the repo-wide deterministic string hash), counts
  L1-normalized per doc.
- train_linear: full-batch softmax-regression gradient descent. Each
  epoch is ONE streaming pass: the weight matrix is ray.put once,
  every batch emits its exact gradient partial (C x B float64, packed
  bytes — ragged ndarrays cannot ride pandas cells) plus its loss/count
  scalars; the driver folds partials in canonical (sorted) order so a
  rerun on the same layout is bit-identical, and updates the weights.
  Like pca_train, partial sums depend on block boundaries, so refits
  across DIFFERENT layouts may drift by last-ulp (documented, gated
  with allclose in pytest).
- predict / confusion: broadcast the fitted weights, score per batch
  (argmax, ties -> lowest class index), one tiny aggregate out.

Scale shape: weights C x B float64 (a few MB) broadcast per epoch;
gradient partials are the same fixed size per block — independent of
rows — so the driver merge is n_blocks x (C x B), not data-sized. For
B beyond driver comfort, shard the bucket axis across a grouped_apply
(documented, not needed at these C/B).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _tokens(text: str) -> list:
    toks = text.split() if isinstance(text, str) else []
    return toks + [a + "_" + b for a, b in zip(toks, toks[1:])]


def _feature_rows(texts, n_buckets: int):
    """Per-doc (bucket ids, L1-normalized counts) via one vectorized
    hash call over the batch's concatenated token list."""
    per_doc = [_tokens(t) for t in texts]
    flat = [tok for toks in per_doc for tok in toks]
    if flat:
        h = (pd.util.hash_array(np.asarray(flat, dtype=object))
             % np.uint64(n_buckets)).astype(np.int64)
    else:
        h = np.array([], dtype=np.int64)
    out, at = [], 0
    for toks in per_doc:
        n = len(toks)
        ids = h[at:at + n]
        at += n
        if n == 0:
            out.append((ids, np.array([], dtype=np.float64)))
            continue
        uniq, cnt = np.unique(ids, return_counts=True)
        out.append((uniq, cnt / n))
    return out


def _scores(rows, w: np.ndarray) -> np.ndarray:
    """(n_docs, C) decision scores for sparse feature rows."""
    s = np.zeros((len(rows), w.shape[0]), dtype=np.float64)
    for i, (ids, vals) in enumerate(rows):
        if len(ids):
            s[i] = w[:, ids] @ vals
    return s


def train_linear(ds, classes, *, text_col: str = "text",
                 label_col: str = "lang", n_buckets: int = 1 << 15,
                 epochs: int = 5, lr: float = 2.0,
                 cache_features: bool = True):
    """Fit softmax regression by full-batch GD (deterministic — no
    sampling, no shuffling: the full-batch gradient is a sum of
    per-doc terms, merged canonically). Returns (weights [C, B],
    losses per epoch).

    ``cache_features`` materializes the hashed sparse rows once
    (packed bytes, smaller than the text) so the epoch loop streams
    the cache instead of re-reading + re-hashing the corpus per epoch
    — the standard multi-epoch tradeoff: object-store residency (with
    spill) bought for a ~(epochs)x tokenization saving. Pass False to
    re-featurize per epoch when the corpus dwarfs aggregate
    store+disk. Both paths are bit-identical (featurization is
    per-doc deterministic and map_batches preserves block boundaries,
    so the per-block gradient sums and canonical fold are unchanged).
    """
    import ray

    cls_idx = {c: i for i, c in enumerate(classes)}
    n_cls = len(classes)
    w = np.zeros((n_cls, n_buckets), dtype=np.float64)
    losses = []

    # featurize ONCE (tokenize + hash is the expensive pass — running
    # it inside the epoch loop re-read and re-hashed the corpus every
    # epoch); packed bytes per doc, never ragged ndarrays in cells.
    # map_batches -> materialize preserves block boundaries, so the
    # per-block gradient sums (and hence the canonical fold) are
    # bit-identical to featurizing inside the epoch pass.
    def pack(df: pd.DataFrame) -> pd.DataFrame:
        rows = _feature_rows(df[text_col].tolist(), n_buckets)
        y = np.array([cls_idx.get(l, -1) for l in df[label_col]],
                     dtype=np.int64)
        return pd.DataFrame({
            "ids": [ids.astype(np.int64).tobytes() for ids, _ in rows],
            "vals": [vals.tobytes() for _, vals in rows],
            "y": y,
        })

    feats = ds.map_batches(pack, batch_format="pandas")
    if cache_features:
        feats = feats.materialize()

    for _ in range(epochs):
        wref = ray.put(w)

        def grad_partial(df: pd.DataFrame) -> pd.DataFrame:
            wm = ray.get(wref) if isinstance(wref, ray.ObjectRef) else wref
            rows = [
                (np.frombuffer(i, dtype=np.int64),
                 np.frombuffer(v, dtype=np.float64))
                for i, v in zip(df["ids"], df["vals"])
            ]
            y = df["y"].to_numpy(np.int64)
            g = np.zeros_like(wm)
            loss, n = 0.0, 0
            s = _scores(rows, wm)
            s -= s.max(axis=1, keepdims=True)
            p = np.exp(s)
            p /= p.sum(axis=1, keepdims=True)
            for i, (ids, vals) in enumerate(rows):
                if y[i] < 0 or len(ids) == 0:
                    continue
                n += 1
                loss -= float(np.log(p[i, y[i]]))
                coef = p[i].copy()
                coef[y[i]] -= 1.0
                g[:, ids] += coef[:, None] * vals[None, :]
            return pd.DataFrame({"g": [g.tobytes()],
                                 "loss": [loss],
                                 "n": np.array([n], dtype=np.int64)})

        p = feats.map_batches(grad_partial, batch_format="pandas").to_pandas()
        n_total = int(p["n"].sum())
        if n_total == 0:
            raise ValueError("train_linear: no labeled rows")
        # canonical fold (sort by payload) -> rerun-deterministic sums.
        # The LOSS folds in the same canonical order: blocks arrive in
        # completion order (preserve_order is off), so a plain
        # p["loss"].sum() drifted by last-ulp between reruns of the
        # same input; the sort key appends the loss bytes so ties in g
        # stay deterministic too
        gs = p["g"].to_numpy(object)
        ls = p["loss"].to_numpy(np.float64)
        keys = np.array([b + v.tobytes() for b, v in zip(gs, ls)],
                        dtype=object)
        order = np.argsort(keys, kind="stable")
        g = np.zeros_like(w)
        loss_sum = 0.0
        for i in order:
            g += np.frombuffer(gs[i], dtype=np.float64).reshape(w.shape)
            loss_sum += float(ls[i])
        losses.append(loss_sum / n_total)
        w = w - lr * (g / n_total)
    return w, losses


def predict(ds, weights: np.ndarray, classes, *, text_col: str = "text",
            id_col: str = "doc_id", out_col: str = "pred"):
    """Broadcast-score every doc; argmax (ties -> lowest class index).
    Returns a Dataset (id, pred)."""
    import ray

    wref = ray.put(np.ascontiguousarray(weights))
    cls = list(classes)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        wm = ray.get(wref) if isinstance(wref, ray.ObjectRef) else wref
        rows = _feature_rows(df[text_col].tolist(), wm.shape[1])
        pick = np.argmax(_scores(rows, wm), axis=1)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(np.int64),
            out_col: [cls[i] for i in pick],
        })

    return ds.map_batches(fn, batch_format="pandas")


def confusion_counts(ds, weights: np.ndarray, classes, *,
                     text_col: str = "text", label_col: str = "lang"):
    """(label, pred, n) confusion table in one pass: per-batch integer
    count partials over the C x C grid, exact driver merge (C^2 rows).
    Returns a pandas DataFrame sorted by (label, pred), zero cells
    dropped."""
    import ray

    wref = ray.put(np.ascontiguousarray(weights))
    cls = list(classes)
    cls_idx = {c: i for i, c in enumerate(cls)}
    n_cls = len(cls)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        wm = ray.get(wref) if isinstance(wref, ray.ObjectRef) else wref
        rows = _feature_rows(df[text_col].tolist(), wm.shape[1])
        pick = np.argmax(_scores(rows, wm), axis=1)
        y = np.array([cls_idx.get(l, -1) for l in df[label_col]],
                     dtype=np.int64)
        keep = y >= 0
        grid = np.bincount(y[keep] * n_cls + pick[keep],
                           minlength=n_cls * n_cls).astype(np.int64)
        return pd.DataFrame({"cell": np.arange(n_cls * n_cls,
                                               dtype=np.int64),
                             "n": grid})

    p = ds.map_batches(fn, batch_format="pandas").to_pandas()
    tot = p.groupby("cell")["n"].sum()
    out = pd.DataFrame({
        "label": [cls[c // n_cls] for c in tot.index],
        "pred": [cls[c % n_cls] for c in tot.index],
        "n": tot.to_numpy(np.int64),
    })
    return (out[out["n"] > 0]
            .sort_values(["label", "pred"]).reset_index(drop=True))
