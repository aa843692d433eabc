"""Spatial join + kNN snap of pages to street edges via the cell index
(north rule: point-in-cell assignment, k-ring kNN snap, hash-partitioned
cell-to-cell joins with explicit skew-aware repartitioning of hot cells).

Join shape: both sides are mapped to cell keys (pages: the point's
cell expanded to its k-ring; edges: every cell the segment covers,
padded), unioned with a side tag and co-grouped on the salted cell key;
the per-group kernel computes vectorized point-to-segment distances
(numpy outer product per cell) and emits per-page candidates; a final
groupby(url) keeps the global top-k. Two shuffles total, both keyed on
bounded-size keys.

Distance kernel: planar point-to-segment in lon/lat space
(geo.point_segment_sqdist — consistent with the reference's planar
midpoint/lerp semantics) ranked by squared distance; the reported
``dist_m`` is the haversine of point -> closest point. Ranking by
planar sqdist uses only exactly-rounded IEEE ops, so results are
bit-reproducible and oracle-checkable.

Skew handling (explicit, per north rule): a pre-pass counts pages per
cell; cells above ``hot_threshold`` get their pages salted into
``ceil(count/hot_threshold)`` sub-groups (deterministic url hash) and
the edge side replicated per salt. The salting decision per cell is
returned as lineage.

Partitioning assumptions (documented): a page's true nearest edge is
found iff that edge covers a cell within ``ring`` of the page's cell —
choose res so cell_size >= the maximum expected snap distance, or raise
``ring``. Cells wrap longitudinally and clamp at the poles (cells.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data.aggregate import Count

from . import cells, geo
from .joins import stable_hash

_PAGE_SIDE, _EDGE_SIDE = 0, 1


def assign_cells(ds, res: int, lat_col: str = "lat", lon_col: str = "lon", out_col: str = "cell"):
    """Point-in-cell assignment: adds an int64 cell column."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[out_col] = cells.cell_of(df[lat_col].to_numpy(), df[lon_col].to_numpy(), res)
        return df

    return ds.map_batches(fn, batch_format="pandas")


def page_cell_counts(pages_with_cell):
    """cell -> page count (the skew pre-pass; small result)."""
    return (
        pages_with_cell.groupby("cell")
        .aggregate(Count(alias_name="n_pages"))
    )


def plan_salts(cell_counts_df: pd.DataFrame, hot_threshold: int) -> dict[int, int]:
    """cell -> number of salt partitions (1 = not hot). Lineage-logged."""
    plan = {}
    for cell, n in zip(cell_counts_df["cell"], cell_counts_df["n_pages"]):
        k = max(1, int(np.ceil(n / hot_threshold)))
        if k > 1:
            plan[int(cell)] = k
    return plan


_SALT_BITS = 6  # up to 64 salt partitions per cell
_SALT_MAX = 1 << _SALT_BITS


def knn_snap(
    pages,
    edges_with_coords,
    *,
    res: int,
    k: int = 1,
    ring: int = 1,
    hot_threshold: int = 50_000,
    num_salts_cap: int = _SALT_MAX,
):
    """Snap every page to its k nearest street edges via cell co-grouping.

    pages: Dataset with url, lat, lon (geotagged, deduped).
    edges_with_coords: Dataset with u, v, u_lat, u_lon, v_lat, v_lon.

    Returns (result_ds, lineage) where result_ds has columns
    (url, lat, lon, cell, u, v, dist_m, rank) — rank 0 = nearest,
    deterministic tiebreak (sqdist, u, v) — and lineage is a dict with
    the salting plan and parameters.
    """
    pages_c = assign_cells(pages, res)

    counts = page_cell_counts(pages_c).to_pandas()
    salt_plan = plan_salts(counts, hot_threshold)
    if any(v > num_salts_cap for v in salt_plan.values()):
        raise ValueError(f"salt fan-out exceeds cap {num_salts_cap}; raise hot_threshold or res")
    lineage = {
        "res": res,
        "ring": ring,
        "k": k,
        "hot_threshold": hot_threshold,
        "n_cells": int(len(counts)),
        "hot_cells": {str(c): int(s) for c, s in sorted(salt_plan.items())},
    }

    import ray

    plan_ref = ray.put(salt_plan)

    def expand_pages(df: pd.DataFrame) -> pd.DataFrame:
        """page -> one row per k-ring cell, salted by url hash in hot cells."""
        plan = ray.get(plan_ref) if isinstance(plan_ref, ray.ObjectRef) else plan_ref
        cell_arr = df["cell"].to_numpy()
        rows, ring_cells = cells.k_ring_many(cell_arr, ring)
        url = df["url"].to_numpy(object)[rows]
        lat = df["lat"].to_numpy()[rows]
        lon = df["lon"].to_numpy()[rows]
        home = cell_arr[rows]
        salts = np.zeros(len(rows), dtype=np.int64)
        if plan:
            h = stable_hash(url)
            for c, s in plan.items():
                m = ring_cells == c
                if m.any():
                    salts[m] = (h[m] % np.uint64(s)).astype(np.int64)
        return pd.DataFrame(
            {
                "key": ring_cells * _SALT_MAX + salts,
                "side": _PAGE_SIDE,
                "url": url,
                "plat": lat,
                "plon": lon,
                "home_cell": home,
                "u": "",
                "v": "",
                "alat": np.nan,
                "alon": np.nan,
                "blat": np.nan,
                "blon": np.nan,
            }
        )

    def expand_edges(df: pd.DataFrame) -> pd.DataFrame:
        """edge -> one row per covering cell per salt replica."""
        plan = ray.get(plan_ref) if isinstance(plan_ref, ray.ObjectRef) else plan_ref
        ei, ce = cells.cells_covering_segment(
            df["u_lat"].to_numpy(), df["u_lon"].to_numpy(),
            df["v_lat"].to_numpy(), df["v_lon"].to_numpy(),
            res,
        )
        u = df["u"].to_numpy(object)[ei]
        v = df["v"].to_numpy(object)[ei]
        alat = df["u_lat"].to_numpy()[ei]
        alon = df["u_lon"].to_numpy()[ei]
        blat = df["v_lat"].to_numpy()[ei]
        blon = df["v_lon"].to_numpy()[ei]
        # replicate per salt for hot cells
        reps = np.ones(len(ce), dtype=np.int64)
        if plan:
            for c, s in plan.items():
                reps[ce == c] = s
        ridx = np.repeat(np.arange(len(ce)), reps)
        salt = np.concatenate([np.arange(r) for r in reps]) if len(reps) else np.array([], dtype=np.int64)
        return pd.DataFrame(
            {
                "key": ce[ridx] * _SALT_MAX + salt,
                "side": _EDGE_SIDE,
                "url": "",
                "plat": np.nan,
                "plon": np.nan,
                "home_cell": np.int64(0),
                "u": u[ridx],
                "v": v[ridx],
                "alat": alat[ridx],
                "alon": alon[ridx],
                "blat": blat[ridx],
                "blon": blon[ridx],
            }
        )

    tagged = pages_c.map_batches(expand_pages, batch_format="pandas").union(
        edges_with_coords.map_batches(expand_edges, batch_format="pandas")
    )

    def per_cell(group: pd.DataFrame) -> pd.DataFrame:
        pg = group[group["side"] == _PAGE_SIDE]
        eg = group[group["side"] == _EDGE_SIDE].drop_duplicates(subset=["u", "v"])
        if len(pg) == 0 or len(eg) == 0:
            return _empty_candidates()
        plat = pg["plat"].to_numpy()[:, None]
        plon = pg["plon"].to_numpy()[:, None]
        alat = eg["alat"].to_numpy()[None, :]
        alon = eg["alon"].to_numpy()[None, :]
        blat = eg["blat"].to_numpy()[None, :]
        blon = eg["blon"].to_numpy()[None, :]
        sq = geo.point_segment_sqdist(plat, plon, alat, alon, blat, blon)
        kk = min(k, sq.shape[1])
        # per page: k smallest, deterministic tiebreak via argsort on
        # (sqdist, u, v) handled downstream; here take k by sqdist then
        # stable order on (u, v) via lexsort for ties
        part = np.argpartition(sq, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(sq.shape[0]), kk)
        cols = part.ravel()
        return pd.DataFrame(
            {
                "url": pg["url"].to_numpy(object)[rows],
                "plat": pg["plat"].to_numpy()[rows],
                "plon": pg["plon"].to_numpy()[rows],
                "home_cell": pg["home_cell"].to_numpy()[rows],
                "u": eg["u"].to_numpy(object)[cols],
                "v": eg["v"].to_numpy(object)[cols],
                "sqdist": sq[rows, cols],
                "alat": eg["alat"].to_numpy()[cols],
                "alon": eg["alon"].to_numpy()[cols],
                "blat": eg["blat"].to_numpy()[cols],
                "blon": eg["blon"].to_numpy()[cols],
            }
        )

    candidates = tagged.groupby("key").map_groups(per_cell, batch_format="pandas")

    if k == 1:
        result = _nearest_packmin(candidates)
        return result, lineage

    def topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(subset=["u", "v"])
        order = np.lexsort(
            (g["v"].to_numpy(object), g["u"].to_numpy(object), g["sqdist"].to_numpy())
        )[:k]
        g = g.iloc[order]
        # closest point on segment -> haversine metres
        plat = g["plat"].to_numpy()
        plon = g["plon"].to_numpy()
        dlat = g["blat"].to_numpy() - g["alat"].to_numpy()
        dlon = g["blon"].to_numpy() - g["alon"].to_numpy()
        seg_sq = dlat * dlat + dlon * dlon
        num = (plat - g["alat"].to_numpy()) * dlat + (plon - g["alon"].to_numpy()) * dlon
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(seg_sq > 0, num / np.where(seg_sq > 0, seg_sq, 1.0), 0.0)
        t = np.clip(t, 0.0, 1.0)
        clat = g["alat"].to_numpy() + t * dlat
        clon = g["alon"].to_numpy() + t * dlon
        dist_m = geo.haversine_m(plat, plon, clat, clon)
        return pd.DataFrame(
            {
                "url": g["url"].to_numpy(object),
                "lat": plat,
                "lon": plon,
                "cell": g["home_cell"].to_numpy(),
                "u": g["u"].to_numpy(object),
                "v": g["v"].to_numpy(object),
                "sqdist": g["sqdist"].to_numpy(),
                "dist_m": np.asarray(dist_m, dtype=np.float64).reshape(-1),
                "rank": np.arange(len(g), dtype=np.int64),
            }
        )

    result = candidates.groupby("url").map_groups(topk, batch_format="pandas")
    return result, lineage


_PACK_SEP = "\x01"


def _nearest_packmin(candidates):
    """k=1 fast path: global nearest per url without per-group Python.

    Packs (sqdist-as-sortable-hex, u, v, payload) into one string and
    takes a groupby-min — the IEEE bit pattern of a non-negative float64
    is monotonic, so string order == numeric order. Fully vectorized;
    one shuffle over (url, packed) rows.
    """

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"url": pd.Series(dtype=object), "packed": pd.Series(dtype=object)})
        bits = df["sqdist"].to_numpy(np.float64).view(np.uint64)
        packed = [
            f"{b:016x}{_PACK_SEP}{u}{_PACK_SEP}{v}{_PACK_SEP}"
            f"{plat!r}{_PACK_SEP}{plon!r}{_PACK_SEP}{int(hc)}{_PACK_SEP}"
            f"{alat!r}{_PACK_SEP}{alon!r}{_PACK_SEP}{blat!r}{_PACK_SEP}{blon!r}"
            for b, u, v, plat, plon, hc, alat, alon, blat, blon in zip(
                bits, df["u"], df["v"], df["plat"], df["plon"], df["home_cell"],
                df["alat"], df["alon"], df["blat"], df["blon"]
            )
        ]
        return pd.DataFrame({"url": df["url"], "packed": np.array(packed, dtype=object)})

    from ray.data.aggregate import Min

    winners = (
        candidates.map_batches(pack, batch_format="pandas")
        .groupby("url")
        .aggregate(Min("packed", alias_name="packed"))
    )

    def unpack(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {c: pd.Series(dtype=t) for c, t in [
                    ("url", object), ("lat", np.float64), ("lon", np.float64),
                    ("cell", np.int64), ("u", object), ("v", object),
                    ("sqdist", np.float64), ("dist_m", np.float64), ("rank", np.int64)]}
            )
        parts = df["packed"].str.split(_PACK_SEP, expand=True)
        sqd = np.array(
            [np.uint64(int(x, 16)) for x in parts[0]], dtype=np.uint64
        ).view(np.float64)
        plat = parts[3].astype(np.float64).to_numpy()
        plon = parts[4].astype(np.float64).to_numpy()
        alat = parts[6].astype(np.float64).to_numpy()
        alon = parts[7].astype(np.float64).to_numpy()
        blat = parts[8].astype(np.float64).to_numpy()
        blon = parts[9].astype(np.float64).to_numpy()
        dlat = blat - alat
        dlon = blon - alon
        seg_sq = dlat * dlat + dlon * dlon
        num = (plat - alat) * dlat + (plon - alon) * dlon
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(seg_sq > 0, num / np.where(seg_sq > 0, seg_sq, 1.0), 0.0)
        t = np.clip(t, 0.0, 1.0)
        dist_m = geo.haversine_m(plat, plon, alat + t * dlat, alon + t * dlon)
        return pd.DataFrame(
            {
                "url": df["url"],
                "lat": plat,
                "lon": plon,
                "cell": parts[5].astype(np.int64).to_numpy(),
                "u": parts[1].to_numpy(object),
                "v": parts[2].to_numpy(object),
                "sqdist": sqd,
                "dist_m": np.asarray(dist_m, dtype=np.float64).reshape(-1),
                "rank": np.int64(0),
            }
        )

    return winners.map_batches(unpack, batch_format="pandas")


def _empty_candidates() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "url": pd.Series(dtype=object),
            "plat": pd.Series(dtype=np.float64),
            "plon": pd.Series(dtype=np.float64),
            "home_cell": pd.Series(dtype=np.int64),
            "u": pd.Series(dtype=object),
            "v": pd.Series(dtype=object),
            "sqdist": pd.Series(dtype=np.float64),
            "alat": pd.Series(dtype=np.float64),
            "alon": pd.Series(dtype=np.float64),
            "blat": pd.Series(dtype=np.float64),
            "blon": pd.Series(dtype=np.float64),
        }
    )


def cell_join_counts(pages, res: int):
    """Simple point-in-cell aggregation: pages per cell (tiling report)."""
    return page_cell_counts(assign_cells(pages, res))
