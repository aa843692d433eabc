"""Connected components + largest-component filter (reference H1,
src/heuristics.rs:10-58) and per-component distributed simplify
(H2-H6, heuristics.rs:60-169) — SURVEY.md §7.4 two-level design.

Two component strategies:

- ``method="local"``: stream the (deduped, canonical) edge list to the
  driver and union-find it. A city street graph is ~1e6 edges ≈ tens of
  MB — trivially driver-sized. Guarded by ``cap``; the default for the
  reference-parity pipelines.
- ``method="labelprop"``: distributed hash-min label propagation — each
  round joins arc messages to current labels and takes the per-node min;
  converges in O(graph diameter) rounds, every round one bucketed hash
  join + one groupby. The unbounded-scale path; same results, tested on
  the same fixtures.

Contraction heuristics run **per component** inside
``groupby(comp).map_groups`` using the sequential oracle kernel — a
component fits one task while thousands of components (cities, tiles)
parallelize across the cluster. This is not a port of the reference's
single-heap loop: the dataflow shape is groupby/map_groups; the kernel
is the same algorithm the reference runs, pinned to deterministic order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data.aggregate import Count, Min

from .joins import BroadcastIndex, hash_join, stable_hash
from .oracle import OracleGraph

DEFAULT_LOCAL_CAP = 50_000_000  # edges


class _UnionFind:
    __slots__ = ("parent",)

    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent
        root = x
        while p.get(root, root) != root:
            root = p[root]
        while p.get(x, x) != root:
            p[x], x = root, p[x]
        return root

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # min-root keeps labels deterministic (smallest id wins)
            if ra < rb:
                self.parent[rb] = ra
            else:
                self.parent[ra] = rb


def connected_components_local(nodes, edges, cap: int = DEFAULT_LOCAL_CAP) -> dict[str, str]:
    """id -> component label (smallest node id in the component).

    Streams edge batches to the driver (never materializes node payloads)
    and union-finds them; isolated nodes get their own label.
    """
    uf = _UnionFind()
    seen = 0
    for batch in edges.select_columns(["u", "v"]).iter_batches(batch_format="numpy"):
        u_arr = batch["u"]
        v_arr = batch["v"]
        seen += len(u_arr)
        if seen > cap:
            raise ValueError(
                f"edge count exceeds local cap {cap}; use method='labelprop'"
            )
        for u, v in zip(u_arr, v_arr):
            uf.union(u, v)
    labels = {}
    for batch in nodes.select_columns(["id"]).iter_batches(batch_format="numpy"):
        for node_id in batch["id"]:
            labels[node_id] = uf.find(node_id)
    return labels


def connected_components_labelprop(nodes, edges, max_rounds: int = 50, num_buckets: int = 64):
    """Distributed hash-min label propagation -> Dataset (id, comp).

    Round: every arc forwards its source's current label to its target;
    new label = min(own, incoming). Convergence detected via a
    deterministic signature (sum of hash(id||label)); street graphs
    converge in tens of rounds (diameter-bound).
    """
    labels = nodes.select_columns(["id"]).map_batches(
        lambda df: pd.DataFrame({"id": df["id"], "comp": df["id"]}),
        batch_format="pandas",
    ).materialize()

    def arcs_of(e):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "src": np.concatenate([df["u"].to_numpy(object), df["v"].to_numpy(object)]),
                    "dst": np.concatenate([df["v"].to_numpy(object), df["u"].to_numpy(object)]),
                }
            )
        return e.map_batches(fn, batch_format="pandas")

    arcs = arcs_of(edges.select_columns(["u", "v"])).materialize()

    def signature(lbl) -> int:
        def h(df: pd.DataFrame) -> pd.DataFrame:
            vals = stable_hash(
                (df["id"].astype(str) + "\x00" + df["comp"].astype(str)).to_numpy(object)
            )
            return pd.DataFrame(
                {"sig": np.array([np.bitwise_xor.reduce(vals)], dtype=np.uint64)}
            )

        parts = lbl.map_batches(h, batch_format="pandas").to_pandas()
        if not len(parts):
            return 0
        return int(np.bitwise_xor.reduce(parts["sig"].to_numpy().astype(np.uint64)))

    sig = signature(labels)
    for _ in range(max_rounds):
        # arc messages: label of src forwarded to dst
        msgs = hash_join(
            arcs,
            labels.map_batches(
                lambda df: df.rename(columns={"id": "src"}), batch_format="pandas"
            ),
            "src",
            num_buckets=num_buckets,
        ).map_batches(
            lambda df: pd.DataFrame({"id": df["dst"], "comp": df["comp"]}),
            batch_format="pandas",
        )
        from .joins import grouped_apply

        new_labels = grouped_apply(
            labels.union(msgs),
            "id",
            lambda df: df.groupby("id", as_index=False)["comp"].min(),
            num_buckets=num_buckets,
        ).materialize()
        new_sig = signature(new_labels)
        labels = new_labels
        if new_sig == sig:
            break
        sig = new_sig
    return labels


def largest_component(nodes, edges, *, method: str = "local", cap: int = DEFAULT_LOCAL_CAP):
    """H1: filter (nodes, edges) to the largest connected component
    (reference heuristics.rs:10-58; ties -> smallest component label,
    matching the oracle's sorted-seed first-encounter rule).

    Membership filtering broadcasts the winning id set (city-scale);
    at unbounded scale swap the final filter for a hash_join semi-join.
    """
    if method == "local":
        labels = connected_components_local(nodes, edges, cap=cap)
        if not labels:
            return nodes, edges
        counts: dict[str, int] = {}
        for comp in labels.values():
            counts[comp] = counts.get(comp, 0) + 1
        # deterministic tie-break: max count, then smallest label
        best_count = max(counts.values())
        best = min(c for c, n in counts.items() if n == best_count)
        member_ids = np.array(sorted(k for k, v in labels.items() if v == best), dtype=object)
    else:
        labels_ds = connected_components_labelprop(nodes, edges, num_buckets=8)
        hist = labels_ds.groupby("comp").aggregate(Count(alias_name="n")).to_pandas()
        best_count = hist["n"].max()
        best = hist[hist["n"] == best_count]["comp"].min()
        member_ids = np.sort(
            labels_ds.map_batches(
                lambda df, b=best: df[df["comp"] == b][["id"]], batch_format="pandas"
            ).to_pandas()["id"].to_numpy(object)
        )

    import ray

    idx_ref = ray.put(BroadcastIndex(member_ids, {}))

    def filter_nodes(df: pd.DataFrame) -> pd.DataFrame:
        idx = _get(idx_ref)
        return df[idx.contains(df["id"].to_numpy(object))]

    def filter_edges(df: pd.DataFrame) -> pd.DataFrame:
        idx = _get(idx_ref)
        return df[idx.contains(df["u"].to_numpy(object))]

    return (
        nodes.map_batches(filter_nodes, batch_format="pandas"),
        edges.map_batches(filter_edges, batch_format="pandas"),
    )


def _get(ref):
    import ray

    return ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref


# ------------------------------------------------- per-component contraction

_NODE_KIND, _EDGE_KIND = 0, 1


def _tag_for_group(nodes_l, edges_l):
    """Union node rows and edge rows into one schema for co-grouping."""
    def node_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "comp": df["comp"],
                "kind": _NODE_KIND,
                "a": df["id"],
                "b": df["lat_str"],
                "c": df["lon_str"],
            }
        )

    def edge_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "comp": df["comp"],
                "kind": _EDGE_KIND,
                "a": df["u"],
                "b": df["v"],
                "c": "",
            }
        )

    return nodes_l.map_batches(node_rows, batch_format="pandas").union(
        edges_l.map_batches(edge_rows, batch_format="pandas")
    )


def contract_components(nodes, edges, delta: float, *, cap: int = DEFAULT_LOCAL_CAP):
    """Run the contraction chain H3 -> H4 -> H6 (remove_degree_two_nodes,
    remove_under_delta_nodes, remove_under_delta_links — reference
    main.rs:68-71 minus H1) independently on every connected component,
    in parallel, via groupby(comp).map_groups with the oracle kernel.

    Returns (nodes_out, edges_out) Datasets. Contraction never crosses a
    component boundary (all rewrites stay inside one component), so the
    parallelism is exact, not approximate.
    """
    labels = connected_components_local(nodes, edges, cap=cap)
    import ray

    label_idx = ray.put(
        BroadcastIndex(
            np.array(list(labels.keys()), dtype=object),
            {"comp": np.array(list(labels.values()), dtype=object)},
        )
    )

    def attach_node(df: pd.DataFrame) -> pd.DataFrame:
        idx = _get(label_idx)
        df = df.copy()
        df["comp"] = idx.lookup(df["id"].to_numpy(object), "comp")
        return df

    def attach_edge(df: pd.DataFrame) -> pd.DataFrame:
        idx = _get(label_idx)
        df = df.copy()
        df["comp"] = idx.lookup(df["u"].to_numpy(object), "comp")
        return df

    nodes_l = nodes.map_batches(attach_node, batch_format="pandas")
    edges_l = edges.map_batches(attach_edge, batch_format="pandas")

    tagged = _tag_for_group(nodes_l, edges_l)

    def contract(group: pd.DataFrame) -> pd.DataFrame:
        g = OracleGraph()
        nrows = group[group["kind"] == _NODE_KIND]
        erows = group[group["kind"] == _EDGE_KIND]
        for a, b, c in zip(nrows["a"], nrows["b"], nrows["c"]):
            g.insert_node(a, b, c)
        for a, b in zip(erows["a"], erows["b"]):
            g.insert_edge(a, b)
        g.remove_degree_two_nodes()
        g.remove_under_delta_nodes(delta)
        g.remove_under_delta_links(delta)
        comp = group["comp"].iloc[0]
        out_nodes = [
            (comp, _NODE_KIND, n, g.coords[n][0], g.coords[n][1]) for n in sorted(g.coords)
        ]
        out_edges = [(comp, _EDGE_KIND, u, v, "") for (u, v) in g.undirected_edges()]
        return pd.DataFrame(
            out_nodes + out_edges, columns=["comp", "kind", "a", "b", "c"]
        )

    # contraction output is a small fraction of the input; materialize so
    # the two kind-filters below don't re-run the shuffle twice.
    result = tagged.groupby("comp").map_groups(contract, batch_format="pandas").materialize()

    nodes_out = result.map_batches(
        lambda df: pd.DataFrame(
            {
                "id": df[df["kind"] == _NODE_KIND]["a"],
                "lat_str": df[df["kind"] == _NODE_KIND]["b"],
                "lon_str": df[df["kind"] == _NODE_KIND]["c"],
            }
        ).assign(
            lat=lambda d: d["lat_str"].astype(np.float64),
            lon=lambda d: d["lon_str"].astype(np.float64),
        ),
        batch_format="pandas",
    )
    edges_out = result.map_batches(
        lambda df: pd.DataFrame(
            {
                "u": df[df["kind"] == _EDGE_KIND]["a"],
                "v": df[df["kind"] == _EDGE_KIND]["b"],
            }
        ),
        batch_format="pandas",
    )
    return nodes_out, edges_out


def simplify(nodes, edges, delta: float, *, method: str = "local"):
    """Full reference `simplify` composition (main.rs:66-74):
    largest component -> degree-2 contraction -> under-delta node removal
    -> under-delta link contraction. Metrics are the caller's concern
    (graphops.emit_metrics), matching the reference's order where metrics
    run after the rewrites."""
    n1, e1 = largest_component(nodes, edges, method=method)
    return contract_components(n1, e1, delta)
