"""Single-process reference-parity graph kernels (the test oracle).

Pure-Python transcription of the reference's whole-graph semantics
(/root/reference/src/graph.rs, heuristics.rs, discretize.rs,
metrics.rs), with one documented divergence: wherever the reference
iterates HashMap order or a thread_rng shuffle (heuristics.rs:95,147),
this kernel uses a pinned deterministic order (sorted node ids;
(length, u, v) for links). The reference's own tests only assert
order-invariant properties (exact node/edge counts, per-node degrees,
generated ids — see heuristics.rs:174-313), which this kernel
reproduces exactly.

This module is intentionally sequential: it is (a) the correctness
oracle for the distributed operators and (b) the per-component worker
run inside ``groupby(component).map_groups`` by the distributed
simplify (SURVEY.md §7.4) — a city street graph's component fits
comfortably in one task while thousands of components parallelize.
"""

from __future__ import annotations

import math
from collections import Counter, deque

from .geo import EARTH_RADIUS_M, determinist, float_repr

DEFAULT_SEPARATOR = "␟"  # '␟' U+241F (reference main.rs:36-37)


def haversine_scalar(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    """Scalar haversine, metres (reference src/geo.rs:7-17).

    Delegates to the vectorized numpy kernel so the oracle and the
    distributed engine are bit-identical. Note: ``np.arctan2`` may
    differ from libm ``atan2`` (and therefore Rust) by 1 ulp; every
    reference golden consumes distances through truncation or a delta
    threshold, where 1 ulp is immaterial.
    """
    from . import geo as _geo

    return float(_geo.haversine_m(lat1, lon1, lat2, lon2))


class OracleGraph:
    """Mutable undirected graph: node ids + verbatim coordinate strings.

    Mirrors reference ``Graph`` (src/graph.rs:34-38): nodes carry
    (lat_str, lon_str); every logical edge is stored as both directed
    arcs; degree(v) = number of arcs out of v. The adjacency-index
    bookkeeping of the reference (graph.rs:146-167) has no semantic
    content and is not reproduced.
    """

    def __init__(self) -> None:
        self.coords: dict[str, tuple[str, str]] = {}  # id -> (lat_str, lon_str)
        self.adj: dict[str, list[str]] = {}  # id -> neighbour ids (insertion order)
        self.links: set[tuple[str, str]] = set()  # directed arcs, both orientations

    # ---------------------------------------------------------- construction
    @classmethod
    def from_lines(
        cls, lines, separator: str = DEFAULT_SEPARATOR, dedup: bool = True
    ) -> "OracleGraph":
        """Parse .graph lines (reference Graph::load, src/graph.rs:74-102).

        3 fields => node (first-wins on duplicate id when ``dedup``),
        2 fields => undirected link (first-wins over both orientations),
        other arity => ValueError (reference panics, graph.rs:98).
        ``dedup=False`` matches the test helper Graph::_from
        (graph.rs:48-72) which skips both guards.
        """
        g = cls()
        for line in lines:
            if not line:
                continue
            parts = line.split(separator)
            if len(parts) == 3:
                if dedup and parts[0] in g.coords:
                    continue
                g.insert_node(parts[0], parts[1], parts[2])
            elif len(parts) == 2:
                u, v = parts
                if dedup and ((u, v) in g.links or (v, u) in g.links):
                    continue
                g.insert_arc(u, v)
                g.insert_arc(v, u)
            else:
                raise ValueError(f"wrong .graph arity {len(parts)}: {line!r}")
        return g

    @classmethod
    def from_text(cls, text: str, separator: str = DEFAULT_SEPARATOR, dedup: bool = True):
        return cls.from_lines(text.splitlines(), separator, dedup)

    # --------------------------------------------------------------- basics
    def insert_node(self, node_id: str, lat_str: str, lon_str: str) -> None:
        """First-wins insert (reference entry().or_insert, graph.rs:124)."""
        if node_id not in self.coords:
            self.coords[node_id] = (lat_str, lon_str)
            self.adj[node_id] = []

    def insert_arc(self, u: str, v: str) -> None:
        """Insert one directed arc (reference insert_link, graph.rs:146-152)."""
        self.adj.setdefault(u, []).append(v)
        self.links.add((u, v))

    def insert_edge(self, u: str, v: str) -> None:
        self.insert_arc(u, v)
        self.insert_arc(v, u)

    def contains_link(self, u: str, v: str) -> bool:
        return (u, v) in self.links

    def remove_arc(self, u: str, v: str) -> None:
        self.links.discard((u, v))
        if u in self.adj:
            try:
                self.adj[u].remove(v)
            except ValueError:
                pass

    def remove_node(self, node_id: str) -> None:
        """Remove node and every incident arc (graph.rs:127-136)."""
        for nb in list(self.adj.get(node_id, [])):
            self.remove_arc(node_id, nb)
            self.remove_arc(nb, node_id)
        self.adj.pop(node_id, None)
        self.coords.pop(node_id, None)

    def degree(self, node_id: str) -> int:
        return len(self.adj[node_id])

    def point(self, node_id: str) -> tuple[float, float]:
        lat_str, lon_str = self.coords[node_id]
        return float(lat_str), float(lon_str)

    def edge_length(self, u: str, v: str) -> float:
        la1, lo1 = self.point(u)
        la2, lo2 = self.point(v)
        return haversine_scalar(la1, lo1, la2, lo2)

    def n_nodes(self) -> int:
        return len(self.coords)

    def n_edges(self) -> int:
        """Logical undirected edge count = arcs/2 (metrics.rs:56)."""
        return len(self.links) // 2

    def undirected_edges(self) -> list[tuple[str, str]]:
        """Canonical (u < v) undirected edge list, sorted."""
        return sorted({determinist(u, v) for (u, v) in self.links})

    # ------------------------------------------------------------ heuristics
    def bfs_largest_component(self) -> "OracleGraph":
        """Keep only the largest connected component (heuristics.rs:10-58).

        Iterates seeds in sorted id order (reference: HashMap order);
        ties on size go to the first-encountered component, i.e. the one
        with the smallest seed id here.
        """
        visited: set[str] = set()
        best_nodes: list[str] = []
        for seed in sorted(self.coords):
            if seed in visited:
                continue
            comp = []
            queue = deque([seed])
            visited.add(seed)
            while queue:
                node = queue.popleft()
                comp.append(node)
                for nb in self.adj[node]:
                    if nb not in visited:
                        visited.add(nb)
                        queue.append(nb)
            if len(comp) > len(best_nodes):
                best_nodes = comp
        keep = set(best_nodes)
        out = OracleGraph()
        for node_id in sorted(keep):
            lat_str, lon_str = self.coords[node_id]
            out.insert_node(node_id, lat_str, lon_str)
        for node_id in sorted(keep):
            for nb in self.adj[node_id]:
                if nb in keep:
                    out.insert_arc(node_id, nb)  # each directed arc exactly once
        return out

    def replace_node_by_links(self, node_id: str) -> None:
        """Remove node; clique its former neighbours (heuristics.rs:60-78)."""
        neighbours = list(self.adj[node_id])
        self.remove_node(node_id)
        for i in range(len(neighbours)):
            for j in range(i + 1, len(neighbours)):
                a, b = neighbours[i], neighbours[j]
                if (a, b) not in self.links and (b, a) not in self.links:
                    self.insert_edge(a, b)

    def remove_degree_two_nodes(self) -> None:
        """One pass over the degree-2 snapshot (heuristics.rs:80-91).

        Snapshot in sorted order (reference: HashMap order); chains
        contract fully within the pass, nodes that *become* degree 2
        are kept — exactly the reference's single-snapshot semantics.
        """
        snapshot = sorted(n for n in self.coords if self.degree(n) == 2)
        for node_id in snapshot:
            self.replace_node_by_links(node_id)

    def remove_under_delta_nodes(self, delta: float) -> None:
        """Remove nodes whose incident links are ALL <= delta metres
        (heuristics.rs:93-112; removal cancelled only by a link > delta,
        so isolated nodes are removed). Sorted order replaces the
        reference's thread_rng shuffle (heuristics.rs:95)."""
        for node_id in sorted(self.coords):
            remove = True
            for nb in self.adj[node_id]:
                if self.edge_length(node_id, nb) > delta:
                    remove = False
                    break
            if remove:
                self.replace_node_by_links(node_id)

    def replace_link_by_node(self, u: str, v: str) -> str:
        """Contract edge (u,v) into one merged node (heuristics.rs:114-141).

        New id = "{min}-{max}"; coords = planar midpoint formatted with
        shortest-round-trip repr (== Rust f64::to_string, SURVEY.md §1.3);
        neighbours = sorted-deduped union minus the endpoints.
        Returns the new node id.
        """
        src_nbs = list(self.adj[u])
        tgt_nbs = list(self.adj[v])
        la1, lo1 = self.point(u)
        la2, lo2 = self.point(v)
        self.remove_node(u)
        self.remove_node(v)
        neighbours = sorted(set(src_nbs) | set(tgt_nbs) - {u, v})
        neighbours = [n for n in neighbours if n != u and n != v]
        a, b = determinist(u, v)
        new_id = f"{a}-{b}"
        mid_lat = (la1 + la2) / 2.0
        mid_lon = (lo1 + lo2) / 2.0
        self.insert_node(new_id, float_repr(mid_lat), float_repr(mid_lon))
        for nb in neighbours:
            self.insert_edge(new_id, nb)
        return new_id

    def remove_under_delta_links(self, delta: float) -> None:
        """Fixpoint: contract links shorter than delta (heuristics.rs:143-169).

        Each round processes the still-alive links sorted by
        (length, u, v) — shortest-first canonical order replacing the
        reference's shuffle (heuristics.rs:147) — with a stale-entry
        guard, until a full scan finds no link < delta.
        """
        while True:
            ranked = sorted(
                ((self.edge_length(u, v), u, v) for (u, v) in self.undirected_edges()),
            )
            for _, u, v in ranked:
                if (u, v) in self.links and (v, u) in self.links:
                    if self.edge_length(u, v) < delta:
                        self.replace_link_by_node(u, v)
            if not any(self.edge_length(u, v) < delta for (u, v) in self.undirected_edges()):
                return

    def simplify(self, delta: float) -> "OracleGraph":
        """Full simplify composition (reference main.rs:66-74)."""
        g = self.bfs_largest_component()
        g.remove_degree_two_nodes()
        g.remove_under_delta_nodes(delta)
        g.remove_under_delta_links(delta)
        return g

    # ------------------------------------------------------------ discretize
    def discretize(self, delta: float) -> None:
        """Split links longer than delta into sub-delta chains
        (reference src/discretize.rs:5-52). ``part = trunc(len/delta)``;
        links with part > 1 are replaced by part-1 interpolated nodes
        ids "{a}-{b}:{i}/{part}" ((a,b) = determinist pair) chained
        u—n1—…—v. Canonical direction: interpolate from min-id to
        max-id endpoint (the reference direction depends on HashMap
        order; its tests assert only ids/degrees, which are
        direction-invariant)."""
        for u, v in self.undirected_edges():
            if not ((u, v) in self.links and (v, u) in self.links):
                continue
            la1, lo1 = self.point(u)
            la2, lo2 = self.point(v)
            dist = haversine_scalar(la1, lo1, la2, lo2)
            part = int(dist / delta)
            if part <= 1:
                continue
            self.remove_arc(u, v)
            self.remove_arc(v, u)
            chain = [u]
            for i in range(1, part):
                t = i / part
                lat = la1 + t * (la2 - la1)
                lon = lo1 + t * (lo2 - lo1)
                nid = f"{u}-{v}:{i}/{part}"
                self.insert_node(nid, float_repr(lat), float_repr(lon))
                chain.append(nid)
            chain.append(v)
            for a, b in zip(chain, chain[1:]):
                self.insert_edge(a, b)

    # --------------------------------------------------------------- metrics
    def degrees_distribution(self) -> Counter:
        """degree -> node count (reference metrics.rs:26-33)."""
        return Counter(len(self.adj[n]) for n in self.coords)

    def lengths_distribution(self) -> Counter:
        """trunc(haversine metres) -> edge count (metrics.rs:35-53)."""
        return Counter(int(self.edge_length(u, v)) for (u, v) in self.undirected_edges())

    def order_size(self) -> str:
        """"{nodes} {edges}" (metrics.rs:55-57)."""
        return f"{self.n_nodes()} {self.n_edges()}"

    # ------------------------------------------------------------------- io
    def show_lines(self, separator: str = DEFAULT_SEPARATOR) -> list[str]:
        """Serialize to .graph lines (reference Graph::show, graph.rs:104-121)
        in sorted deterministic order (reference order is HashMap-random;
        comparisons are set-semantic)."""
        out = [
            f"{n}{separator}{self.coords[n][0]}{separator}{self.coords[n][1]}"
            for n in sorted(self.coords)
        ]
        out.extend(f"{u}{separator}{v}" for (u, v) in self.undirected_edges())
        return out


def sort_and_stringify(dist: Counter) -> str:
    """Histogram -> "bucket count\\n" lines sorted by bucket (metrics.rs:59-67)."""
    return "".join(f"{k} {v}\n" for k, v in sorted(dist.items()))
