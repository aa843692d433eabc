"""Randomized oracle-vs-distributed parity (SURVEY.md §5 item 2):
seeded random street-like graphs pushed through both the sequential
oracle kernel and the distributed operators must agree exactly."""

import numpy as np
import pytest

from ophois_ray import components, discretize, graphio, graphops
from ophois_ray.oracle import OracleGraph

pytestmark = pytest.mark.usefixtures("ray_session")


def random_graph_text(seed: int, n: int = 60, extra_edges: int = 20) -> str:
    """Connected-ish random geometric graph with a couple of islands."""
    rng = np.random.RandomState(seed)
    lines = []
    lat0, lon0 = 48.85, 2.35
    pts = []
    for i in range(n):
        la = lat0 + rng.uniform(-0.003, 0.003)
        lo = lon0 + rng.uniform(-0.004, 0.004)
        pts.append((la, lo))
        lines.append(f"{1000 + i}␟{la:.7f}␟{lo:.7f}")
    # chain backbone + random chords (duplicates + both orientations mixed in)
    for i in range(n - 1):
        lines.append(f"{1000 + i}␟{1000 + i + 1}")
    for _ in range(extra_edges):
        a, b = rng.randint(0, n, 2)
        if a != b:
            lines.append(f"{1000 + a}␟{1000 + b}")
    # island
    for j in range(3):
        lines.append(f"{2000 + j}␟{lat0 + 1 + j * 1e-4:.7f}␟{lon0 + 1:.7f}")
    lines.append("2000␟2001")
    lines.append("2001␟2002")
    return "\n".join(lines)


def build_tables(text: str):
    nodes, edges = graphio.graph_from_text(text)
    return (
        graphops.dedup_nodes(nodes).materialize(),
        graphops.dedup_edges(edges).materialize(),
    )


def oracle_of(text: str) -> OracleGraph:
    return OracleGraph.from_text(text, dedup=True)


def degrees_from_tables(nodes, edges) -> dict:
    deg = {r["id"]: int(r["degree"]) for r in graphops.node_degrees(edges).iter_rows()}
    for r in nodes.select_columns(["id"]).iter_rows():
        deg.setdefault(r["id"], 0)
    return deg


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_simplify_parity_random(seed):
    text = random_graph_text(seed)
    nodes, edges = build_tables(text)
    n2, e2 = components.simplify(nodes, edges, 25.0)
    n2, e2 = n2.materialize(), e2.materialize()
    g = oracle_of(text).simplify(25.0)
    assert n2.count() == g.n_nodes()
    assert e2.count() == g.n_edges()
    assert degrees_from_tables(n2, e2) == {n: g.degree(n) for n in g.coords}


@pytest.mark.parametrize("seed", [3, 11])
def test_discretize_parity_random(seed):
    text = random_graph_text(seed, n=30, extra_edges=8)
    nodes, edges = build_tables(text)
    n2, e2 = discretize.discretize(nodes, edges, 15.0)
    n2, e2 = n2.materialize(), e2.materialize()
    g = oracle_of(text)
    g.discretize(15.0)
    assert n2.count() == g.n_nodes()
    assert e2.count() == g.n_edges()
    got = {r["id"]: (r["lat_str"], r["lon_str"]) for r in n2.iter_rows()}
    assert got == dict(g.coords)  # byte-identical coordinate strings


@pytest.mark.parametrize("seed", [5])
def test_metrics_parity_random(seed):
    text = random_graph_text(seed)
    nodes, edges = build_tables(text)
    g = oracle_of(text)
    assert graphops.order_size(nodes, edges) == g.order_size()
    assert graphops.degree_histogram(nodes, edges) == dict(g.degrees_distribution())
    assert graphops.length_histogram(edges, nodes) == dict(g.lengths_distribution())
