"""Distributed components / simplify / discretize vs reference goldens
and the sequential oracle."""

import numpy as np
import pandas as pd
import pytest

from ophois_ray import components, discretize, graphio, graphops
from ophois_ray.oracle import OracleGraph
from tests.conftest import load_fixture_text

pytestmark = pytest.mark.usefixtures("ray_session")


def tables_from(name: str):
    text = load_fixture_text(name)
    nodes, edges = graphio.graph_from_text(text)
    return (
        graphops.dedup_nodes(nodes).materialize(),
        graphops.dedup_edges(edges).materialize(),
    )


def graph_counts(nodes, edges):
    return nodes.count(), edges.count()


def degrees_from_tables(nodes, edges) -> dict:
    deg = {r["id"]: int(r["degree"]) for r in graphops.node_degrees(edges).iter_rows()}
    for r in nodes.select_columns(["id"]).iter_rows():
        deg.setdefault(r["id"], 0)
    return deg


def test_largest_component_local():  # heuristics.rs:174-204
    nodes, edges = tables_from("test_bfs.graph")
    n2, e2 = components.largest_component(nodes, edges, method="local")
    assert graph_counts(n2, e2) == (18, 20)
    oracle = OracleGraph.from_text(load_fixture_text("test_bfs.graph")).bfs_largest_component()
    assert degrees_from_tables(n2.materialize(), e2.materialize()) == {
        n: oracle.degree(n) for n in oracle.coords
    }


def test_labelprop_matches_local_small():
    # small-diameter graph: labelprop converges in a few rounds (each
    # round is a distributed join+groupby — diameter-bound, so the test
    # graph is chosen for depth, not size)
    text = "\n".join(
        [
            "a␟48.0␟2.0", "b␟48.1␟2.0", "c␟48.2␟2.0", "d␟48.3␟2.0",
            "e␟50.0␟3.0", "f␟50.1␟3.0",
            "a␟b", "b␟c", "a␟c", "c␟d", "e␟f",
        ]
    )
    nodes, edges = graphio.graph_from_text(text)
    nodes = graphops.dedup_nodes(nodes).materialize()
    edges = graphops.dedup_edges(edges).materialize()
    labels = components.connected_components_labelprop(nodes, edges, num_buckets=4)
    got = {r["id"]: r["comp"] for r in labels.iter_rows()}
    assert got == components.connected_components_local(nodes, edges)
    n2, e2 = components.largest_component(nodes, edges, method="labelprop")
    assert graph_counts(n2, e2) == (4, 4)


def test_contract_components_matches_oracle_chain():
    # cailles: H3 alone gives 14/17 (heuristics.rs:228), then the full
    # chain at delta=10 runs H4 (-> 9/12) and H6. Compare the distributed
    # contraction to the oracle running the same chain.
    nodes, edges = tables_from("cailles.graph")
    n2, e2 = components.contract_components(nodes, edges, 10.0)
    oracle = OracleGraph.from_text(load_fixture_text("cailles.graph"))
    oracle.remove_degree_two_nodes()
    oracle.remove_under_delta_nodes(10.0)
    oracle.remove_under_delta_links(10.0)
    assert graph_counts(n2, e2) == (oracle.n_nodes(), oracle.n_edges())
    assert degrees_from_tables(n2.materialize(), e2.materialize()) == {
        n: oracle.degree(n) for n in oracle.coords
    }


def test_simplify_full_composition():
    # full reference simplify (main.rs:66-74) on the bfs fixture
    nodes, edges = tables_from("test_bfs.graph")
    n2, e2 = components.simplify(nodes, edges, 10.0)
    oracle = OracleGraph.from_text(load_fixture_text("test_bfs.graph")).simplify(10.0)
    assert graph_counts(n2, e2) == (oracle.n_nodes(), oracle.n_edges())
    assert degrees_from_tables(n2.materialize(), e2.materialize()) == {
        n: oracle.degree(n) for n in oracle.coords
    }


def test_contract_parallel_components_independent():
    # two disjoint triangles with a pendant chain each: contraction must
    # not leak across components
    text = "\n".join(
        [
            "a␟48.0␟2.0", "b␟48.0001␟2.0", "c␟48.0␟2.0001", "d␟48.001␟2.001",
            "e␟50.0␟3.0", "f␟50.0001␟3.0", "g␟50.0␟3.0001", "h␟50.001␟3.001",
            "a␟b", "b␟c", "a␟c", "c␟d",
            "e␟f", "f␟g", "e␟g", "g␟h",
        ]
    )
    nodes, edges = graphio.graph_from_text(text)
    nodes = graphops.dedup_nodes(nodes).materialize()
    edges = graphops.dedup_edges(edges).materialize()
    n2, e2 = components.contract_components(nodes, edges, 0.5)
    oracle = OracleGraph.from_text(text)
    oracle.remove_degree_two_nodes()
    oracle.remove_under_delta_nodes(0.5)
    oracle.remove_under_delta_links(0.5)
    assert graph_counts(n2, e2) == (oracle.n_nodes(), oracle.n_edges())


def test_discretize_golden():  # discretize.rs:54-104
    from tests.test_oracle import DISCRETIZE_EXPECTED

    nodes, edges = tables_from("test_discretize.graph")
    n2, e2 = discretize.discretize(nodes, edges, 6.0)
    n2, e2 = n2.materialize(), e2.materialize()
    assert graph_counts(n2, e2) == (35, 36)
    assert degrees_from_tables(n2, e2) == DISCRETIZE_EXPECTED


def test_discretize_coords_match_oracle_bitwise():
    nodes, edges = tables_from("test_discretize.graph")
    n2, _ = discretize.discretize(nodes, edges, 6.0)
    got = {r["id"]: (r["lat_str"], r["lon_str"]) for r in n2.iter_rows()}
    oracle = OracleGraph.from_text(load_fixture_text("test_discretize.graph"))
    oracle.discretize(6.0)
    assert got == dict(oracle.coords)


def test_discretize_noop_below_delta():
    nodes, edges = tables_from("test_discretize.graph")
    n2, e2 = discretize.discretize(nodes, edges, 1e6)
    assert graph_counts(n2, e2) == (7, 8)
