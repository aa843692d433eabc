"""Golden-parity tests for the single-process oracle kernels.

Every expected constant is ported from the reference's inline tests:
/root/reference/src/heuristics.rs:174-313, discretize.rs:54-104,
metrics.rs:77-130, geo.rs:33-93. Fixture inputs are the reference's
datasets/*.graph files (same literal graphs as the inline strings).
"""

import numpy as np
import pytest

from ophois_ray import geo
from ophois_ray.oracle import OracleGraph, sort_and_stringify
from tests.conftest import load_fixture_text


def load(name: str, dedup: bool = False) -> OracleGraph:
    return OracleGraph.from_text(load_fixture_text(name), dedup=dedup)


def degrees_of(g: OracleGraph) -> dict:
    return {n: g.degree(n) for n in g.coords}


# ---------------------------------------------------------------- geometry


def test_haversine_golden():
    # BASELINE.md: libm/Rust gives 12.756989639337817 for this pair
    # (3758221295 -> 3761637488); np.arctan2 is 1 ulp lower. The engine
    # pins the numpy value — all reference goldens consume distances via
    # truncation / delta thresholds where 1 ulp never matters.
    d = float(geo.haversine_m(48.8275185, 2.3484976, 48.8275416, 2.3486683))
    assert d == 12.756989639337814
    assert abs(d - 12.756989639337817) < 1e-11


def test_midpoint_golden():  # geo.rs:37-54
    lat, lon = geo.midpoint(48.8275185, 2.3484976, 48.8275416, 2.3486683)
    assert (float(lon), float(lat)) == (2.34858295, 48.82753005)
    l2 = geo.lerp(48.8275185, 2.3484976, 48.8275416, 2.3486683, 0.5)
    assert (float(l2[0]), float(l2[1])) == (float(lat), float(lon))


def test_lerp_golden():  # geo.rs:56-93
    lat, lon = geo.lerp(1.0, -4.0, 7.0, 8.0, 1.0 / 3.0)
    assert (float(lon), float(lat)) == (0.0, 3.0)
    lat, lon = geo.lerp(1.0, -4.0, 7.0, 8.0, 2.0 / 3.0)
    assert (float(lon), float(lat)) == (4.0, 5.0)
    lat, lon = geo.lerp(48.8275185, 2.3484976, 48.8275416, 2.3486683, 1.0 / 3.0)
    assert (float(lon), float(lat)) == (2.3485545, 48.8275262)
    lat, lon = geo.lerp(48.8275185, 2.3484976, 48.8275416, 2.3486683, 2.0 / 3.0)
    assert (float(lon), float(lat)) == (2.3486114, 48.8275339)


def test_float_repr_matches_rust_f64_to_string():  # SURVEY.md §1.3
    assert geo.float_repr((48.8274242 + 48.8274352) / 2) == "48.827429699999996"
    assert geo.float_repr((2.3486471 + 2.348721) / 2) == "2.34868405"
    assert geo.float_repr(5.0) == "5"


def test_haversine_vectorized_matches_scalar():
    rng = np.random.RandomState(7)
    lat1, lon1 = rng.uniform(-80, 80, 50), rng.uniform(-179, 179, 50)
    lat2, lon2 = lat1 + rng.uniform(-0.01, 0.01, 50), lon1 + rng.uniform(-0.01, 0.01, 50)
    from ophois_ray.oracle import haversine_scalar

    vec = geo.haversine_m(lat1, lon1, lat2, lon2)
    for i in range(50):
        assert vec[i] == haversine_scalar(lat1[i], lon1[i], lat2[i], lon2[i])


# ---------------------------------------------------------------- heuristics


def test_bfs_largest_component():  # heuristics.rs:174-204
    g = load("test_bfs.graph").bfs_largest_component()
    assert g.n_nodes() == 18
    assert g.n_edges() == 20
    expected = {
        "3758221295": 1, "3761637488": 2, "3761637489": 4, "2268836829": 1,
        "3761637490": 2, "3758221301": 1, "3761637486": 4, "2576426856": 2,
        "2576426855": 2, "3761637482": 4, "2576426850": 2, "3758221292": 2,
        "2576426853": 3, "2576426851": 2, "2576426852": 2, "2576426854": 2,
        "2576426858": 2, "2576426859": 2,
    }
    assert degrees_of(g) == expected


def test_replace_node_by_links():  # heuristics.rs:206-222
    g = load("test_replace_node_by_links.graph")
    g.replace_node_by_links("3761637489")
    assert g.n_nodes() == 4
    assert g.n_edges() == 6
    assert degrees_of(g) == {
        "3761637488": 3, "3761637486": 3, "3761637490": 3, "2268836829": 3
    }


def test_remove_degree_two_nodes():  # heuristics.rs:224-250 (cailles graph)
    g = load("cailles.graph")
    g.remove_degree_two_nodes()
    assert g.n_nodes() == 14
    assert g.n_edges() == 17
    expected = {
        "1852590201": 1, "92192237": 3, "3761637489": 4, "2268836829": 1,
        "3761637486": 3, "3761637482": 3, "2576426853": 3, "2576426850": 3,
        "3758221292": 3, "1829061614": 4, "3758221284": 1, "2576426847": 1,
        "1829061602": 3, "3761637496": 1,
    }
    assert degrees_of(g) == expected


def test_remove_under_delta_nodes():  # heuristics.rs:252-273
    g = load("test_remove_under_delta_nodes.graph")
    g.remove_under_delta_nodes(10.0)
    assert g.n_nodes() == 9
    assert g.n_edges() == 12
    expected = {
        "3761637496": 1, "1829061602": 3, "3761637489": 3, "3761637486": 3,
        "2576426853": 3, "2576426850": 4, "1829061614": 3, "92192237": 3,
        "1852590201": 1,
    }
    assert degrees_of(g) == expected


def test_replace_link_by_node():  # heuristics.rs:275-292
    g = load("test_replace_link_by_node.graph")
    g.replace_link_by_node("92192237", "3761637489")
    assert g.n_nodes() == 5
    assert g.n_edges() == 4
    assert degrees_of(g) == {
        "1829061602": 1, "3761637486": 1, "1829061614": 1, "1852590201": 1,
        "3761637489-92192237": 4,
    }


def test_remove_under_delta_links():  # heuristics.rs:294-313
    g = load("test_remove_under_delta_links.graph")
    g.remove_under_delta_links(6.0)
    assert g.n_nodes() == 7
    assert g.n_edges() == 8
    expected = {
        "3761637496": 1, "1829061602": 3, "3761637486-3761637489": 3,
        "2576426850-2576426853": 3, "1829061614": 2, "92192237": 3,
        "1852590201": 1,
    }
    assert degrees_of(g) == expected


DISCRETIZE_EXPECTED = {
    "3761637496": 1,
    **{f"1829061602-3761637496:{i}/14": 2 for i in range(1, 14)},
    "1829061602": 3,
    "1829061602-3761637486-3761637489:1/3": 2,
    "1829061602-3761637486-3761637489:2/3": 2,
    "2576426850-2576426853": 3,
    "1829061602-2576426850-2576426853:1/3": 2,
    "1829061602-2576426850-2576426853:2/3": 2,
    "3761637486-3761637489": 3,
    **{f"3761637486-3761637489-92192237:{i}/4": 2 for i in range(1, 4)},
    **{f"1829061614-92192237:{i}/5": 2 for i in range(1, 5)},
    "92192237": 3,
    **{f"1852590201-92192237:{i}/5": 2 for i in range(1, 5)},
    "1852590201": 1,
    "1829061614": 2,
}


def test_discretize():  # discretize.rs:54-104
    g = load("test_discretize.graph")
    g.discretize(6.0)
    assert g.n_nodes() == 35
    assert g.n_edges() == 36
    assert degrees_of(g) == DISCRETIZE_EXPECTED


def test_discretize_midpoint_string_golden():
    # datasets/test_discretize.graph contains the merged node
    # 2576426850-2576426853 at 48.827429699999996 / 2.34868405 — produced
    # by the midpoint of the parent nodes; float_repr must reproduce it.
    g = load("test_replace_link_by_node.graph")  # any graph; direct check:
    assert geo.float_repr((48.8274242 + 48.8274352) / 2.0) == "48.827429699999996"


# ------------------------------------------------------------------ metrics


def test_metrics_degrees():  # metrics.rs:81-89
    g = load("cailles.graph")
    assert dict(g.degrees_distribution()) == {1: 5, 2: 12, 3: 5, 4: 4}


def test_metrics_lengths():  # metrics.rs:91-117
    g = load("cailles.graph")
    expected = {
        1: 5, 2: 3, 3: 1, 4: 5, 5: 2, 6: 2, 8: 2, 10: 1, 11: 1, 12: 1,
        14: 1, 15: 2, 18: 1, 22: 1, 34: 1, 87: 1,
    }
    assert dict(g.lengths_distribution()) == expected


def test_metrics_order_size():  # metrics.rs:119-123
    assert load("cailles.graph").order_size() == "26 30"


def test_sort_and_stringify():  # metrics.rs:125-130
    g = load("cailles.graph")
    assert sort_and_stringify(g.degrees_distribution()) == "1 5\n2 12\n3 5\n4 4\n"


# ------------------------------------------------------------ load semantics


def test_load_first_wins_dedup():  # graph.rs:74-102
    text = "a␟1.0␟2.0\na␟9.9␟9.9\nb␟1.1␟2.1\na␟b\nb␟a\na␟b"
    g = OracleGraph.from_text(text, dedup=True)
    assert g.coords["a"] == ("1.0", "2.0")
    assert g.n_edges() == 1
    assert g.degree("a") == 1


def test_load_bad_arity_raises():  # graph.rs:98 panics
    with pytest.raises(ValueError):
        OracleGraph.from_text("a␟b␟c␟d")


def test_show_roundtrip():
    g = load("cailles.graph")
    g2 = OracleGraph.from_lines(g.show_lines(), dedup=True)
    assert g2.n_nodes() == g.n_nodes()
    assert g2.n_edges() == g.n_edges()
    assert degrees_of(g2) == degrees_of(g)


def test_simplify_composition_runs():  # main.rs:66-74 order
    g = load("test_bfs.graph").simplify(10.0)
    assert g.n_nodes() > 0
    assert g.n_edges() > 0
