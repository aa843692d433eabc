"""P1-P4 OSM parse chain vs reference goldens (openstreetmap.rs:90-104)
and the synthetic city generator."""

import pytest

from ophois_ray import graphops, osm

pytestmark = pytest.mark.usefixtures("ray_session")


def test_extract_node_golden():  # openstreetmap.rs:93-97
    line = '<node id="618904" lat="50.6011263" lon="3.2519549"/>'
    assert osm.extract_node_line(line) == "618904␟50.6011263␟3.2519549"


def test_extract_link_golden():  # openstreetmap.rs:99-104
    line = (
        '<way id="951505353"><nd ref="8807254574"/><nd ref="8807254575"/>'
        '<nd ref="8507963130"/><tag k="highway" v="residential"/></way>'
    )
    assert osm.extract_link_lines(line) == "8807254574␟8807254575\n8807254575␟8507963130\n"


def test_extract_link_single_ref_emits_nothing():  # openstreetmap.rs:71-78
    assert osm.extract_link_lines('<way id="1"><nd ref="42"/></way>') == ""


def test_format_elements():  # openstreetmap.rs:24-57
    text = "\n".join(
        [
            "<osm>",
            '  <node id="1" lat="2" lon="3"/>',
            '  <node id="4" lat="5" lon="6">',
            '    <tag k="a" v="b"/>',
            "  </node>",
            '  <way id="7">',
            '    <nd ref="1"/>',
            '    <nd ref="4"/>',
            "  </way>",
            "  <relation/>",
            "</osm>",
        ]
    )
    els = osm.format_elements(text)
    assert els == [
        '<node id="1" lat="2" lon="3"/>',
        '<node id="4" lat="5" lon="6"><tag k="a" v="b"/></node>',
        '<way id="7"><nd ref="1"/><nd ref="4"/></way>',
    ]


def test_read_osm_xml_synthetic_city(tmp_path):
    xml, nodes_df, ways_df = osm.synthetic_city(seed=7, grid=6)
    path = tmp_path / "city.osm"
    path.write_text(xml, encoding="utf-8")
    nodes, edges = osm.read_osm_xml(str(path))
    nodes = graphops.dedup_nodes(nodes).materialize()
    edges = graphops.dedup_edges(edges).materialize()
    assert nodes.count() == len(nodes_df)  # grid nodes + extra component
    # grid ways: 6 rows + 6 cols of 6 nodes -> 2*6*5 edges, plus extra
    # component chain (5), dangling (1); canonical dedup keeps all unique
    expected_edges = 2 * 6 * 5 + 5 + 1
    assert edges.count() == expected_edges
    # verbatim strings: every node lat_str has 7 decimals
    row = nodes.take(1)[0]
    assert len(row["lat_str"].split(".")[1]) == 7
    # interior grid nodes are 4-way intersections after way splitting
    hist = graphops.degree_histogram(nodes, edges)
    assert hist[4] >= 16  # (6-2)^2 interior nodes
    # dangling edge drop policy
    clean = graphops.attach_coords(edges, nodes, drop_dangling=True)
    assert clean.count() == expected_edges - 1


def test_write_synthetic_city_files(tmp_path):
    paths = osm.write_synthetic_city_files(str(tmp_path), n_files=2, seed=1, grid=4)
    assert len(paths) == 2
    nodes, edges = osm.read_osm_xml(str(tmp_path))
    n = graphops.dedup_nodes(nodes)
    assert n.count() == 2 * (16 + 6)  # ids unique across shards
