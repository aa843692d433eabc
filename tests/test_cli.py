"""CLI pipe-surface parity (reference main.rs:22-55 composition)."""

import subprocess
import sys

from ophois_ray.oracle import OracleGraph
from tests.conftest import FIXTURES, load_fixture_text


def run_cli(args, stdin: str, cwd=None) -> str:
    import os

    env = dict(os.environ, PYTHONPATH="/root/repo")
    out = subprocess.run(
        [sys.executable, "-m", "ophois_ray", *args],
        input=stdin.encode(),
        capture_output=True,
        check=True,
        cwd=cwd or "/root/repo",
        env=env,
    )
    return out.stdout.decode()


def test_format_extract_pipe(tmp_path):
    xml = "\n".join(
        [
            "<osm>",
            '  <node id="618904" lat="50.6011263" lon="3.2519549"/>',
            '  <way id="951505353">',
            '    <nd ref="8807254574"/>',
            '    <nd ref="8807254575"/>',
            '    <nd ref="8507963130"/>',
            '    <tag k="highway" v="residential"/>',
            "  </way>",
            "</osm>",
        ]
    )
    formatted = run_cli(["format"], xml, cwd=str(tmp_path))
    extracted = run_cli(["extract"], formatted, cwd=str(tmp_path))
    assert "618904␟50.6011263␟3.2519549" in extracted  # openstreetmap.rs:96
    assert "8807254574␟8807254575" in extracted  # openstreetmap.rs:102
    assert "8807254575␟8507963130" in extracted


def test_simplify_cli_matches_oracle(tmp_path):
    text = load_fixture_text("test_bfs.graph")
    out = run_cli(["simplify", "-d", "10"], text, cwd=str(tmp_path))
    got = OracleGraph.from_text(out)
    exp = OracleGraph.from_text(text).simplify(10.0)
    assert set(got.show_lines()) == set(exp.show_lines())
    assert (tmp_path / "ophois_metrics" / "order_size_simplify=10").exists()


def test_discretize_cli(tmp_path):
    text = load_fixture_text("test_discretize.graph")
    out = run_cli(["discretize", "-d", "6"], text, cwd=str(tmp_path))
    got = OracleGraph.from_text(out)
    assert got.n_nodes() == 35 and got.n_edges() == 36  # discretize.rs:61-62
