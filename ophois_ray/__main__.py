"""CLI with the reference's pipe-composable surface (main.rs:22-55):

  python -m ophois_ray format                 < pretty.osm   > lines.osm
  python -m ophois_ray extract  [-s SEP]      < lines.osm    > city.graph
  python -m ophois_ray simplify -d D [-s SEP] < city.graph   > simplified.graph
  python -m ophois_ray discretize -d D [-s SEP] < in.graph   > out.graph

Pipe mode runs the single-process oracle kernel (identical semantics,
deterministic order) because a stdin pipe is by definition single-stream;
`--ray INPUT_PATH -o OUT` switches simplify/discretize to the distributed
engine over files. Metrics files land in ./ophois_metrics like the
reference (metrics.rs:69-75).
"""

from __future__ import annotations

import argparse
import sys


def _fmt(delta: float) -> str:
    """Rust Display prints 5.0 as "5" (metrics file name parity)."""
    from .geo import float_repr

    return float_repr(delta)


def _stdin_lines():
    for line in sys.stdin:
        yield line.rstrip("\n")


def cmd_format(args) -> None:
    from .osm import format_elements

    text = sys.stdin.read()
    for el in format_elements(text):
        print(el)


def cmd_extract(args) -> None:
    from .osm import extract_link_lines, extract_node_line

    for line in _stdin_lines():
        s = line.strip()
        if s.startswith("<node"):
            print(extract_node_line(s, args.separator))
        elif s.startswith("<way"):
            sys.stdout.write(extract_link_lines(s, args.separator))


def _metrics_from_oracle(g, param: str) -> None:
    import os

    from .oracle import sort_and_stringify

    outdir = "./ophois_metrics"
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, f"order_size_{param}"), "w") as f:
        f.write(g.order_size())
    with open(os.path.join(outdir, f"degrees_{param}"), "w") as f:
        f.write(sort_and_stringify(g.degrees_distribution()))
    with open(os.path.join(outdir, f"lengths_{param}"), "w") as f:
        f.write(sort_and_stringify(g.lengths_distribution()))


def cmd_simplify(args) -> None:
    if args.ray:
        _ray_mode(args, "simplify")
        return
    from .oracle import OracleGraph

    g = OracleGraph.from_lines(_stdin_lines(), args.separator, dedup=True)
    g = g.simplify(args.delta)
    _metrics_from_oracle(g, f"simplify={_fmt(args.delta)}")
    for line in g.show_lines(args.separator):
        print(line)


def cmd_discretize(args) -> None:
    if args.ray:
        _ray_mode(args, "discretize")
        return
    from .oracle import OracleGraph

    g = OracleGraph.from_lines(_stdin_lines(), args.separator, dedup=True)
    g.discretize(args.delta)
    _metrics_from_oracle(g, f"discretize={_fmt(args.delta)}")
    for line in g.show_lines(args.separator):
        print(line)


def _ray_mode(args, which: str) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", include_dashboard=False, ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from . import components, discretize, graphio, graphops

    nodes, edges = graphio.read_graph(args.ray, args.separator)
    nodes = graphops.dedup_nodes(nodes).materialize()
    e = graphops.dedup_edges(edges).materialize()
    if which == "simplify":
        n2, e2 = components.simplify(nodes, e, args.delta)
    else:
        n2, e2 = discretize.discretize(nodes, e, args.delta)
    n2, e2 = n2.materialize(), e2.materialize()
    graphops.emit_metrics(n2, e2, f"{which}={_fmt(args.delta)}")
    graphio.write_graph(n2, e2, args.output, args.separator)
    ray.shutdown()


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="ophois_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("format")

    def common(sp, delta: bool):
        sp.add_argument("-s", "--separator", default="␟")
        if delta:
            sp.add_argument("-d", "--delta", type=float, required=True)
            sp.add_argument("--ray", metavar="INPUT", help="distributed mode over a .graph file/dir")
            sp.add_argument("-o", "--output", default="out.graph")

    common(sub.add_parser("extract"), delta=False)
    common(sub.add_parser("simplify"), delta=True)
    common(sub.add_parser("discretize"), delta=True)

    args = p.parse_args(argv)
    {"format": cmd_format, "extract": cmd_extract,
     "simplify": cmd_simplify, "discretize": cmd_discretize}[args.cmd](args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
