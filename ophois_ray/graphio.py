""".graph text <-> (nodes, edges) Datasets (reference S2-S5 sources/sinks).

Reference interchange format (README.md:97-114, src/graph.rs:74-102):
one record per line, fields joined by the U+241F ``␟`` separator;
3 fields => node ``id␟lat␟lon``, 2 fields => undirected link
``u␟v``, any other arity is an error.

Engine representation (SURVEY.md §1.4):
  nodes: id string, lat_str string, lon_str string, lat f64, lon f64
  edges: u string, v string   (canonical invariant u < v)

Coordinates are carried as verbatim source strings alongside parsed
floats — the reference never canonicalizes coordinate literals
(graph.rs:104-110 prints the stored strings back).

Reads are per-file tasks: each input file is scanned once, split into
lines and parsed vectorized with numpy; line order within a file plus
the file's rank in sorted path order gives every row a deterministic
``seq`` so "first-wins" dedup (D1) is reproducible. At 100 TB scale the
input arrives sharded into many files, so per-file tasks parallelize;
one giant file is the caller's anti-pattern.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray.data

DEFAULT_SEPARATOR = "␟"

#: file_rank * SEQ_STRIDE + line_no; 2^40 lines per file is plenty.
SEQ_STRIDE = 1 << 40


def _expand_paths(paths) -> list[str]:
    if isinstance(paths, (str, os.PathLike)):
        paths = [str(paths)]
    out = []
    for p in paths:
        p = str(p)
        if os.path.isdir(p):
            out.extend(
                os.path.join(p, f) for f in sorted(os.listdir(p)) if not f.startswith(".")
            )
        else:
            out.append(p)
    return sorted(out)


def _split_lines(batch: pa.Table, file_rank: dict[str, int]):
    """bytes-of-file rows -> dict of line arrays with deterministic seq."""
    texts = batch["bytes"].to_pylist()
    paths = batch["path"].to_pylist()
    lines_out: list[str] = []
    seq_out: list[int] = []
    for path, raw in zip(paths, texts):
        rank = file_rank[os.path.basename(path)]
        base = rank * SEQ_STRIDE
        lines = raw.decode("utf-8").splitlines()
        lines_out.extend(lines)
        seq_out.extend(range(base, base + len(lines)))
    mask = np.array([bool(l) for l in lines_out], dtype=bool)
    lines_np = np.array(lines_out, dtype=object)[mask]
    seq_np = np.array(seq_out, dtype=np.int64)[mask]
    return {"line": lines_np, "seq": seq_np}


def read_graph_lines(paths, *, override_num_blocks=None) -> "ray.data.Dataset":
    """Read .graph file(s) into a Dataset of (line, seq) rows."""
    files = _expand_paths(paths)
    rank = {os.path.basename(p): i for i, p in enumerate(files)}
    ds = ray.data.read_binary_files(
        files, include_paths=True, override_num_blocks=override_num_blocks
    )
    return ds.map_batches(
        lambda b: _split_lines(b, rank), batch_format="pyarrow", batch_size=None
    )


def _parse_nodes(batch, separator: str, strict: bool):
    lines = batch["line"]
    seqs = np.asarray(batch["seq"])
    n_sep = np.char.count(lines.astype(str), separator)
    if strict:
        bad = ~np.isin(n_sep, (1, 2))
        if bad.any():
            raise ValueError(f"wrong .graph arity in line: {lines[bad][0]!r}")
    is_node = n_sep == 2
    node_lines = lines[is_node]
    if len(node_lines) == 0:
        return {
            "id": np.array([], dtype=object),
            "lat_str": np.array([], dtype=object),
            "lon_str": np.array([], dtype=object),
            "lat": np.array([], dtype=np.float64),
            "lon": np.array([], dtype=np.float64),
            "seq": np.array([], dtype=np.int64),
        }
    parts = np.char.split(node_lines.astype(str), separator)
    ids = np.array([p[0] for p in parts], dtype=object)
    lat_str = np.array([p[1] for p in parts], dtype=object)
    lon_str = np.array([p[2] for p in parts], dtype=object)
    return {
        "id": ids,
        "lat_str": lat_str,
        "lon_str": lon_str,
        "lat": lat_str.astype(np.float64),
        "lon": lon_str.astype(np.float64),
        "seq": seqs[is_node],
    }


def _parse_edges(batch, separator: str, strict: bool):
    lines = batch["line"]
    seqs = np.asarray(batch["seq"])
    n_sep = np.char.count(lines.astype(str), separator)
    if strict:
        bad = ~np.isin(n_sep, (1, 2))
        if bad.any():
            raise ValueError(f"wrong .graph arity in line: {lines[bad][0]!r}")
    is_edge = n_sep == 1
    edge_lines = lines[is_edge]
    if len(edge_lines) == 0:
        return {
            "u": np.array([], dtype=object),
            "v": np.array([], dtype=object),
            "seq": np.array([], dtype=np.int64),
        }
    parts = np.char.split(edge_lines.astype(str), separator)
    u = np.array([p[0] for p in parts], dtype=object)
    v = np.array([p[1] for p in parts], dtype=object)
    return {"u": u, "v": v, "seq": seqs[is_edge]}


def read_graph(
    paths,
    separator: str = DEFAULT_SEPARATOR,
    *,
    strict: bool = True,
    override_num_blocks=None,
):
    """Parse .graph file(s) into raw (nodes, edges) Datasets.

    Raw = not yet deduped; apply graphops.dedup_nodes / dedup_edges for
    the reference's Graph::load semantics (first-wins, graph.rs:82-96).
    ``strict=True`` raises on bad arity (reference panics, graph.rs:98);
    ``strict=False`` silently drops malformed lines.

    The line scan runs twice (once per output table) — two cheap
    streaming passes instead of a materialized intermediate.
    """
    lines1 = read_graph_lines(paths, override_num_blocks=override_num_blocks)
    lines2 = read_graph_lines(paths, override_num_blocks=override_num_blocks)
    nodes = lines1.map_batches(
        lambda b: _parse_nodes(b, separator, strict), batch_format="numpy"
    )
    edges = lines2.map_batches(
        lambda b: _parse_edges(b, separator, strict), batch_format="numpy"
    )
    return nodes, edges


def graph_from_text(text: str, separator: str = DEFAULT_SEPARATOR, parallelism: int = 4):
    """Test constructor: (nodes, edges) Datasets from an in-memory .graph
    string (reference Graph::_from, src/graph.rs:48-72 — no dedup)."""
    lines = [l for l in text.splitlines() if l]
    items = [{"line": l, "seq": i} for i, l in enumerate(lines)]
    ds = ray.data.from_items(items, override_num_blocks=min(parallelism, max(1, len(items))))
    nodes = ds.map_batches(
        lambda b: _parse_nodes(
            {"line": np.asarray(b["line"], dtype=object), "seq": b["seq"]},
            separator,
            True,
        ),
        batch_format="numpy",
    )
    edges = ds.map_batches(
        lambda b: _parse_edges(
            {"line": np.asarray(b["line"], dtype=object), "seq": b["seq"]},
            separator,
            True,
        ),
        batch_format="numpy",
    )
    return nodes, edges


def write_graph(
    nodes, edges, path: str, separator: str = DEFAULT_SEPARATOR, sort: bool = True
) -> None:
    """Serialize (nodes, edges) to one .graph text file (reference
    Graph::show, src/graph.rs:104-121).

    The reference prints HashMap order (nondeterministic); the engine
    emits node lines then edge lines, each sorted, so output is
    byte-stable. Conformance comparisons are set-semantic either way.
    Streams block-by-block through the driver — .graph text output is a
    debugging/interop sink; the scale sink is write_parquet on the
    node/edge tables.
    """
    def node_lines(b):
        ids = np.asarray(b["id"], dtype=object)
        lat = np.asarray(b["lat_str"], dtype=object)
        lon = np.asarray(b["lon_str"], dtype=object)
        out = [f"{i}{separator}{a}{separator}{o}" for i, a, o in zip(ids, lat, lon)]
        return {"line": np.array(out, dtype=object)}

    def edge_lines(b):
        u = np.asarray(b["u"], dtype=object)
        v = np.asarray(b["v"], dtype=object)
        out = [f"{a}{separator}{c}" for a, c in zip(u, v)]
        return {"line": np.array(out, dtype=object)}

    n_ds = nodes.map_batches(node_lines, batch_format="numpy")
    e_ds = edges.map_batches(edge_lines, batch_format="numpy")
    with open(path, "w", encoding="utf-8") as f:
        for ds in (n_ds, e_ds):
            if sort:
                chunk = sorted(
                    line for batch in ds.iter_batches(batch_format="numpy")
                    for line in batch["line"]
                )
                f.writelines(l + "\n" for l in chunk)
            else:
                for batch in ds.iter_batches(batch_format="numpy"):
                    f.writelines(l + "\n" for l in batch["line"])


def nodes_from_oracle(g) -> "ray.data.Dataset":
    """Build a nodes Dataset from an OracleGraph (test helper)."""
    items = [
        {
            "id": n,
            "lat_str": g.coords[n][0],
            "lon_str": g.coords[n][1],
            "lat": float(g.coords[n][0]),
            "lon": float(g.coords[n][1]),
            "seq": i,
        }
        for i, n in enumerate(g.coords)
    ]
    return ray.data.from_items(items)


def edges_from_oracle(g) -> "ray.data.Dataset":
    """Canonical (u < v) edges Dataset from an OracleGraph (test helper)."""
    items = [{"u": u, "v": v} for (u, v) in g.undirected_edges()]
    return ray.data.from_items(items)
