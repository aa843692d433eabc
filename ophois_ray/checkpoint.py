"""S8: per-tile checkpointed output with lineage + resume (north rule:
"every partition emits lineage and row-count metrics to a checkpoint
store so a killed ray job resumes without recomputing completed tiles").

Layout:
  outdir/
    manifest.jsonl            one line per completed tile (append-only)
    tile=<cell>/part-0.parquet

Write protocol per tile (inside the distributed group task):
  write to tile=<cell>.__tmp_<pid>/ -> fsync -> atomic os.replace to
  tile=<cell>/. A retried/duplicate task re-replaces the same directory
  with identical content (idempotent). The driver appends manifest rows
  only after the distributed phase returns, so a crash mid-phase leaves
  at most finished-but-unrecorded tiles, which rerun idempotently.

Resume = anti-join of the tile work list against manifest entries with
matching input fingerprint (driver-side set difference on the small
manifest, per SURVEY.md §2.8).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from . import cells


def load_manifest(outdir: str) -> dict[int, dict]:
    """tile -> latest manifest record."""
    path = os.path.join(outdir, "manifest.jsonl")
    done: dict[int, dict] = {}
    if os.path.exists(path):
        with open(path, encoding="utf-8") as f:
            for line in f:
                if line.strip():
                    rec = json.loads(line)
                    done[int(rec["tile"])] = rec
    return done


def append_manifest(outdir: str, records: list[dict]) -> None:
    path = os.path.join(outdir, "manifest.jsonl")
    with open(path, "a", encoding="utf-8") as f:
        for rec in records:
            f.write(json.dumps(rec, sort_keys=True) + "\n")
        f.flush()
        os.fsync(f.fileno())


def completed_tiles(outdir: str, fingerprint: str) -> set[int]:
    return {
        t
        for t, rec in load_manifest(outdir).items()
        if rec.get("status") == "done" and rec.get("input_fingerprint") == fingerprint
    }


def checkpointed_write(
    ds,
    outdir: str,
    *,
    tile_res: int,
    fingerprint: str,
    cell_col: str = "cell",
    fail_tiles: set[int] | None = None,
):
    """Write ``ds`` partitioned by coarse tile (parent of ``cell_col`` at
    ``tile_res``), skipping tiles already recorded as done for the same
    input fingerprint. Returns the list of manifest records written this
    run (empty list = everything was already done).

    ``fail_tiles`` injects a failure before those tiles are written —
    the test hook for the kill/resume gate.
    """
    os.makedirs(outdir, exist_ok=True)
    done = completed_tiles(outdir, fingerprint)

    def add_tile(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__tile"] = cells.parent_to(df[cell_col].to_numpy(), tile_res)
        return df

    tiled = ds.map_batches(add_tile, batch_format="pandas")
    if done:
        done_arr = np.array(sorted(done), dtype=np.int64)

        def skip_done(df: pd.DataFrame) -> pd.DataFrame:
            return df[~np.isin(df["__tile"].to_numpy(), done_arr)]

        tiled = tiled.map_batches(skip_done, batch_format="pandas")

    fail = fail_tiles or set()

    def write_tile(group: pd.DataFrame) -> pd.DataFrame:
        tile = int(group["__tile"].iloc[0])
        if tile in fail:
            raise RuntimeError(f"injected failure for tile {tile}")
        start = time.monotonic()
        final_dir = os.path.join(outdir, f"tile={tile}")
        tmp_dir = final_dir + f".__tmp_{os.getpid()}"
        os.makedirs(tmp_dir, exist_ok=True)
        out = group.drop(columns=["__tile"]).sort_values(
            list(group.columns.drop("__tile"))[:2]
        )
        tbl = pa.Table.from_pandas(out, preserve_index=False)
        pq.write_table(tbl, os.path.join(tmp_dir, "part-0.parquet"))
        if os.path.exists(final_dir):
            import shutil

            shutil.rmtree(final_dir)
        os.replace(tmp_dir, final_dir)
        return pd.DataFrame(
            [
                {
                    "tile": tile,
                    "status": "done",
                    "rows_in": len(group),
                    "rows_out": len(out),
                    "input_fingerprint": fingerprint,
                    "wall_s": time.monotonic() - start,
                }
            ]
        )

    records_df = (
        tiled.groupby("__tile").map_groups(write_tile, batch_format="pandas").to_pandas()
    )
    records = records_df.to_dict("records") if len(records_df) else []
    append_manifest(outdir, records)
    return records


def read_checkpointed(outdir: str):
    """Read back every completed tile as one Dataset."""
    import ray.data

    manifest = load_manifest(outdir)
    paths = []
    for t, rec in sorted(manifest.items()):
        if rec.get("status") == "done":
            tdir = os.path.join(outdir, f"tile={t}")
            paths.extend(
                os.path.join(tdir, f) for f in sorted(os.listdir(tdir)) if f.endswith(".parquet")
            )
    return ray.data.read_parquet(paths)
