"""Deterministic synthetic data generators (no external data allowed).

Pages table per BASELINE.json::input_hint:
  url: string, warc_ts: timestamp[us], html: binary, text: string,
  lang: string
with the FIXTURES.md §A1 properties: ~1% duplicate urls (differing
warc_ts), 1-5% pages without coordinates, coordinates drawn from 2-3
city-center hotspots (Zipf-ish) plus uniform background so hot-cell
skew is exercised at test scale, html templates with entities / nested
tags / script+style blocks, and ``text`` filled with the oracle
extractor's output so the byte-identity gate is end-to-end checkable.

Generation is seeded per shard (RandomState(seed + shard)) and each
shard is written by an independent Ray task -> deterministic regardless
of scheduling, parallel, and resumable at shard granularity.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .pages import oracle_extract_text

LANGS = np.array(["en", "fr", "de", "es", "it"])

#: hotspot city centers (lat, lon, weight) — Zipf-ish skew
HOTSPOTS = [
    (48.8566, 2.3522, 0.5),
    (45.7640, 4.8357, 0.25),
    (50.6292, 3.0573, 0.1),
]
_BG_WEIGHT = 1.0 - sum(w for _, _, w in HOTSPOTS)
_BBOX = (44.0, 51.5, 1.0, 6.0)  # lat_min, lat_max, lon_min, lon_max

_TEMPLATES = [
    (
        "<html><head><title>{title}</title>"
        "<script>var x = 1 < 2 && \"{noise}\";</script>"
        "<style>body {{ color: red; }}</style></head>"
        "<body><h1>{title}</h1><p>Report from {city} &amp; beyond.</p>"
        "{coords_p}<p>{body}</p><!-- hidden {noise} --></body></html>"
    ),
    (
        "<html>\n  <head>\n    <title>{title}</title>\n  </head>\n"
        "  <body>\n    <div class=\"main\"><p>{body} &eacute;t&eacute;</p>"
        "{coords_p}<ul><li>a&lt;b</li><li>c &gt; d</li></ul></div>\n"
        "  </body>\n</html>"
    ),
    (
        "<html><body><p>{body}</p>{coords_p}"
        "<table><tr><td>{city}</td><td>&quot;{noise}&quot;</td></tr></table>"
        "</body></html>"
    ),
]

_WORDS = np.array(
    "the quick brown fox jumps over lazy dog rue avenue boulevard place "
    "street market bridge river station museum garden square tower old "
    "news report travel guide history walk metro line".split()
)


def _coords_for(rng: np.random.RandomState, n: int, no_coord_frac: float):
    """(lat, lon, has_coords) arrays with hotspot-skewed placement."""
    r = rng.uniform(size=n)
    lat = np.empty(n)
    lon = np.empty(n)
    acc = 0.0
    assigned = np.zeros(n, dtype=bool)
    for hlat, hlon, w in HOTSPOTS:
        m = (~assigned) & (r < acc + w)
        lat[m] = hlat + rng.normal(0, 0.004, m.sum())
        lon[m] = hlon + rng.normal(0, 0.006, m.sum())
        assigned |= m
        acc += w
    bg = ~assigned
    lat[bg] = rng.uniform(_BBOX[0], _BBOX[1], bg.sum())
    lon[bg] = rng.uniform(_BBOX[2], _BBOX[3], bg.sum())
    has = rng.uniform(size=n) >= no_coord_frac
    return lat, lon, has


def generate_pages_shard(
    shard: int,
    n_rows: int,
    seed: int = 42,
    *,
    dup_frac: float = 0.01,
    no_coord_frac: float = 0.03,
    n_paragraphs: int = 1,
    words_per_paragraph: int = 12,
) -> pa.Table:
    """One deterministic shard of the pages table.

    ``n_paragraphs`` x ``words_per_paragraph`` sizes the html body —
    tests use the small default; benches use ~20 x 60 for realistic
    Common-Crawl-ish page weights (~10 KB) so per-page compute, not
    fixed overhead, dominates throughput measurements.
    """
    rng = np.random.RandomState(seed + shard)
    base = shard * n_rows
    idx = np.arange(base, base + n_rows)
    hosts = idx % 97
    urls = np.array([f"https://host{h}.example/p/{i}" for h, i in zip(hosts, idx)], dtype=object)
    # ~dup_frac of rows re-use the previous row's url (later warc_ts)
    dup = rng.uniform(size=n_rows) < dup_frac
    dup[0] = False
    urls[dup] = urls[np.flatnonzero(dup) - 1]
    ts = (1_600_000_000_000_000 + idx * 1_000_000 + rng.randint(0, 1000, n_rows)).astype(
        "datetime64[us]"
    )
    lat, lon, has = _coords_for(rng, n_rows, no_coord_frac)
    langs = LANGS[rng.randint(0, len(LANGS), n_rows)]

    # one vectorized draw for every body word in the shard
    wpp = words_per_paragraph
    word_idx = rng.randint(0, len(_WORDS), size=(n_rows, n_paragraphs, wpp))
    tmpl_idx = rng.randint(0, len(_TEMPLATES), n_rows)
    noise_n = rng.randint(0, 10**6, n_rows)
    title_idx = rng.randint(0, len(_WORDS), size=(n_rows, 3))
    words_flat = _WORDS[word_idx]

    htmls = []
    for i in range(n_rows):
        t = _TEMPLATES[int(tmpl_idx[i])]
        paras = words_flat[i]
        if n_paragraphs == 1:
            body = " ".join(paras[0])
        else:
            body = "</p><p>".join(" ".join(p) for p in paras)
        title = " ".join(_WORDS[title_idx[i]])
        noise = f"n{int(noise_n[i])}"
        coords_p = (
            f"<p>location coords {lat[i]:.7f},{lon[i]:.7f} here</p>" if has[i] else ""
        )
        htmls.append(
            t.format(title=title, body=body, noise=noise, city="Ville", coords_p=coords_p).encode()
        )
    texts = [oracle_extract_text(h) for h in htmls]
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )


def write_pages(
    outdir: str,
    n_rows: int,
    *,
    n_shards: int = 8,
    seed: int = 42,
    use_ray: bool = True,
    **kw,
) -> list[str]:
    """Write the pages table as n_shards parquet files; skips shards that
    already exist (shard-granular resume). Ray-parallel when a session
    is up."""
    os.makedirs(outdir, exist_ok=True)
    per = int(np.ceil(n_rows / n_shards))
    jobs = []
    paths = []
    for s in range(n_shards):
        rows = min(per, n_rows - s * per)
        if rows <= 0:
            break
        path = os.path.join(outdir, f"pages_{s:04d}.parquet")
        paths.append(path)
        if os.path.exists(path):
            continue
        jobs.append((s, rows, path))

    def build(s, rows, path):
        tbl = generate_pages_shard(s, rows, seed, **kw)
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
        return path

    if use_ray and jobs:
        import ray

        if ray.is_initialized():
            remote_build = ray.remote(num_cpus=1)(build)
            ray.get([remote_build.remote(*j) for j in jobs])
        else:
            for j in jobs:
                build(*j)
    else:
        for j in jobs:
            build(*j)
    return paths
