"""P6/P7/D4: web-page operators over the Common-Crawl-style pages table
(schema per BASELINE.json::input_hint: url string, warc_ts timestamp,
html binary, text string, lang string).

P6 extract_text — from-scratch deterministic HTML->text extractor (no
HTML libraries exist in this environment). The single-process
``oracle_extract_text`` below IS the reference extractor for this repo:
the distributed actor-pool stage must produce byte-identical text per
url versus it (the north rule's per-row invariant), and the synthetic
pages generator fills the ``text`` column with its output so the gate
is end-to-end testable.

Extraction contract (deterministic, order of operations fixed):
  1. drop <!-- comments -->, <script>...</script>, <style>...</style>
     (case-insensitive, dot-matches-newline)
  2. strip every remaining <...> tag
  3. decode HTML entities (stdlib html.unescape — deterministic table)
  4. normalize ALL whitespace runs to single spaces and trim
     (byte-stable: " ".join(s.split()))

P7 geotag — first decimal-degree coordinate pair in the text, matched
by a fixed regex ``coords <lat>,<lon>``; pages without a match get null
coordinates and are dropped by ``filter_geotagged``.

D4 dedup_pages — exact per-url dedup keeping the earliest warc_ts
(deterministic tiebreak: smaller html payload hash). Implemented as a
pack-min groupby + broadcast winner filter: one shuffle over (url,
20-byte packed key), never over html payloads.
"""

from __future__ import annotations

import html as _html
import re

import numpy as np
import pandas as pd

from ray.data.aggregate import Min

from .joins import stable_hash

_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_SCRIPT_RE = re.compile(r"<script\b.*?</script\s*>", re.S | re.I)
_STYLE_RE = re.compile(r"<style\b.*?</style\s*>", re.S | re.I)
_TAG_RE = re.compile(r"<[^>]*>")
_COORD_RE = re.compile(r"coords (-?\d+\.\d+),(-?\d+\.\d+)")


def oracle_extract_text(html_bytes) -> str:
    """Single-process reference extractor (the per-url byte-identity
    oracle). Accepts bytes (utf-8) or str."""
    s = html_bytes.decode("utf-8") if isinstance(html_bytes, (bytes, bytearray)) else str(html_bytes)
    s = _COMMENT_RE.sub(" ", s)
    s = _SCRIPT_RE.sub(" ", s)
    s = _STYLE_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    return " ".join(s.split())


class ExtractText:
    """Actor-pool map_batches stage: compiled patterns built once per
    actor (__init__), batches of html -> text (__call__).

    Usage: pages.map_batches(ExtractText, batch_format="pandas",
    concurrency=(1, N), batch_size=B). Output adds/overwrites ``text``.
    """

    def __init__(self, out_col: str = "text", in_col: str = "html"):
        # per-actor compiled state (regexes are module-level compiled
        # already; re-reference them so the pickled actor class carries
        # no bound pattern objects)
        self.out_col = out_col
        self.in_col = in_col
        self.comment = _COMMENT_RE
        self.script = _SCRIPT_RE
        self.style = _STYLE_RE
        self.tag = _TAG_RE

    def _one(self, raw) -> str:
        s = raw.decode("utf-8") if isinstance(raw, (bytes, bytearray)) else str(raw)
        s = self.comment.sub(" ", s)
        s = self.script.sub(" ", s)
        s = self.style.sub(" ", s)
        s = self.tag.sub(" ", s)
        s = _html.unescape(s)
        return " ".join(s.split())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch[self.out_col] = [self._one(x) for x in batch[self.in_col]]
        return batch


def extract_text(pages, *, concurrency: int = 8, batch_size: int = 1024):
    """P6 distributed: html -> text via the ExtractText actor pool."""
    return pages.map_batches(
        ExtractText,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )


def geotag(pages, text_col: str = "text"):
    """P7: parse the first ``coords lat,lon`` pair out of the text.

    Adds float64 ``lat``/``lon`` columns (NaN when absent). Pure
    vectorized-ish map_batches (compiled regex per doc)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        lats = np.full(len(df), np.nan)
        lons = np.full(len(df), np.nan)
        for i, t in enumerate(df[text_col]):
            m = _COORD_RE.search(t) if isinstance(t, str) else None
            if m:
                lats[i] = float(m.group(1))
                lons[i] = float(m.group(2))
        df = df.copy()
        df["lat"] = lats
        df["lon"] = lons
        return df

    return pages.map_batches(fn, batch_format="pandas")


def filter_geotagged(pages):
    """Keep only pages with parsed coordinates."""
    return pages.map_batches(
        lambda df: df[np.isfinite(df["lat"].to_numpy())], batch_format="pandas"
    )


def _ts_micros(ts_series: pd.Series) -> np.ndarray:
    vals = pd.to_datetime(ts_series)
    return vals.astype("int64").to_numpy() // 1000  # ns -> us


_PACK_SEP = "\x01"


def dedup_pages(pages):
    """D4: keep one row per url — earliest warc_ts, ties broken by the
    smaller html content hash (deterministic).

    Stage 1 shuffles only (url, packed-key) rows; stage 2 filters the
    full table against the broadcast winner set. The winner map is one
    entry per distinct url — for truly unbounded url spaces swap the
    filter for a hash_join semi-join on (url, packed).
    """
    import ray

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        ts = _ts_micros(df["warc_ts"])
        h = stable_hash(
            np.array([bytes(x) if isinstance(x, (bytes, bytearray)) else str(x).encode() for x in df["html"]], dtype=object)
        )
        packed = np.array(
            [f"{t:020d}{_PACK_SEP}{hh:020d}" for t, hh in zip(ts, h)], dtype=object
        )
        return pd.DataFrame({"url": df["url"], "packed": packed})

    winners = (
        pages.map_batches(pack, batch_format="pandas")
        .groupby("url")
        .aggregate(Min("packed", alias_name="packed"))
    )
    wtbl = winners.to_pandas()
    from .joins import BroadcastIndex

    idx_ref = ray.put(
        BroadcastIndex(
            wtbl["url"].to_numpy(object), {"packed": wtbl["packed"].to_numpy(object)}
        )
    )

    def keep_winners(df: pd.DataFrame) -> pd.DataFrame:
        idx = ray.get(idx_ref) if isinstance(idx_ref, ray.ObjectRef) else idx_ref
        p = pack(df)["packed"].to_numpy(object)
        want = idx.lookup(df["url"].to_numpy(object), "packed")
        return df[p == want]

    return pages.map_batches(keep_winners, batch_format="pandas")
