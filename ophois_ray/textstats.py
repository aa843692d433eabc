"""Text-analysis operators for training-data pipelines over the
``documents`` table: token counting, quality scoring, n-gram-heuristic
language ID, document fingerprinting. All map_batches, all deterministic;
the SQL-expressible ones (token/char counts) are mirrored 1:1 by
oracle_sql entries.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_UPPER_RE = re.compile(r"[^A-Z]")
_SENT_RE = re.compile(r"[^.!?]")

#: top stopwords per language for the n-gram/stopword lang-id heuristic
STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "with"},
    "fr": {"le", "la", "les", "de", "des", "et", "un", "une", "est", "dans"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "mit", "von", "zu"},
    "es": {"el", "la", "los", "las", "de", "y", "un", "una", "es", "en"},
    "it": {"il", "la", "gli", "di", "e", "un", "una", "che", "per", "con"},
}
_LANGS = sorted(STOPWORDS)


def token_count(ds, text_col: str = "text", out_col: str = "n_tokens"):
    """Whitespace token count (== SQL len(list_filter(string_split_regex(
    text, '\\s+'), x -> x != '')))."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[out_col] = [len(t.split()) if isinstance(t, str) else 0 for t in df[text_col]]
        return df

    return ds.map_batches(fn, batch_format="pandas")


def quality_features(ds, text_col: str = "text"):
    """Integer quality features per document (SQL-mirrorable):
    n_chars_actual, n_upper (A-Z count), n_sentenceish (.!? count),
    n_tokens; plus float stop_ratio (en stopword share) for scoring."""

    stop_en = STOPWORDS["en"]

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        texts = df[text_col]
        df = df.copy()
        df["n_chars_actual"] = texts.str.len().fillna(0).astype(np.int64)
        # count of A-Z == len of text with non-A-Z removed
        df["n_upper"] = [
            len(_UPPER_RE.sub("", t)) if isinstance(t, str) else 0 for t in texts
        ]
        df["n_sentenceish"] = [
            len(_SENT_RE.sub("", t)) if isinstance(t, str) else 0 for t in texts
        ]
        toks = [t.split() if isinstance(t, str) else [] for t in texts]
        df["n_tokens"] = np.array([len(ws) for ws in toks], dtype=np.int64)
        df["stop_ratio"] = np.array(
            [sum(w.lower() in stop_en for w in ws) / max(1, len(ws)) for ws in toks]
        )
        return df

    return ds.map_batches(fn, batch_format="pandas")


def quality_score(ds, text_col: str = "text"):
    """Composite 0..1 quality score: length sweet-spot x punctuation
    presence x stopword plausibility (heuristic, deterministic)."""
    feat = quality_features(ds, text_col)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_tokens"].to_numpy(np.float64)
        length_s = np.clip(n / 20.0, 0, 1) * np.clip((5000 - n) / 5000.0, 0, 1)
        sent_s = np.clip(df["n_sentenceish"].to_numpy(np.float64) / np.maximum(n / 30.0, 1), 0, 1)
        stop_s = np.clip(df["stop_ratio"].to_numpy() * 5.0, 0, 1)
        df = df.copy()
        df["quality"] = length_s * (0.5 + 0.25 * sent_s + 0.25 * stop_s)
        return df

    return feat.map_batches(fn, batch_format="pandas")


class LangId:
    """Actor-pool stage: stopword-set language ID. Word splitter and
    lowered stopword tables built once per actor."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.text_col = text_col
        self.out_col = out_col
        self.word_re = re.compile(r"[a-zA-Z']+")
        self.tables = {lang: frozenset(ws) for lang, ws in STOPWORDS.items()}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        preds = []
        for t in df[self.text_col]:
            if not isinstance(t, str) or not t:
                preds.append("und")
                continue
            words = [w.lower() for w in self.word_re.findall(t)]
            best_lang, best = "und", 0
            for lang in _LANGS:
                score = sum(w in self.tables[lang] for w in words)
                if score > best:
                    best, best_lang = score, lang
            preds.append(best_lang)
        df = df.copy()
        df[self.out_col] = preds
        return df


def lang_id(ds, *, concurrency: int = 4, batch_size: int = 2048):
    return ds.map_batches(
        LangId, batch_format="pandas", batch_size=batch_size, concurrency=(1, concurrency)
    )


# ------------------------------------------------------------ fingerprints

_FP_MOD = np.uint64((1 << 61) - 1)
_FP_BASE = np.uint64(257)


def _poly_hash_codepoints(cps) -> int:
    """Polynomial rolling hash of a code-point sequence mod 2^61-1
    (deterministic, order-sensitive — a document fingerprint). Defined
    over Unicode code points, not utf-8 bytes, so the identical value is
    computable in ANSI SQL (DuckDB list_reduce over unicode(ch) with a
    HUGEINT accumulator — see queries.SQL_DOC_FINGERPRINT)."""
    mod = int(_FP_MOD)
    base = int(_FP_BASE)
    acc = 0
    for b in cps:
        acc = (acc * base + b + 1) % mod
    return acc


def _rolling_kgram_min(cps, k: int = 8) -> int:
    """Minimum over all k-gram polynomial hashes (rabin fingerprint
    winnow-min): robust to local edits, deterministic."""
    if len(cps) < k:
        return _poly_hash_codepoints(cps)
    mod = int(_FP_MOD)
    base = int(_FP_BASE)
    basek = pow(base, k - 1, mod)
    h = 0
    for b in cps[:k]:
        h = (h * base + b + 1) % mod
    best = h
    for i in range(k, len(cps)):
        h = ((h - (cps[i - k] + 1) * basek) * base + cps[i] + 1) % mod
        if h < best:
            best = h
    return best


def fingerprint(ds, text_col: str = "text", k: int = 8):
    """Adds doc_hash (full-text rolling hash) and kgram_min (minimum
    k-gram hash) int64 columns, both over Unicode code points."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        enc = [
            [ord(c) for c in t] if isinstance(t, str) else [] for t in df[text_col]
        ]
        df["doc_hash"] = np.array(
            [_poly_hash_codepoints(e) for e in enc], dtype=np.uint64
        ).astype(np.int64)
        df["kgram_min"] = np.array(
            [_rolling_kgram_min(e, k) for e in enc], dtype=np.uint64
        ).astype(np.int64)
        return df

    return ds.map_batches(fn, batch_format="pandas")
