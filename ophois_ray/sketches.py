"""Mergeable sketches for approximate analytics at corpus scale.

HyperLogLog distinct-count over a Dataset column. The register array is
the sketch: ``reg = h % m``, ``rho = leading-zero-run of h // m, + 1``
with ``h`` the int61-exact keyed hash ``sampling.split_hash`` — every
step is integer (or exact-float frexp), so the *registers themselves*
are SQL-mirrorable bit-for-bit (``oracle_sql_hll``) even though the
final cardinality estimate is a float.

Scale shape: one streaming pass; each batch emits at most
``len(groups) * m`` partial (group, reg, max-rho) rows — the semigroup
combine is ``max`` — and a single final task merges the tiny partials.
Nothing about the data ever shuffles; sketches from disjoint shards (or
disjoint clusters) merge by elementwise register max, which is what
makes HLL the right distinct-counter for a 100-TB corpus where exact
per-group ``COUNT(DISTINCT)`` (sampling.distinct_count) would carry
every unique value through a shuffle.

No counterpart in the reference (its dedup is exact, graph.rs:82-96);
this is an engine addition for the training-data layer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .sampling import P61, _A, _B, split_hash

#: bits of hash left for the rho run after taking b register bits.
#: b >= 8 keeps that field < 2^53 so float64 frexp is exact.
_HASH_BITS = 61


def _finalize(parts, combine, num_final_blocks: int):
    """Fold per-batch sketch partials: an optional intermediate
    width-``num_final_blocks`` combine (for very wide inputs), then the
    exact global merge in one task. With the default width of 1 the
    intermediate stage is skipped — it would be a no-op repartition
    plus a re-aggregation of already-merged rows."""
    if num_final_blocks > 1:
        parts = parts.repartition(num_final_blocks).map_batches(
            combine, batch_size=None, batch_format="pandas"
        )
    return parts.repartition(1).map_batches(
        combine, batch_size=None, batch_format="pandas"
    )


def _rho(w: np.ndarray, field_bits: int) -> np.ndarray:
    """1 + leading zeros of ``w`` viewed as a ``field_bits``-wide field.

    ``frexp`` exponent == bit_length exactly for w < 2^53 (int64->float64
    conversion is lossless there), and frexp(0) returns exponent 0 which
    lands on the correct all-zeros value ``field_bits + 1`` for free.
    """
    if field_bits > 53:
        raise ValueError("field must fit float64 mantissa (b >= 8)")
    _, e = np.frexp(w.astype(np.float64))
    return (field_bits - e + 1).astype(np.int64)


def hll_registers(ds, col: str, *, group_cols=(), b: int = 8,
                  num_final_blocks: int = 1):
    """HyperLogLog registers per group: Dataset of
    ``(*group_cols, reg, rho)`` with one row per non-empty register,
    ``rho`` the max rank seen.

    ``b`` register-index bits (m = 2^b registers, b in [8, 16]); the
    hash is ``split_hash`` so the sketch is a pure function of the
    values — identical across block layouts, cluster widths and reruns,
    and bit-equal to ``oracle_sql_hll``'s DuckDB evaluation.
    """
    if not 8 <= b <= 16:
        raise ValueError("b must be in [8, 16]")
    m = 1 << b
    field = _HASH_BITS - b
    gcols = list(group_cols)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = split_hash(df[col].to_numpy())
        out = pd.DataFrame({c: df[c].to_numpy() for c in gcols})
        out["reg"] = (h % m).astype(np.int64)
        out["rho"] = _rho(h // m, field)
        return out.groupby(gcols + ["reg"], as_index=False)["rho"].max()

    parts = ds.map_batches(partial, batch_format="pandas")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(gcols + ["reg"], as_index=False)["rho"].max()
        g["reg"] = g["reg"].astype(np.int64)
        g["rho"] = g["rho"].astype(np.int64)
        return g

    # partials are <= n_blocks * |groups| * m tiny integer rows; fold
    # them in one task (the semigroup merge is an elementwise max)
    return _finalize(parts, combine, num_final_blocks)


def hll_estimate(registers: pd.DataFrame, *, b: int = 8) -> float:
    """Standard HLL cardinality estimate from a (reg, rho) frame
    (one group's registers; absent rows are empty registers).

    Flajolet et al. 2007 bias-corrected raw estimate with the
    small-range linear-counting correction. Float — pytest gates bound
    its error against the exact distinct count; the driver-facing
    artifact is the integer register table, not this number.
    """
    m = 1 << b
    alpha = 0.7213 / (1.0 + 1.079 / m)
    rho = np.zeros(m, dtype=np.int64)
    rho[registers["reg"].to_numpy(np.int64)] = registers["rho"].to_numpy(np.int64)
    raw = alpha * m * m / np.sum(np.ldexp(1.0, -rho))
    zeros = int((rho == 0).sum())
    if raw <= 2.5 * m and zeros:
        return float(m * np.log(m / zeros))
    return float(raw)


def oracle_sql_hll(table: str, col: str, *, group_cols=(), b: int = 8) -> str:
    """DuckDB SQL computing the identical register table.

    The leading-zero count is a generated CASE ladder over the
    ``61 - b``-bit field — pure integer comparisons, so the rows are
    bit-identical to ``hll_registers``.
    """
    m = 1 << b
    field = _HASH_BITS - b
    whens = "\n         ".join(
        f"WHEN w >= {1 << (field - j)} THEN {j}" for j in range(1, field + 1)
    )
    gsel = "".join(f"{c}, " for c in group_cols)
    gby = "".join(f", {c}" for c in group_cols)
    return f"""
WITH h AS (
  SELECT {gsel}({col} * {_A} + {_B}) % {P61} AS hv FROM {table}
), r AS (
  SELECT {gsel}hv % {m} AS reg, hv // {m} AS w FROM h
)
SELECT {gsel}reg,
       MAX(CASE {whens}
         ELSE {field + 1} END) AS rho
FROM r
GROUP BY reg{gby}
"""


# ---------------------------------------------------- count-min sketch

#: one small prime base per CMS row; each row is an independent
#: polynomial hash of the value's code points (same construction as
#: textstats._poly_hash_codepoints, which uses base 257)
CMS_BASES = (257, 263, 269, 271)

_MASK51 = np.uint64((1 << 51) - 1)


def _fold61(x: np.ndarray) -> np.ndarray:
    """Reduce uint64 mod p = 2^61-1 (inputs < 2^64)."""
    p = np.uint64((1 << 61) - 1)
    x = (x & p) + (x >> np.uint64(61))
    return np.where(x >= p, x - p, x)


def _mul_base61(x: np.ndarray, base: int) -> np.ndarray:
    """x * base mod 2^61-1 for x < p and base < 2^10, uint64-safe:
    split x at bit 51 (low * base stays < 2^61; the high part re-shifts
    by 2^51 via the Mersenne identity y*2^51 = ((y mod 2^10) << 51) +
    (y >> 10))."""
    lo = (x & _MASK51) * np.uint64(base)
    y = (x >> np.uint64(51)) * np.uint64(base)
    hi = ((y & np.uint64((1 << 10) - 1)) << np.uint64(51)) + (y >> np.uint64(10))
    return _fold61(lo + hi)


def hash_strings(values, base: int = 257) -> np.ndarray:
    """Vectorized polynomial code-point hash mod 2^61-1 (uint64 out):
    acc = acc*base + cp + 1 per character — bit-identical to
    textstats._poly_hash_codepoints for base 257 and to the DuckDB
    ``list_reduce(... (acc, b) -> (acc * base + b + 1) % p)`` mirror
    for any base here. One position-major Horner pass: the per-token
    Python work is only the length scan + one utf-32 encode."""
    toks = list(values)
    n = len(toks)
    acc = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return acc
    lens = np.array([len(t) for t in toks], dtype=np.int64)
    if lens.max() == 0:
        return acc
    flat = np.frombuffer("".join(toks).encode("utf-32-le"), dtype=np.uint32
                         ).astype(np.uint64)
    starts = np.concatenate([[0], np.cumsum(lens[:-1])])
    for p in range(int(lens.max())):
        m = lens > p
        acc[m] = _fold61(
            _mul_base61(acc[m], base) + flat[starts[m] + p] + np.uint64(1)
        )
    return acc


def cms_sketch(ds, col: str, *, w: int = 512, d: int = 4,
               num_final_blocks: int = 1):
    """Count-min sketch of a string column: Dataset of ``(row, col, n)``
    — one row per non-empty cell, ``n`` the exact number of occurrences
    hashing there. Like the HLL registers, the sketch table itself is
    integer and SQL-mirrorable bit-for-bit (``oracle_sql_cms``), even
    though the operator's purpose is approximate frequency (point
    estimates overcount, never undercount).

    Scale shape: per-batch partials are <= d*w rows regardless of batch
    size (value-counts then bucket-sum inside the batch), the merge is
    elementwise addition — sketches from disjoint shards / clusters sum.
    """
    if d > len(CMS_BASES):
        raise ValueError(f"d <= {len(CMS_BASES)}")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[col].value_counts()
        toks = vc.index.to_numpy(object)
        cnt = vc.to_numpy(np.int64)
        outs = []
        for j in range(d):
            h = (hash_strings(toks, CMS_BASES[j]) % np.uint64(w)).astype(np.int64)
            g = pd.DataFrame({"row": np.int64(j), "col": h, "n": cnt})
            outs.append(g.groupby(["row", "col"], as_index=False)["n"].sum())
        out = pd.concat(outs, ignore_index=True)
        out["n"] = out["n"].astype(np.int64)
        return out

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["row", "col"], as_index=False)["n"].sum()
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = ds.map_batches(partial, batch_format="pandas")
    return _finalize(parts, combine, num_final_blocks)


def cms_estimate(sketch: pd.DataFrame, values, *, w: int = 512,
                 d: int = 4) -> np.ndarray:
    """Point frequency estimates: min over rows of the addressed cells.
    Never undercounts; overcounts by collisions (<= N/w in expectation
    per row, so the d-row min is tight for heavy hitters)."""
    reg = np.zeros((d, w), dtype=np.int64)
    reg[sketch["row"].to_numpy(np.int64), sketch["col"].to_numpy(np.int64)] = (
        sketch["n"].to_numpy(np.int64)
    )
    vals = list(values)
    est = np.full(len(vals), np.iinfo(np.int64).max, dtype=np.int64)
    for j in range(d):
        h = (hash_strings(vals, CMS_BASES[j]) % np.uint64(w)).astype(np.int64)
        est = np.minimum(est, reg[j, h])
    return est


def oracle_sql_cms(table: str, token_expr: str, *, w: int = 512,
                   d: int = 4) -> str:
    """DuckDB SQL computing the identical (row, col, n) sketch table
    over ``token_expr`` (a list-of-strings expression over ``table``);
    one UNION ALL arm per hash row, HUGEINT list_reduce per token."""
    arms = []
    for j in range(d):
        b = CMS_BASES[j]
        arms.append(f"""
  SELECT CAST({j} AS BIGINT) AS row,
         CAST((list_reduce(list_prepend(CAST(0 AS HUGEINT),
               list_transform(regexp_extract_all(t, '(?s).'),
                              x -> CAST(unicode(x) AS HUGEINT))),
               (acc, c) -> (acc * {b} + c + 1) % {P61}) % {w}) AS BIGINT) AS col,
         CAST(count(*) AS BIGINT) AS n
  FROM tok GROUP BY 2""")
    union = "\n  UNION ALL\n".join(arms)
    return f"""
WITH tok AS (
  SELECT unnest({token_expr}) AS t FROM {table}
)
{union}
"""


# -------------------------------------------------------- bloom filter

#: per-probe affine constants applied to the base code-point hash
#: (distinct probes of one strong hash — the standard double-hashing
#: construction g_i(x) = h1(x) + i*h2(x), here with h2 fixed odd)
BLOOM_PROBES = ((1, 0), (3, 17), (5, 101), (7, 3571))


def bloom_bits(ds, col: str, *, m: int = 8192, k: int = 3,
               num_final_blocks: int = 1):
    """Bloom filter of a string column as its set-bit table: Dataset of
    ``(bit,)`` int64 rows (sorted-distinct within each output block).
    Probe i addresses ``((h * a_i + b_i) % p) % m`` with ``h`` the
    code-point polynomial hash — all integer, so the filter itself is
    SQL-mirrorable (``oracle_sql_bloom``).

    Per-batch partials are <= m rows; filters merge by plain set union
    (bitwise OR of the dense form) — the membership sketch for
    cross-run dedup ("seen this url?") where shipping the key set is
    off the table. No false negatives; false-positive rate ~
    (1 - e^(-k*n/m))^k.
    """
    if k > len(BLOOM_PROBES):
        raise ValueError(f"k <= {len(BLOOM_PROBES)}")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vals = df[col].drop_duplicates().to_numpy(object)
        h = hash_strings(vals, 257)
        bits = []
        for i in range(k):
            a, b = BLOOM_PROBES[i]
            g = _fold61(_mul_base61(h, a) + np.uint64(b))
            bits.append((g % np.uint64(m)).astype(np.int64))
        u = np.unique(np.concatenate(bits)) if bits else np.array([], np.int64)
        return pd.DataFrame({"bit": u})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"bit": np.unique(df["bit"].to_numpy(np.int64))})

    parts = ds.map_batches(partial, batch_format="pandas")
    return _finalize(parts, combine, num_final_blocks)


def bloom_contains_dense(dense: np.ndarray, values, *,
                         k: int = 3) -> np.ndarray:
    """Membership test against a PRE-BUILT dense bool bitmap (the
    broadcast form — build once, probe per batch). The probe formula
    lives only here, beside BLOOM_PROBES: any change to the probes
    stays bit-consistent with bloom_bits by construction."""
    m = len(dense)
    vals = list(values)
    h = hash_strings(vals, 257)
    ok = np.ones(len(vals), dtype=bool)
    for i in range(k):
        a, b = BLOOM_PROBES[i]
        g = _fold61(_mul_base61(h, a) + np.uint64(b))
        ok &= dense[(g % np.uint64(m)).astype(np.int64)]
    return ok


def bloom_contains(bits: pd.DataFrame, values, *, m: int = 8192,
                   k: int = 3) -> np.ndarray:
    """Membership test against a set-bit table: True iff all k probe
    bits are set. Guaranteed True for every inserted value."""
    dense = np.zeros(m, dtype=bool)
    dense[bits["bit"].to_numpy(np.int64)] = True
    return bloom_contains_dense(dense, values, k=k)


def oracle_sql_bloom(source_sql: str, *, m: int = 8192, k: int = 3) -> str:
    """DuckDB SQL computing the identical set-bit table; ``source_sql``
    is a subquery yielding the values as a column named ``t``."""
    arms = []
    for i in range(k):
        a, b = BLOOM_PROBES[i]
        arms.append(
            f"  SELECT CAST(((h * {a} + {b}) % {P61}) % {m} AS BIGINT) AS bit FROM hv"
        )
    union = "\n  UNION\n".join(arms)
    return f"""
WITH v AS (
  SELECT DISTINCT t FROM ({source_sql})
), hv AS (
  SELECT list_reduce(list_prepend(CAST(0 AS HUGEINT),
           list_transform(regexp_extract_all(t, '(?s).'),
                          x -> CAST(unicode(x) AS HUGEINT))),
         (acc, c) -> (acc * 257 + c + 1) % {P61}) AS h
  FROM v
)
{union}
"""


# ------------------------------------------------------- KLL quantiles

#: default compactor capacity: rank error empirically < 2% at 100k items
KLL_K = 200


def _kll_from_rows(level: np.ndarray, value: np.ndarray) -> list[np.ndarray]:
    """(level, value) rows -> per-level arrays (level i weight = 2^i)."""
    levels: list[np.ndarray] = []
    if len(level):
        for lv in range(int(level.max()) + 1):
            levels.append(value[level == lv].astype(np.int64))
    return levels


def _kll_compact(levels: list[np.ndarray], k: int) -> list[np.ndarray]:
    """Deterministic KLL compaction: any level holding >= k items is
    sorted and its even- or odd-indexed half (parity = level index, so
    the low/high bias alternates) is promoted to the next level with
    doubled weight. Sorting before every compaction makes the result a
    pure function of the per-level MULTISETS — merge order and
    within-level row order never matter (the run-determinism the
    driver's rerun-diff needs). No rng anywhere: the classic randomized
    parity is replaced by the alternating deterministic one; the rank
    error stays O(log(n/k)/k), pinned empirically in pytest."""
    i = 0
    while i < len(levels):
        if len(levels[i]) >= k:
            s = np.sort(levels[i])
            keep = s[(i & 1):: 2]
            levels[i] = np.empty(0, np.int64)
            if i + 1 == len(levels):
                levels.append(keep)
            else:
                levels[i + 1] = np.concatenate([levels[i + 1], keep])
        i += 1
    return levels


def _kll_rows(levels: list[np.ndarray]) -> pd.DataFrame:
    lvl = np.concatenate(
        [np.full(len(v), i, dtype=np.int64) for i, v in enumerate(levels)]
        or [np.empty(0, np.int64)]
    )
    val = np.concatenate(levels or [np.empty(0, np.int64)])
    return pd.DataFrame({"level": lvl, "value": val.astype(np.int64)})


def kll_sketch(ds, col: str, *, k: int = KLL_K, num_final_blocks: int = 1):
    """Mergeable quantile sketch over an int64 column — the 100-TB
    answer for percentiles, where exact quantiles need a full sort (or
    the two-pass counting doc_len_deciles does at driver scale). One
    streaming pass emits a <= k*log2(n/k)-row partial per batch; the
    semigroup combine is concat-per-level + deterministic compaction,
    so shard sketches (or cluster sketches) merge associatively.
    Returns a one-block Dataset of (level, value) rows — the sketch.

    No SQL mirror: the compaction cascade is inherently procedural
    (see queries.no_oracle_reasons); gated by exactness below capacity,
    an empirical rank-error bound, merge/layout tests, and rerun
    determinism in tests/test_trainops.py."""

    def part(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(np.int64)
        return _kll_rows(_kll_compact([v], k))

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        levels = _kll_from_rows(
            df["level"].to_numpy(np.int64), df["value"].to_numpy(np.int64)
        )
        return _kll_rows(_kll_compact(levels, k))

    parts = ds.map_batches(part, batch_format="pandas")
    return _finalize(parts, combine, num_final_blocks)


def kll_quantiles(sketch: pd.DataFrame, qs_num, qs_den: int = 10) -> pd.DataFrame:
    """Quantile readout: for each q = num/den, the smallest sketch value
    whose cumulative weight reaches ceil(q * W) (lower-quantile rank
    semantics — integer arithmetic end-to-end). Returns (q_num, value)."""
    lvl = sketch["level"].to_numpy(np.int64)
    val = sketch["value"].to_numpy(np.int64)
    w = np.int64(1) << lvl
    order = np.argsort(val, kind="stable")
    val, w = val[order], w[order]
    cum = np.cumsum(w)
    total = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for qn in qs_num:
        if total == 0:
            continue
        rank = max(1, -(-int(qn) * total // qs_den))  # ceil(q*W), >= 1
        pos = int(np.searchsorted(cum, rank))
        out_q.append(int(qn))
        out_v.append(int(val[min(pos, len(val) - 1)]))
    return pd.DataFrame({"q_num": np.array(out_q, dtype=np.int64),
                         "value": np.array(out_v, dtype=np.int64)})


def kll_sketch_grouped(ds, col: str, *, group_cols, k: int = KLL_K,
                       num_partials: int = 64, num_buckets: int = 16):
    """Per-group KLL sketches — the latency-percentile-per-key shape
    (quantiles per tenant / event type / shard) at corpus scale.

    LAYOUT-INDEPENDENT two-stage tree: stage 1 co-partitions rows by
    (group, value-hash sub-bucket) and compacts each cell's FULL
    multiset into a partial sketch; stage 2 merges the <= num_partials
    partial sketches per group. Because every compaction input is a
    pure function of the DATA (never of batch/block boundaries), the
    result is identical across layouts and reruns — per-batch partials
    were measured drifting under Ray's nondeterministic batch
    coalescing. Stage 1 ships raw values once (any exact-multiset
    partial must); stage 2 moves only sketch rows. At fleet scale a
    stage-1 task holds one shuffle bucket of raw (group, value) rows,
    so size ``num_buckets`` to ~rows/2M to bound the per-task heap —
    the exchange itself is the inherent price of layout-independent
    exactness (the per-batch ``kll_sketch`` stays the cheap choice
    when same-layout determinism suffices). Returns a Dataset of
    (group_cols..., level, value) sketch rows; read out with
    :func:`kll_quantiles` per group slice."""
    from .joins import grouped_apply, stable_hash

    group_cols = list(group_cols)

    def empty() -> pd.DataFrame:
        base = {c: pd.Series(dtype=object) for c in group_cols}
        base["level"] = pd.Series(dtype=np.int64)
        base["value"] = pd.Series(dtype=np.int64)
        return pd.DataFrame(base)

    def add_sub(df: pd.DataFrame) -> pd.DataFrame:
        df = df[group_cols + [col]].copy()
        df["__sub"] = (stable_hash(df[col].to_numpy())
                       % np.uint64(num_partials)).astype(np.int64)
        return df

    def per_cell(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for key, g in df.groupby(group_cols + ["__sub"], sort=False):
            rows = _kll_rows(_kll_compact([g[col].to_numpy(np.int64)], k))
            for c, v in zip(group_cols, key[:-1]):
                rows[c] = v
            out.append(rows)
        return pd.concat(out, ignore_index=True) if out else empty()

    def merge_group(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for key, g in df.groupby(group_cols, sort=False):
            levels = _kll_from_rows(g["level"].to_numpy(np.int64),
                                    g["value"].to_numpy(np.int64))
            rows = _kll_rows(_kll_compact(levels, k))
            vals = key if isinstance(key, tuple) else (key,)
            for c, v in zip(group_cols, vals):
                rows[c] = v
            out.append(rows)
        return pd.concat(out, ignore_index=True) if out else empty()

    parts = grouped_apply(
        ds.map_batches(add_sub, batch_format="pandas"),
        group_cols + ["__sub"], per_cell, num_buckets=num_buckets,
    )
    return grouped_apply(parts, group_cols, merge_group,
                         num_buckets=num_buckets)
