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
    return parts.repartition(num_final_blocks).map_batches(
        combine, batch_size=None, batch_format="pandas"
    ).repartition(1).map_batches(combine, batch_size=None, batch_format="pandas")


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
