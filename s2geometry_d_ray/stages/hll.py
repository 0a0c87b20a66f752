"""HyperLogLog distinct-count sketch as a Ray-Data mergeable aggregate
(Flajolet et al. 2007) — the "novel sketch" slot of the training-data
operator family.

Scale shape: map_batches emits AT MOST m register rows per block
(per-batch partial maxima via np.maximum.at), the only shuffle is a
groupby(register).max over <= m rows per block, and the estimator runs
on the <= m-row merged register table — distinct-counting a 100 TB key
column moves kilobytes.

Exactness story: the hash is md5 digest bytes [8:16] little-endian ==
DuckDB's md5_number_lower (the simhash convention, stages/text.py:370),
register/rho extraction is pure integer arithmetic, and the QUERY
OUTPUT is the register state itself (integer rows) — so the driver
value-hash is exact even though the cardinality estimate is
approximate.  hll_estimate() applies the standard bias-corrected
harmonic mean + linear-counting small-range correction on top.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

M_DEFAULT = 256          # 2^8 registers -> std error ~1.04/sqrt(m) = 6.5%
# exact uint64 powers of two for integer bit-length via searchsorted
_POW2 = (np.uint64(1) << np.arange(64, dtype=np.uint64))


def _reg_bits(m: int) -> int:
    bits = int(m).bit_length() - 1
    if m < 2 or (1 << bits) != m:
        raise ValueError(f"m must be a power of two >= 2, got {m}")
    return bits


def hash_u64(values) -> np.ndarray:
    """md5_number_lower of str(value) per UNIQUE value (md5 has no
    vectorized form; the loop is sub-linear in rows for repeated keys).
    Nulls hash as the empty string (the sibling text.py guards); note
    the DuckDB oracles never see nulls on these key columns."""
    vals = np.asarray(values)
    if vals.dtype == object:
        # None is unorderable (np.unique sorts) — map to "" up front
        vals = np.array(["" if v is None else v for v in vals],
                        dtype=object)
    uniq, inv = np.unique(vals, return_inverse=True)
    md5 = hashlib.md5
    hu = np.fromiter(
        (int.from_bytes(md5(str(v).encode()).digest()[8:16], "little")
         for v in uniq.tolist()),
        dtype=np.uint64, count=len(uniq))
    return hu[inv]


def registers_rho(h: np.ndarray, m: int = M_DEFAULT):
    """(register, rho): register = low log2(m) bits, rho = 1 + leading
    zeros of the remaining (64 - log2(m))-bit value (rho = val_bits + 1
    when it is 0).  Bit length via searchsorted over exact uint64
    powers — no float log2 boundary hazards."""
    bits = _reg_bits(m)
    val_bits = 64 - bits
    reg = (h & np.uint64(m - 1)).astype(np.int64)
    x = h >> np.uint64(bits)
    bitlen = np.searchsorted(_POW2[:val_bits], x, side="right")
    rho = (val_bits + 1 - bitlen).astype(np.int64)
    return reg, rho


def hll_partial_kernel(col: str, m: int = M_DEFAULT):
    """map_batches kernel: per-batch per-register max(rho) — <= m rows
    out per block regardless of batch size."""
    def kernel(batch: pa.Table) -> pa.Table:
        reg, rho = registers_rho(
            hash_u64(batch[col].to_numpy(zero_copy_only=False)), m)
        acc = np.zeros(m, dtype=np.int64)
        np.maximum.at(acc, reg, rho)
        nz = np.nonzero(acc)[0]
        return pa.table({"register": pa.array(nz, pa.int64()),
                         "rho": pa.array(acc[nz], pa.int64())})
    return kernel


def hll_estimate(registers: np.ndarray, rhos: np.ndarray,
                 m: int = M_DEFAULT) -> float:
    """Bias-corrected HLL estimate from the merged register table
    (absent registers are zeros)."""
    full = np.zeros(m, dtype=np.int64)
    full[np.asarray(registers, dtype=np.int64)] = np.asarray(rhos)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-full.astype(np.float64)))
    zeros = int((full == 0).sum())
    if est <= 2.5 * m and zeros > 0:       # linear-counting correction
        est = m * np.log(m / zeros)
    return float(est)
