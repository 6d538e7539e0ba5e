"""Mergeable sketches expressed Ray-Data-first: each batch reduces to
a small fixed-size summary, summaries merge by an associative
elementwise op (max / or / add), the driver or a tiny final stage
finishes the estimate. At any scale the shuffle/driver payload is
#batches × sketch-size bytes, independent of input cardinality.

- HyperLogLog (public Flajolet et al. design): distinct counts,
  registers merge by max.
- Bloom filter (public Bloom '70; Kirsch–Mitzenmacher double hashing):
  membership prefilter, bit arrays merge by OR. Used by
  ``semi_join_bloom`` to prune the probe side with a ~hundred-KB
  broadcast instead of shipping the full build-side key set.
- Log-binned quantile histogram: bounded-relative-error quantiles,
  bin-count vectors merge by add. The scale path for
  ``quantiles_by_type`` when per-group exact sort is too wide.

Deterministic: blake2b / splitmix64 key hashing, no RNG.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

HLL_P = 12  # 4096 registers → ~1.6% standard error
_M = 1 << HLL_P


def hll_partial(batch: pa.Table, column: str) -> pa.Table:
    """One batch → one row holding the batch's register array."""
    regs = np.zeros(_M, dtype=np.uint8)
    vals = batch.column(column).to_pylist()
    if vals:
        h = np.fromiter(
            (
                int.from_bytes(
                    hashlib.blake2b(str(v).encode(), digest_size=8).digest(),
                    "little",
                )
                for v in set(vals)
            ),
            dtype=np.uint64,
        )
        idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
        rest = (h << np.uint64(HLL_P)) | np.uint64((1 << HLL_P) - 1)
        # rank = leading zeros of the remaining bits + 1 (vectorized via
        # bit length: 64 - floor(log2) — rest has the low bits forced to
        # 1 so log2 is safe and the rank is capped at 64-p+1)
        rank = (
            64 - np.floor(np.log2(rest.astype(np.float64))).astype(np.int64)
        ).clip(1, 64 - HLL_P + 1).astype(np.uint8)
        np.maximum.at(regs, idx, rank)
    return pa.table({"regs": pa.array([regs], pa.list_(pa.uint8(), _M))})


def hll_merge(partials: list[np.ndarray]) -> np.ndarray:
    out = np.zeros(_M, dtype=np.uint8)
    for p in partials:
        np.maximum(out, p, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with the small-range (linear counting)
    correction."""
    m = float(_M)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


# =====================================================================
# Bloom filter over int64 keys (vectorized splitmix64 + double hashing)
# =====================================================================

BLOOM_BITS = 1 << 20  # 128 KiB broadcast payload
BLOOM_K = 7           # ~optimal for n ≈ m·ln2/k ≈ 1e5 keys; FP ≈ 0.8%


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Public splitmix64 finalizer (Steele et al.), vectorized uint64."""
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _bloom_positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via Kirsch–Mitzenmacher double hashing:
    pos_i = (h1 + i·h2) mod m with h2 forced odd."""
    x = keys.astype(np.uint64)
    h1 = _splitmix64(x)
    h2 = _splitmix64(h1) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(
            np.int64
        )


def bloom_partial(keys: np.ndarray, m_bits: int = BLOOM_BITS, k: int = BLOOM_K) -> np.ndarray:
    """One key batch → packed bit array (uint8[m/8]); merge by OR."""
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    if len(keys):
        pos = _bloom_positions(np.asarray(keys), m_bits, k).ravel()
        np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    return bits


def bloom_merge(partials: list[np.ndarray]) -> np.ndarray:
    out = np.zeros_like(partials[0])
    for p in partials:
        np.bitwise_or(out, p, out=out)
    return out


def bloom_contains(
    bits: np.ndarray, keys: np.ndarray, m_bits: int = BLOOM_BITS, k: int = BLOOM_K
) -> np.ndarray:
    """Vectorized membership probe: True = possibly present (FP-prone),
    False = definitely absent (exact)."""
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    pos = _bloom_positions(np.asarray(keys), m_bits, k)
    hit = (bits[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
    return hit.all(axis=1)


# =====================================================================
# Log-binned quantile histogram (bounded relative error, merge by add)
# =====================================================================

QH_BINS = 2048
QH_LO = 1e-4    # values clamp into [QH_LO, QH_HI); one underflow bin at 0
QH_HI = 1e7
_QH_LOG_LO = np.log(QH_LO)
_QH_SCALE = QH_BINS / (np.log(QH_HI) - _QH_LOG_LO)
#: per-bin relative width: quantile estimates are within one bin edge,
#: i.e. a multiplicative factor of exp(1/_QH_SCALE) ≈ 1.0124
QH_REL_ERR = float(np.exp(1.0 / _QH_SCALE) - 1.0)


def qh_partial(values: np.ndarray) -> np.ndarray:
    """One value batch → int64[QH_BINS+1] bin counts (bin 0 holds
    values < QH_LO, including zeros)."""
    counts = np.zeros(QH_BINS + 1, dtype=np.int64)
    v = np.asarray(values, dtype=np.float64)
    v = v[np.isfinite(v)]
    if len(v):
        small = v < QH_LO
        counts[0] = int(small.sum())
        vv = v[~small]
        idx = np.clip(
            (np.log(vv) - _QH_LOG_LO) * _QH_SCALE, 0, QH_BINS - 1
        ).astype(np.int64) + 1
        np.add.at(counts, idx, 1)
    return counts


def qh_merge(partials: list[np.ndarray]) -> np.ndarray:
    out = np.zeros(QH_BINS + 1, dtype=np.int64)
    for p in partials:
        out += p
    return out


def qh_quantile(counts: np.ndarray, q: float) -> float:
    """Type-1 discrete quantile over the histogram: the upper edge of
    the bin containing the ceil(q·n)-th value — within QH_REL_ERR of
    the exact quantile for values ≥ QH_LO."""
    n = int(counts.sum())
    if n == 0:
        return float("nan")
    target = max(1, int(np.ceil(q * n)))
    cum = np.cumsum(counts)
    b = int(np.searchsorted(cum, target))
    if b == 0:
        return QH_LO
    return float(np.exp(_QH_LOG_LO + b / _QH_SCALE))
