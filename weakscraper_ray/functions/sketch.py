"""Cardinality sketches (HyperLogLog — the public Flajolet et al.
design) expressed Ray-Data-first: each batch reduces to a fixed
2^p-register summary, summaries merge by elementwise max (associative
and order-independent), the driver finishes the estimate. At any scale
the shuffle/driver payload is #batches × 2^p bytes, independent of key
cardinality — the bounded-memory counterpart of the exact
distinct-count query.

Deterministic: blake2b key hashing, no RNG.
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
