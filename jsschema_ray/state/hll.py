"""HyperLogLog distinct-count sketch (Flajolet et al. 2007, public
algorithm), vectorized with numpy + pandas 64-bit hashing.

Mergeable (elementwise register max), so per-block partials from an actor
pool combine associatively — the scalable substitute for an exact
COUNT(DISTINCT) shuffle at 10^12 rows (SURVEY.md §2.C column statistics).
Default p=14 -> 16 KiB of registers, ~0.81% standard error.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def normalize_zeros(col):
    """-0.0 -> +0.0 for float Arrow arrays (other types pass through).

    `pc.equal(-0.0, 0.0)` is True, but every HASH-based kernel — Acero
    joins, `pc.is_in`, `pc.value_counts`, and `hash64` itself — splits the
    two bit patterns, silently diverging from SQL join / GROUP BY semantics
    (DuckDB matches and merges them). Adding 0.0 canonicalizes:
    -0.0 + 0.0 == +0.0 exactly; every other value (incl. NaN and null) is
    unchanged. Apply to any float column that feeds a hash-based key op."""
    if isinstance(col, (pa.Array, pa.ChunkedArray)) and \
            pa.types.is_floating(col.type):
        import pyarrow.compute as pc

        return pc.add(col, pa.scalar(0.0, col.type))
    return col


#: fixed hash for NULL slots in integer/boolean columns (arbitrary odd
#: constant — collisions with a real value's hash only co-locate them in
#: a partition, they never merge values)
_NULL_HASH = np.uint64(0x9E3779B97F4A7C15)


def hash64(values) -> np.ndarray:
    """Vectorized 64-bit hash of a column (numpy array / pyarrow array /
    pandas Series) -> uint64. pandas' hash_array is deterministic across
    processes (fixed default hash_key).

    BATCH-COMPOSITION INVARIANT (r5 find): a non-null value's hash must
    not depend on whether its batch happens to contain nulls. The naive
    to_pandas() path breaks this for integer/boolean columns — an int64
    batch WITH nulls converts to float64 (5 -> 5.0) or object while a
    null-free batch stays int64, and pd.util.hash_array hashes 5 and
    5.0 differently — so the SAME key could land in different hash
    partitions depending on which rows shared its batch (silent wrong
    merges in every hash-co-partitioned op, double-counts in HLL).
    Integer/boolean arrays with nulls therefore hash their FILLED values
    on the native dtype and overwrite null slots with a fixed sentinel."""
    if isinstance(values, pd.Series):
        # nullable extension dtypes (Int64 etc., dtype.kind still 'i')
        # would round-trip to OBJECT ndarrays and hash on the
        # python-object path — route through arrow so they take the same
        # branch as arrow inputs
        if isinstance(values.dtype, pd.api.extensions.ExtensionDtype):
            values = pa.Array.from_pandas(values)
        else:
            values = values.to_numpy()
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        t = values.type
        if (pa.types.is_integer(t) or pa.types.is_boolean(t)) \
                and values.null_count:
            mask = values.is_null().to_numpy(zero_copy_only=False)
            fill = False if pa.types.is_boolean(t) else 0
            filled = values.fill_null(fill).to_numpy(zero_copy_only=False)
            h = pd.util.hash_array(filled, categorize=False).astype(
                np.uint64)
            h[mask] = _NULL_HASH
            return h
        values = values.to_pandas()
    if isinstance(values, pd.Series):
        values = values.to_numpy()
    if values.dtype.kind in "US":  # numpy unicode/bytes -> object for pandas
        values = values.astype(object)
    return pd.util.hash_array(values, categorize=False).astype(np.uint64)


class HyperLogLog:
    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 14, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    def add_hashes(self, h: np.ndarray) -> None:
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        # sentinel bit caps rho at (64-p)+1 when the low bits are all zero
        rem = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        rho = (64 - self._floorlog2(rem)).astype(np.uint8)
        # numpy >= 1.25 has a fast indexed-loop path for maximum.at
        # (measured 12 ms on 4M values here — a sort+reduceat alternative
        # benched 40x slower)
        np.maximum.at(self.registers, idx, rho)

    @staticmethod
    def _floorlog2(x: np.ndarray) -> np.ndarray:
        # exact floor(log2) for uint64: float64 mantissa can't hold 64 bits,
        # so split into 32-bit halves first
        hi = (x >> np.uint64(32)).astype(np.uint32)
        lo = (x & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        hif = np.floor(np.log2(np.where(hi == 0, 1, hi).astype(np.float64)))
        lof = np.floor(np.log2(np.where(lo == 0, 1, lo).astype(np.float64)))
        return np.where(hi != 0, 32 + hif, lof).astype(np.int64)

    def add(self, values) -> None:
        self.add_hashes(hash64(values))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        regs = self.registers.astype(np.float64)
        e = alpha * m * m / np.sum(np.exp2(-regs))
        if e <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                return m * np.log(m / zeros)  # linear counting, small range
        return float(e)

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "HyperLogLog":
        p = b[0]
        return cls(p, np.frombuffer(b[1:], dtype=np.uint8).copy())
