"""Count-Min Sketch (Cormode & Muthukrishnan 2005, public algorithm):
approximate frequency table in fixed memory, mergeable by elementwise add —
the frequency analogue of the HLL distinct sketch (state/hll.py).

Guarantees: estimates NEVER underestimate; overestimate ≤ ε·N with
probability 1-δ for width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉. The per-row hashes
are a 2-universal family h(x) = ((a·x + b) mod p) mod width with
p = 2^61-1: the multiply is carried out EXACTLY mod p via 31/30-bit limb
splitting (every partial product fits uint64; 2^61 ≡ 1 and 2^62 ≡ 2 mod p),
so the stated eps/delta bound is justified, not merely empirical. Used for
heavy-hitter estimation (skew detection feeding salting decisions) without
shuffling per-key counts.
"""

from __future__ import annotations

import numpy as np

from jsschema_ray.state.hll import hash64

_MERSENNE = (1 << 61) - 1
_M = np.uint64(_MERSENNE)
_LO31 = np.uint64((1 << 31) - 1)
_LO30 = np.uint64((1 << 30) - 1)


def _mulmod61(a: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Exact a·h mod (2^61-1) for uint64 operands < 2^61, vectorized.

    Split a = a1·2^31 + a0 and h = h1·2^31 + h0 (a1,h1 < 2^30;
    a0,h0 < 2^31). Then a·h = a1h1·2^62 + (a1h0 + a0h1)·2^31 + a0h0,
    where every partial product fits uint64 (max a0h0 < 2^62). With
    p = 2^61-1: 2^62 ≡ 2, and for the cross term m·2^31 reduce m mod p
    first, then split m = m1·2^30 + m0 so m·2^31 = m1·2^61 + m0·2^31
    ≡ m1 + m0·2^31 (m0·2^31 < 2^61). The final sum is < 3·2^61 < 2^64."""
    a1, a0 = a >> np.uint64(31), a & _LO31
    h1, h0 = h >> np.uint64(31), h & _LO31
    cross = ((a1 * h0) % _M + (a0 * h1) % _M) % _M
    c1, c0 = cross >> np.uint64(30), cross & _LO30
    top = (np.uint64(2) * ((a1 * h1) % _M)) % _M
    return (top + c1 + (c0 << np.uint64(31)) + (a0 * h0) % _M) % _M


class CountMinSketch:
    __slots__ = ("width", "depth", "seed", "counts", "_a", "_b", "n")

    def __init__(self, width: int = 2048, depth: int = 5, seed: int = 13,
                 counts: np.ndarray | None = None, n: int = 0):
        self.width = width
        self.depth = depth
        self.seed = seed
        rng = np.random.default_rng(seed)  # same seed -> mergeable partials
        self._a = rng.integers(1, _MERSENNE, size=depth, dtype=np.uint64)
        self._b = rng.integers(0, _MERSENNE, size=depth, dtype=np.uint64)
        self.counts = (counts if counts is not None
                       else np.zeros((depth, width), dtype=np.int64))
        self.n = n

    def _cells(self, h: np.ndarray) -> np.ndarray:
        """(depth, n) column indices for each hashed value."""
        hm = (h % _M).astype(np.uint64)
        vals = (_mulmod61(self._a[:, None], hm[None, :])
                + self._b[:, None]) % _M
        return (vals % np.uint64(self.width)).astype(np.int64)

    def add_hashes(self, h: np.ndarray,
                   weights: np.ndarray | None = None) -> None:
        cells = self._cells(h)
        w = (weights.astype(np.int64) if weights is not None
             else np.ones(len(h), dtype=np.int64))
        for d in range(self.depth):
            np.add.at(self.counts[d], cells[d], w)
        self.n += int(w.sum())

    def add(self, values) -> None:
        self.add_hashes(hash64(values))

    def estimate_hashes(self, h: np.ndarray) -> np.ndarray:
        cells = self._cells(h)
        ests = np.stack([self.counts[d][cells[d]] for d in range(self.depth)])
        return ests.min(axis=0)

    def estimate(self, values) -> np.ndarray:
        return self.estimate_hashes(hash64(values))

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        # different seeds mean different hash params: an elementwise add
        # would produce silently wrong (under-)estimates
        if (self.width, self.depth, self.seed) != (other.width, other.depth,
                                                   other.seed):
            raise ValueError(
                f"cannot merge CountMinSketch(width={other.width}, "
                f"depth={other.depth}, seed={other.seed}) into "
                f"(width={self.width}, depth={self.depth}, seed={self.seed})"
            )
        self.counts += other.counts
        self.n += other.n
        return self

    def to_bytes(self) -> bytes:
        head = np.array([self.width, self.depth, self.n, self.seed],
                        dtype=np.int64)
        return head.tobytes() + self.counts.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "CountMinSketch":
        w, d, n, seed = np.frombuffer(b[:32], dtype=np.int64)
        counts = np.frombuffer(b[32:], dtype=np.int64).reshape(
            int(d), int(w)
        ).copy()
        return cls(width=int(w), depth=int(d), seed=int(seed),
                   counts=counts, n=int(n))
