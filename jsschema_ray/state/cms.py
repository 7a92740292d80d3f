"""Count-Min Sketch (Cormode & Muthukrishnan 2005, public algorithm):
approximate frequency table in fixed memory, mergeable by elementwise add —
the frequency analogue of the HLL distinct sketch (state/hll.py).

Guarantees: estimates NEVER underestimate; overestimate ≤ ε·N with
probability 1-δ for width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉. Used for heavy-hitter
estimation (skew detection feeding salting decisions) without shuffling
per-key counts.
"""

from __future__ import annotations

import numpy as np

from jsschema_ray.state.hll import hash64

_MERSENNE = (1 << 61) - 1


class CountMinSketch:
    __slots__ = ("width", "depth", "counts", "_a", "_b", "n")

    def __init__(self, width: int = 2048, depth: int = 5, seed: int = 13,
                 counts: np.ndarray | None = None, n: int = 0):
        self.width = width
        self.depth = depth
        rng = np.random.default_rng(seed)  # same seed -> mergeable partials
        self._a = rng.integers(1, _MERSENNE, size=depth, dtype=np.uint64)
        self._b = rng.integers(0, _MERSENNE, size=depth, dtype=np.uint64)
        self.counts = (counts if counts is not None
                       else np.zeros((depth, width), dtype=np.int64))
        self.n = n

    def _cells(self, h: np.ndarray) -> np.ndarray:
        """(depth, n) column indices for each hashed value."""
        hm = (h % np.uint64(_MERSENNE)).astype(np.uint64)
        vals = (self._a[:, None] * hm[None, :] + self._b[:, None]) % np.uint64(
            _MERSENNE
        )
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
        assert self.width == other.width and self.depth == other.depth
        self.counts += other.counts
        self.n += other.n
        return self

    def to_bytes(self) -> bytes:
        head = np.array([self.width, self.depth, self.n], dtype=np.int64)
        return head.tobytes() + self.counts.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "CountMinSketch":
        w, d, n = np.frombuffer(b[:24], dtype=np.int64)
        counts = np.frombuffer(b[24:], dtype=np.int64).reshape(
            int(d), int(w)
        ).copy()
        return cls(width=int(w), depth=int(d), counts=counts, n=int(n))
