"""HyperLogLog++ distinct-count sketch (sparse list + dense registers).

Replaces Miller's exact `distinct_count` accumulator — an ordered map of
every distinct original string (reference: /root/reference/pkg/
transformers/utils/stats1_accumulators.go:341-365) and `count-distinct`
(pkg/transformers/uniq.go:27) — with a mergeable state that is EXACT
below a threshold and a fixed 2^p-byte dense HLL above it.

Algorithm: Flajolet et al. 2007 (HyperLogLog) with the 64-bit hash and
small-range linear-counting correction from Heule et al. 2013 (HLL++).
Heule §5.2's sparse mode is realized the way Apache DataSketches' HLL
does its coupon list: below `sparse_max` distinct values the state is
the sorted set of raw 64-bit hashes itself, so

  * the estimate is exactly |set| (error_bound 0.0) — low-cardinality
    groups (the long tail of a per-host/per-lang rollup at web scale)
    pay no approximation at all, and
  * merge stays associative at the BIT level even across the
    sparse->dense promotion: the dense registers are a pure function of
    the SET of hashes ever seen (promotion replays the full 64-bit
    hashes), and set union is order-independent.

The empirical bias-correction table of HLL++ is omitted (published
constants, but sparse mode + linear counting cover the regime where it
matters); the dense standard error bound remains sigma = 1.04/sqrt(m).

Memory: sparse holds at most `sparse_max` (default m/4) uint64 hashes
= 2*m bytes worst case vs m bytes dense — the 2x transient is the
price of exactness below threshold, same trade DataSketches makes.

Merge = set union (sparse) / elementwise register max (dense) —
commutative, associative, idempotent, so partial states from any
partitioning of the data combine to the bit-identical state
(property-tested in tests/test_merge_properties.py).
"""

from __future__ import annotations

import struct

import numpy as np

from mlrsketch.sketches.hashing import floor_log2, to_u64

_MAGIC = b"HLL1"  # legacy dense-only payload
_MAGIC2 = b"HLL2"  # mode byte + sparse list or dense registers
_MAGIC3 = b"HLL3"  # HLL2 + persisted sparse_max (non-default thresholds
#                    must survive serde or the two sides of a merge
#                    promote to dense at different points, breaking the
#                    bit-identical-state-across-partitionings property)


class HyperLogLog:
    __slots__ = ("p", "m", "sparse_max", "registers", "sparse")

    def __init__(
        self,
        p: int = 14,
        registers: np.ndarray | None = None,
        sparse: np.ndarray | None = None,
        sparse_max: int | None = None,
    ):
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.sparse_max = self.m // 4 if sparse_max is None else int(sparse_max)
        if registers is not None:
            self.registers = registers
            self.sparse = None
        else:
            self.registers = None
            self.sparse = (
                sparse if sparse is not None else np.empty(0, dtype=np.uint64)
            )  # sorted distinct raw 64-bit hashes

    @property
    def is_sparse(self) -> bool:
        return self.sparse is not None

    # -- dense ingestion ---------------------------------------------------
    def _dense_update(self, h: np.ndarray) -> None:
        p = np.uint64(self.p)
        idx = h >> np.uint64(64 - self.p)
        w = (h << p) & np.uint64(0xFFFFFFFFFFFFFFFF)
        # rho = position of leftmost 1-bit in the remaining 64-p bits, 1-up;
        # all-zero suffix gets 64-p+1.
        rho = np.where(w == 0, 64 - self.p + 1, 64 - floor_log2(np.maximum(w, 1))).astype(
            np.uint8
        )
        np.maximum.at(self.registers, idx.astype(np.int64), rho)

    def _promote(self) -> None:
        """Sparse -> dense: replay the exact hash set into registers."""
        hashes = self.sparse
        self.sparse = None
        self.registers = np.zeros(self.m, dtype=np.uint8)
        if hashes.size:
            self._dense_update(hashes)

    # -- update ------------------------------------------------------------
    def update_hashes(self, hashes: np.ndarray) -> None:
        """Ingest a batch of 64-bit hashes (int64/uint64 numpy array)."""
        if hashes.size == 0:
            return
        h = to_u64(hashes)
        if self.sparse is not None:
            merged = np.union1d(self.sparse, h)  # sorted distinct
            if merged.size <= self.sparse_max:
                self.sparse = merged
                return
            self.sparse = merged
            self._promote()
            return
        self._dense_update(h)

    # -- estimate ----------------------------------------------------------
    def estimate(self) -> float:
        if self.sparse is not None:  # exact mode
            return float(self.sparse.size)
        m = float(self.m)
        if self.m >= 128:
            alpha = 0.7213 / (1.0 + 1.079 / m)
        elif self.m == 16:
            alpha = 0.673
        elif self.m == 32:
            alpha = 0.697
        else:
            alpha = 0.709
        regs = self.registers.astype(np.float64)
        e = alpha * m * m / np.sum(np.exp2(-regs))
        zeros = int(np.count_nonzero(self.registers == 0))
        if e <= 2.5 * m and zeros > 0:  # linear counting (small range)
            return m * np.log(m / zeros)
        return float(self._bias_correct(e))

    def _bias_correct(self, e: float) -> float:
        """HLL++ mid-range bias correction (Heule et al. 2013 §5.2):
        the raw estimator over-estimates by ~1-5% for n <~ 5m; subtract
        the empirically derived mean bias, linearly interpolated at the
        observed raw estimate. The table (sketches/hll_bias.py) is
        GENERATED by scripts/gen_hll_bias.py following the paper's own
        simulation procedure — not transcribed constants."""
        if e > 5.0 * self.m:
            return e
        try:
            from mlrsketch.sketches.hll_bias import BIAS, RAW_KNOTS
        except ImportError:  # generated module absent: raw estimate
            return e
        knots, bias = RAW_KNOTS.get(self.p), BIAS.get(self.p)
        if not knots or e < knots[0] or e > knots[-1]:
            return e
        j = int(np.searchsorted(knots, e))
        if j == 0:
            return e - bias[0]
        frac = (e - knots[j - 1]) / (knots[j] - knots[j - 1])
        return e - (bias[j - 1] + frac * (bias[j] - bias[j - 1]))

    def error_bound(self) -> float:
        """Published standard error: 1.04/sqrt(m) dense, 0 in exact
        sparse mode (the state IS the distinct hash set)."""
        if self.sparse is not None:
            return 0.0
        return 1.04 / (self.m**0.5)

    # -- merge -------------------------------------------------------------
    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("cannot merge HLLs of different precision")
        if self.sparse is not None and other.sparse is not None:
            merged = np.union1d(self.sparse, other.sparse)
            self.sparse = merged
            if merged.size > self.sparse_max:
                self._promote()
            return self
        if self.sparse is not None:
            self._promote()
        if other.sparse is not None:
            if other.sparse.size:
                self._dense_update(other.sparse)
            return self
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    # -- serde -------------------------------------------------------------
    def serialize(self) -> bytes:
        if self.sparse is not None:
            head = _MAGIC3 + struct.pack("<BBII", self.p, 1, self.sparse.size,
                                         self.sparse_max)
            return head + np.ascontiguousarray(self.sparse).tobytes()
        return (_MAGIC3 + struct.pack("<BBII", self.p, 0, 0, self.sparse_max)
                + self.registers.tobytes())

    @classmethod
    def deserialize(cls, data: bytes) -> "HyperLogLog":
        if data[:4] == _MAGIC:  # legacy dense payload
            p = struct.unpack_from("<B", data, 4)[0]
            regs = np.frombuffer(data[5:], dtype=np.uint8).copy()
            return cls(p=p, registers=regs)
        if data[:4] == _MAGIC2:  # pre-sparse_max header (default m/4)
            p, mode, n = struct.unpack_from("<BBI", data, 4)
            off = 4 + struct.calcsize("<BBI")
            sparse_max = None
        elif data[:4] == _MAGIC3:
            p, mode, n, sparse_max = struct.unpack_from("<BBII", data, 4)
            off = 4 + struct.calcsize("<BBII")
        else:
            raise ValueError("not an HLL state")
        if mode == 1:
            sparse = np.frombuffer(data[off : off + 8 * n], dtype=np.uint64).copy()
            return cls(p=p, sparse=sparse, sparse_max=sparse_max)
        regs = np.frombuffer(data[off:], dtype=np.uint8).copy()
        return cls(p=p, registers=regs, sparse_max=sparse_max)
