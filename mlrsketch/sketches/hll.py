"""HyperLogLog++ distinct-count sketch (dense registers, numpy).

Replaces Miller's exact `distinct_count` accumulator — an ordered map of
every distinct original string (reference: /root/reference/pkg/
transformers/utils/stats1_accumulators.go:341-365) and `count-distinct`
(pkg/transformers/uniq.go:27) — with a fixed 2^p-byte mergeable state.

Algorithm: Flajolet et al. 2007 (HyperLogLog) with the 64-bit hash and
small-range linear-counting correction from Heule et al. 2013 (HLL++).
The empirical bias-correction table of HLL++ is omitted (published
constants, but linear counting already covers the regime our tests hit);
the standard error bound remains sigma = 1.04 / sqrt(m).

Merge = elementwise register max — commutative, associative, idempotent,
so partial states from any partitioning of the data combine to the
bit-identical dense state.
"""

from __future__ import annotations

import struct

import numpy as np

from mlrsketch.sketches.hashing import floor_log2, to_u64

_MAGIC = b"HLL1"


class HyperLogLog:
    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 14, registers: np.ndarray | None = None):
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    # -- update ------------------------------------------------------------
    def update_hashes(self, hashes: np.ndarray) -> None:
        """Ingest a batch of 64-bit hashes (int64/uint64 numpy array)."""
        if hashes.size == 0:
            return
        h = to_u64(hashes)
        p = np.uint64(self.p)
        idx = h >> np.uint64(64 - self.p)
        w = (h << p) & np.uint64(0xFFFFFFFFFFFFFFFF)
        # rho = position of leftmost 1-bit in the remaining 64-p bits, 1-up;
        # all-zero suffix gets 64-p+1.
        rho = np.where(w == 0, 64 - self.p + 1, 64 - floor_log2(np.maximum(w, 1))).astype(
            np.uint8
        )
        np.maximum.at(self.registers, idx.astype(np.int64), rho)

    # -- estimate ----------------------------------------------------------
    def estimate(self) -> float:
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
        return float(e)

    def error_bound(self) -> float:
        """Published standard error: 1.04 / sqrt(m)."""
        return 1.04 / (self.m**0.5)

    # -- merge -------------------------------------------------------------
    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("cannot merge HLLs of different precision")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    # -- serde -------------------------------------------------------------
    def serialize(self) -> bytes:
        return _MAGIC + struct.pack("<B", self.p) + self.registers.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "HyperLogLog":
        if data[:4] != _MAGIC:
            raise ValueError("not an HLL state")
        p = struct.unpack_from("<B", data, 4)[0]
        regs = np.frombuffer(data[5:], dtype=np.uint8).copy()
        return cls(p=p, registers=regs)
