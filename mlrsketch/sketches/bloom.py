"""Bloom filter for set membership (seen-URL dedup).

Replaces Miller's exact `uniq -a` whole-record dedupe map (reference:
/root/reference/pkg/transformers/uniq.go:391-425) with a fixed-size bit
array for membership at 10^12-row scale.

Guarantee (Bloom 1970): with m bits, k hash functions and n inserted
items, false-positive rate ~= (1 - e^{-kn/m})^k; no false negatives.
Merge = bitwise OR (associative, commutative, bit-identical).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from mlrsketch.sketches.hashing import kirsch_mitzenmacher, to_u64

_MAGIC = b"BLM1"


class BloomFilter:
    __slots__ = ("n_bits", "n_hashes", "bits", "n_inserted")

    def __init__(
        self,
        n_bits: int = 1 << 20,
        n_hashes: int = 7,
        bits: np.ndarray | None = None,
        n_inserted: int = 0,
    ):
        if n_bits % 8:
            raise ValueError("n_bits must be a multiple of 8")
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.bits = bits if bits is not None else np.zeros(n_bits // 8, dtype=np.uint8)
        self.n_inserted = n_inserted

    @classmethod
    def for_capacity(cls, n: int, fpr: float = 0.01) -> "BloomFilter":
        """Size the filter for n items at the target false-positive rate:
        m = -n ln p / (ln 2)^2, k = (m/n) ln 2 (standard optimal sizing)."""
        m = int(-n * math.log(fpr) / (math.log(2) ** 2))
        m = max(64, (m + 7) // 8 * 8)
        k = max(1, round(m / n * math.log(2)))
        return cls(n_bits=m, n_hashes=k)

    def add_hashes(self, hashes: np.ndarray) -> None:
        if hashes.size == 0:
            return
        idx = kirsch_mitzenmacher(to_u64(hashes), self.n_hashes, self.n_bits)
        flat = idx.reshape(-1).astype(np.int64)
        np.bitwise_or.at(self.bits, flat >> 3, (1 << (flat & 7)).astype(np.uint8))
        self.n_inserted += int(hashes.size)

    def contains_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership test → bool array."""
        if hashes.size == 0:
            return np.zeros(0, dtype=bool)
        idx = kirsch_mitzenmacher(to_u64(hashes), self.n_hashes, self.n_bits)
        out = np.ones(hashes.shape[0], dtype=bool)
        for i in range(self.n_hashes):
            j = idx[i].astype(np.int64)
            out &= (self.bits[j >> 3] >> (j & 7).astype(np.uint8)) & 1 == 1
        return out

    def expected_fpr(self) -> float:
        """Published bound given current load."""
        return (
            1.0 - math.exp(-self.n_hashes * self.n_inserted / self.n_bits)
        ) ** self.n_hashes

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (other.n_bits, other.n_hashes) != (self.n_bits, self.n_hashes):
            raise ValueError("Bloom shape mismatch")
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        self.n_inserted += other.n_inserted
        return self

    def serialize(self) -> bytes:
        return (
            _MAGIC
            + struct.pack("<QIq", self.n_bits, self.n_hashes, self.n_inserted)
            + self.bits.tobytes()
        )

    @classmethod
    def deserialize(cls, data: bytes) -> "BloomFilter":
        if data[:4] != _MAGIC:
            raise ValueError("not a Bloom state")
        n_bits, n_hashes, n_inserted = struct.unpack_from("<QIq", data, 4)
        bits = np.frombuffer(data[4 + 20 :], dtype=np.uint8).copy()
        return cls(n_bits=n_bits, n_hashes=n_hashes, bits=bits, n_inserted=n_inserted)
