"""Theta / KMV distinct-value sketch with set operations (union,
intersection, difference).

HLL answers "how many distinct?"; theta sketches additionally answer
"how many distinct IN COMMON?" — the query behind crawl-overlap and
incremental-dedup planning over web corpora ("how many of this crawl's
URLs were already in the last one?"). Miller's exact analogue is
composing `count-distinct` streams externally (reference:
/root/reference/pkg/transformers/uniq.go:27, count_distinct.go); the
sketch gives the same algebra at 10^12-row scale in O(k) state.

Algorithm: the K-Minimum-Values / theta family (Beyer et al., SIGMOD
2007; Dasgupta, Lang, Rhodes, Thaler, "Theta-Sketch Framework" 2016 —
the Apache DataSketches QuickSelect sketch). State = (k, theta,
retained) where `retained` is ALL distinct input hashes < theta,
mapped to uniform uint64. When more than k survive, theta drops to the
(k+1)-th smallest so exactly the k smallest remain. Estimate =
|retained| / (theta / 2^64); relative standard error ~ 1/sqrt(k-1)
in estimation mode and ZERO while theta is still saturated at 1
(fewer than k distinct values seen -> the sketch IS the exact distinct
set — which is what makes small-scale oracle tests hash-exact).

Set operations (Theta-Sketch Framework §3):
  union:      theta = min(thetas); keep all retained < theta; trim to k.
  intersect:  theta = min(thetas); retained_a ∩ retained_b below theta.
  a_not_b:    theta = min(thetas); retained_a \\ retained_b below theta.
Each result is itself a valid theta state, so the algebra composes.

Merge (= union) is associative, commutative, and idempotent at the
BIT level: every state's invariant is "retained = all distinct inputs
below theta", and the final theta is min(all trim thresholds), which
is order-independent — property-tested in tests/test_merge_properties.py.
"""

from __future__ import annotations

import struct

import numpy as np

from mlrsketch.sketches.hashing import to_u64

_MAGIC = b"THS1"
_U64 = np.uint64
_MAX = 0xFFFFFFFFFFFFFFFF  # theta "1.0" (exclusive upper bound)
_SCALE = float(2**64)


class ThetaSketch:
    __slots__ = ("k", "theta", "hashes")

    def __init__(self, k: int = 4096, theta: int = _MAX, hashes: np.ndarray | None = None):
        if k < 16:
            raise ValueError("k must be >= 16")
        self.k = k
        self.theta = int(theta)
        self.hashes = (
            hashes if hashes is not None else np.empty(0, dtype=np.uint64)
        )  # sorted, distinct, all < theta

    # -- update ------------------------------------------------------------
    def update_hashes(self, batch: np.ndarray) -> None:
        """Ingest a batch of 64-bit hashes (int64 from Spark xxhash64)."""
        if batch.size == 0:
            return
        h = to_u64(batch)
        h = h[h < _U64(self.theta)]
        if h.size == 0:
            return
        self.hashes = np.union1d(self.hashes, h)  # sorts + dedupes
        self._trim()

    def _trim(self) -> None:
        if self.hashes.size > self.k:
            # QuickSelect rule: theta <- (k+1)-th smallest, keep k smallest
            self.theta = int(self.hashes[self.k])
            self.hashes = self.hashes[: self.k].copy()

    # -- estimate ----------------------------------------------------------
    @property
    def is_estimation_mode(self) -> bool:
        return self.theta < _MAX

    def estimate(self) -> float:
        return self.hashes.size / (self.theta / _SCALE)

    def error_bound(self) -> float:
        """Relative standard error: 0 in exact mode (theta still 1 and the
        retained set is the full distinct set), else ~1/sqrt(retained-1)
        (Beyer et al. 2007 for KMV; DataSketches publishes the same for
        the theta family, with retained < k after intersections)."""
        if not self.is_estimation_mode:
            return 0.0
        return 1.0 / max(self.hashes.size - 1, 1) ** 0.5

    # -- merge (= set union) -----------------------------------------------
    def merge(self, other: "ThetaSketch") -> "ThetaSketch":
        if other.k != self.k:
            raise ValueError("cannot merge theta sketches of different k")
        self.theta = min(self.theta, other.theta)
        t = _U64(self.theta)
        merged = np.union1d(self.hashes[self.hashes < t], other.hashes[other.hashes < t])
        self.hashes = merged
        self._trim()
        return self

    # -- serde -------------------------------------------------------------
    def serialize(self) -> bytes:
        return (
            _MAGIC
            + struct.pack("<IQI", self.k, self.theta, self.hashes.size)
            + np.ascontiguousarray(self.hashes).tobytes()
        )

    @classmethod
    def deserialize(cls, data: bytes) -> "ThetaSketch":
        if data[:4] != _MAGIC:
            raise ValueError("not a theta-sketch state")
        k, theta, n = struct.unpack_from("<IQI", data, 4)
        hashes = np.frombuffer(data, dtype=np.uint64, count=n, offset=20).copy()
        return cls(k=k, theta=theta, hashes=hashes)


# -- set operations (each returns a NEW valid theta state) ------------------


def theta_union(a: ThetaSketch, b: ThetaSketch) -> ThetaSketch:
    out = ThetaSketch(k=a.k, theta=a.theta, hashes=a.hashes.copy())
    return out.merge(b)


def theta_intersect(a: ThetaSketch, b: ThetaSketch) -> ThetaSketch:
    if a.k != b.k:
        raise ValueError("cannot intersect theta sketches of different k")
    theta = min(a.theta, b.theta)
    t = _U64(theta)
    s = np.intersect1d(a.hashes[a.hashes < t], b.hashes[b.hashes < t])
    return ThetaSketch(k=a.k, theta=theta, hashes=s)


def theta_a_not_b(a: ThetaSketch, b: ThetaSketch) -> ThetaSketch:
    if a.k != b.k:
        raise ValueError("cannot difference theta sketches of different k")
    theta = min(a.theta, b.theta)
    t = _U64(theta)
    s = np.setdiff1d(a.hashes[a.hashes < t], b.hashes[b.hashes < t])
    return ThetaSketch(k=a.k, theta=theta, hashes=s)
