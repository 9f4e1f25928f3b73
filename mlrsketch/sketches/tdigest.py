"""Merging t-digest for quantiles (fully vectorized compression).

Replaces Miller's exact PercentileKeeper — which retains EVERY value and
sorts at emit (reference: /root/reference/pkg/transformers/utils/
percentile_keeper.go:13-83) — with bounded centroid state for
`stats1 -a median,p10,...,p99.9` (pkg/bifs/percentiles.go) at scale.

Algorithm: Dunning & Ertl 2019 ("Computing Extremely Accurate Quantiles
Using t-Digests"), merging variant with the k1 scale function
k(q) = (delta/2pi) * asin(2q-1). Compression is vectorized: sort by
mean, bucket by floor of the k-scale of the midpoint quantile, reduce
each bucket to one weighted centroid (numpy reduceat) — the same
size-limit behavior as the loop form, accuracy ~ O(1/delta) rank error
concentrated at the extremes (q(1-q) factor).

Merge = concatenate centroid lists + recompress. Associative up to
centroid layout; quantile estimates are stable under merge order
(property-tested within rank-error tolerance).
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"TDG1"


class TDigest:
    __slots__ = ("delta", "means", "weights", "vmin", "vmax", "count")

    def __init__(self, delta: int = 200):
        self.delta = delta
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.vmin = np.inf
        self.vmax = -np.inf
        self.count = 0.0

    # -- k1 scale function ---------------------------------------------------
    def _k(self, q: np.ndarray) -> np.ndarray:
        return (self.delta / (2 * np.pi)) * np.arcsin(np.clip(2 * q - 1, -1, 1))

    def _compress(self, means: np.ndarray, weights: np.ndarray) -> None:
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = weights.sum()
        if total <= 0:
            return
        cum = np.cumsum(weights)
        q_mid = (cum - weights / 2) / total
        buckets = np.floor(self._k(q_mid)).astype(np.int64)
        # group-by consecutive equal bucket ids (sorted ⇒ non-decreasing)
        starts = np.flatnonzero(np.r_[True, buckets[1:] != buckets[:-1]])
        wsum = np.add.reduceat(weights, starts)
        msum = np.add.reduceat(means * weights, starts)
        self.means = msum / wsum
        self.weights = wsum
        self.count = float(total)

    # -- update ----------------------------------------------------------------
    def update_batch(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        self.vmin = min(self.vmin, float(v.min()))
        self.vmax = max(self.vmax, float(v.max()))
        means = np.concatenate([self.means, v])
        weights = np.concatenate([self.weights, np.ones(v.size)])
        self._compress(means, weights)

    # -- merge -------------------------------------------------------------
    def merge(self, other: "TDigest") -> "TDigest":
        if other.count == 0:
            return self
        self.vmin = min(self.vmin, other.vmin)
        self.vmax = max(self.vmax, other.vmax)
        means = np.concatenate([self.means, other.means])
        weights = np.concatenate([self.weights, other.weights])
        self._compress(means, weights)
        return self

    # -- query -------------------------------------------------------------
    def quantile(self, q: float) -> float:
        """Estimate the q-quantile (0<=q<=1) by interpolating between
        centroid midpoints, pinned to exact min/max at the tails."""
        if self.count == 0:
            return float("nan")
        n = self.means.size
        if n == 1:
            return float(self.means[0])
        target = q * self.count
        # midpoint cumulative weight of each centroid
        cum = np.cumsum(self.weights) - self.weights / 2
        if target <= cum[0]:
            # interpolate min → first centroid
            frac = target / cum[0] if cum[0] > 0 else 0.0
            return float(self.vmin + frac * (self.means[0] - self.vmin))
        if target >= cum[-1]:
            span = self.count - cum[-1]
            frac = (target - cum[-1]) / span if span > 0 else 1.0
            return float(self.means[-1] + frac * (self.vmax - self.means[-1]))
        j = int(np.searchsorted(cum, target, side="right"))
        c0, c1 = cum[j - 1], cum[j]
        frac = (target - c0) / (c1 - c0) if c1 > c0 else 0.0
        return float(self.means[j - 1] + frac * (self.means[j] - self.means[j - 1]))

    def rank_error_bound(self, q: float = 0.5) -> float:
        """Empirical rank-error envelope for the k1 merging digest:
        ~ 6 * q(1-q) / delta at the quantile q (Dunning & Ertl report
        O(q(1-q)/delta); constant chosen conservatively)."""
        return max(6.0 * q * (1 - q) / self.delta, 1.0 / self.delta)

    # -- serde -------------------------------------------------------------
    def serialize(self) -> bytes:
        head = _MAGIC + struct.pack(
            "<IIddd", self.delta, self.means.size, self.vmin, self.vmax, self.count
        )
        return head + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "TDigest":
        if data[:4] != _MAGIC:
            raise ValueError("not a TDigest state")
        delta, n, vmin, vmax, count = struct.unpack_from("<IIddd", data, 4)
        td = cls(delta=delta)
        off = 4 + struct.calcsize("<IIddd")
        td.means = np.frombuffer(data[off : off + 8 * n], dtype=np.float64).copy()
        td.weights = np.frombuffer(data[off + 8 * n : off + 16 * n], dtype=np.float64).copy()
        td.vmin, td.vmax, td.count = vmin, vmax, count
        return td
