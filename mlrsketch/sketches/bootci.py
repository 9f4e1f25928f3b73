"""Poisson-bootstrap confidence-interval sketch.

The classic bootstrap resamples n rows WITH replacement n_boot times —
impossible to do streaming/distributed without materializing each
group. The Poisson bootstrap (Chamandy et al., "Estimating uncertainty
for massive data streams", Google tech report 2012; also Kleiner et
al.'s BLB line of work) replaces the exact-n draw with an independent
Poisson(1) multiplicity per (row, replicate): each row contributes
c ~ Poisson(1) copies to replicate b, with c derived HERE from a
deterministic splitmix64 hash of (row key, replicate, seed) — so the
"sketch" is just n_boot pairs of running sums:

    state[b] = (sum_b c * value,  sum_b c)          b = 1..n_boot

which is trivially mergeable (elementwise add) and constant-size —
the property that lets CI estimation ride the same partial/final
two-level plan as every other sketch in this library (agg.SketchSpec).
Finalize: replicate means -> empirical lo/hi quantiles around the
plain mean.

Determinism: the multiplicity depends only on (key, b, seed), never on
partitioning or arrival order — re-running at any parallelism draws the
same resamples. The integer replicate counts are exactly associative;
the float value-sums are associative up to summation-order rounding
(property-tested with exact counts + allclose sums in
tests/test_merge_properties.py).

Reference parity: Miller's bootstrap verbs
(/root/reference/pkg/transformers/bootstrap.go:19) draw in-memory
index resamples in one process; this is the shape that survives 10^12
rows.
"""

from __future__ import annotations

import math
import struct

import numpy as np

_MAGIC = b"BCI1"

# Poisson(1) inverse-CDF thresholds scaled to 2^64 (uint64 compare)
_POIS_CDF: list[int] = []
_c = 0.0
for _k in range(11):
    _c += math.exp(-1.0) / math.factorial(_k)
    _POIS_CDF.append(min(int(_c * float(2**64)), 2**64 - 1))
_POIS_T64 = np.array(_POIS_CDF, dtype=np.uint64)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (public splitmix64 constants)."""
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


class BootstrapCI:
    """Mergeable Poisson-bootstrap state for the mean of one value."""

    __slots__ = ("n_boot", "seed", "lo", "hi", "sum_cv", "sum_c", "tot_v", "tot_n")

    def __init__(
        self,
        n_boot: int = 100,
        lo: float = 0.025,
        hi: float = 0.975,
        seed: int = 42,
        sum_cv: np.ndarray | None = None,
        sum_c: np.ndarray | None = None,
        tot_v: float = 0.0,
        tot_n: int = 0,
    ):
        self.n_boot = int(n_boot)
        self.seed = int(seed)
        self.lo, self.hi = float(lo), float(hi)
        self.sum_cv = sum_cv if sum_cv is not None else np.zeros(n_boot, np.float64)
        self.sum_c = sum_c if sum_c is not None else np.zeros(n_boot, np.int64)
        self.tot_v = float(tot_v)
        self.tot_n = int(tot_n)

    def update(self, keys: np.ndarray, values: np.ndarray) -> None:
        """Vectorized ingest: `keys` are uint64 row hashes, `values`
        float64. NaN values are skipped (Miller's absent semantics)."""
        ok = ~np.isnan(values)
        keys, values = to_u64(keys)[ok], values[ok]
        if not keys.size:
            return
        self.tot_v += float(values.sum())
        self.tot_n += int(values.size)
        base = _splitmix64(keys ^ np.uint64(self.seed))
        for b in range(self.n_boot):
            u = _splitmix64(base ^ np.uint64(0xA24BAED4963EE407 + b))
            c = np.searchsorted(_POIS_T64, u, side="right").astype(np.int64)
            self.sum_c[b] += int(c.sum())
            self.sum_cv[b] += float((c * values).sum())

    def merge(self, other: "BootstrapCI") -> "BootstrapCI":
        if (other.n_boot, other.seed) != (self.n_boot, self.seed):
            raise ValueError("cannot merge BootstrapCI with different config")
        self.sum_cv += other.sum_cv
        self.sum_c += other.sum_c
        self.tot_v += other.tot_v
        self.tot_n += other.tot_n
        return self

    def result(self) -> tuple[float, float, float]:
        """(mean, ci_lo, ci_hi) — empirical quantiles of replicate means."""
        if self.tot_n == 0:
            return (float("nan"),) * 3
        nz = self.sum_c > 0
        means = self.sum_cv[nz] / self.sum_c[nz]
        return (
            self.tot_v / self.tot_n,
            float(np.quantile(means, self.lo)),
            float(np.quantile(means, self.hi)),
        )

    # -- serde -------------------------------------------------------------
    def serialize(self) -> bytes:
        head = _MAGIC + struct.pack(
            "<IQddqd", self.n_boot, self.seed, self.lo, self.hi, self.tot_n, self.tot_v
        )
        return head + self.sum_cv.tobytes() + self.sum_c.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "BootstrapCI":
        if data[:4] != _MAGIC:
            raise ValueError("not a BootstrapCI state")
        n_boot, seed, lo, hi, tot_n, tot_v = struct.unpack_from("<IQddqd", data, 4)
        off = 4 + struct.calcsize("<IQddqd")
        sum_cv = np.frombuffer(data[off : off + 8 * n_boot], np.float64).copy()
        sum_c = np.frombuffer(data[off + 8 * n_boot : off + 16 * n_boot], np.int64).copy()
        return cls(n_boot, lo, hi, seed, sum_cv=sum_cv, sum_c=sum_c,
                   tot_v=tot_v, tot_n=tot_n)


def to_u64(a: np.ndarray) -> np.ndarray:
    return a.astype(np.uint64) if a.dtype != np.uint64 else a
