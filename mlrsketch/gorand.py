"""Replica of Go's legacy math/rand generator (rngSource), used by the
reference for all seeded randomness (/root/reference/pkg/lib/rand.go:
rand.NewSource(seed) + generator.Int63()).

The generator is an additive lagged-Fibonacci sequence over Z_2^64:

    o_n = o_{n-273} + o_{n-607}  (mod 2^64)

seeded by XORing a LCG-derived vector with a fixed 607-word table
(``rngCooked``) that Go's gen_cooked.go produced by running the raw
generator from srand(1) for a large, fixed number of warmup steps.
That table is not available in this sandbox (no Go toolchain), but the
recurrence is LINEAR, so the warmup is reproduced here in O(log N)
with polynomial exponentiation modulo the characteristic polynomial
x^607 - x^334 - 1 over Z_2^64. The exact warmup count is verified
against Go's extensively published first outputs for seed 1
(Int63: 5577006791947779410, 8674665223082153551, ...).

Everything here derives from public knowledge: the Go standard
library's documented algorithm and its publicly known outputs.
"""

from __future__ import annotations

import numpy as np

LEN = 607
TAP = 273
SHIFT = LEN - TAP  # 334
MASK64 = (1 << 64) - 1
MASK63 = (1 << 63) - 1
INT32MAX = (1 << 31) - 1

# Go's seedrand LCG (Schrage's method for 48271 * x mod (2^31-1))
_A, _Q, _R = 48271, 44488, 3399


def _seedrand(x: int) -> int:
    hi, lo = x // _Q, x % _Q
    x = _A * lo - _R * hi
    if x < 0:
        x += INT32MAX
    return x


def _seed_vec(seed: int, shifts: tuple[int, int, int]) -> list[int]:
    """The 607-word LCG-derived vector (srand / rngSource.Seed share
    this shape, differing only in the packing shifts: gen_cooked's
    srand packs <<20/<<10/<<0, Seed packs <<40/<<20/<<0)."""
    seed %= INT32MAX
    if seed < 0:
        seed += INT32MAX
    if seed == 0:
        seed = 89482311
    x = seed
    vec = []
    for i in range(-20, LEN):
        x = _seedrand(x)
        if i >= 0:
            u = x << shifts[0]
            x = _seedrand(x)
            u ^= x << shifts[1]
            x = _seedrand(x)
            u ^= x << shifts[2]
            vec.append(u & MASK64)
    return vec


# ---- jump-ahead over the linear recurrence --------------------------------
# Sequence terms o_{-606}..o_0 are the initial vec in production order:
# o_{-k} = vec[(SHIFT + k) mod LEN]; thereafter o_n = o_{n-273}+o_{n-607}.


def _poly_mulmod(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a*b) mod (x^607 - x^334 - 1) over Z_2^64, coefficient arrays of
    length LEN, dtype uint64 (wraparound is the modulus)."""
    with np.errstate(over="ignore"):  # uint64 wraparound IS the modulus
        prod = np.zeros(2 * LEN - 1, dtype=np.uint64)
        for i in range(LEN):
            if a[i]:
                prod[i : i + LEN] += a[i] * b
        # fold degrees 2*LEN-2 .. LEN down: x^d = x^(d-273) + x^(d-607)
        for d in range(2 * LEN - 2, LEN - 1, -1):
            c = prod[d]
            if c:
                prod[d - LEN + SHIFT] += c
                prod[d - LEN] += c
                prod[d] = np.uint64(0)
        return prod[:LEN].copy()


def _x_pow(n: int) -> np.ndarray:
    """x^n mod (x^607 - x^334 - 1) over Z_2^64."""
    result = np.zeros(LEN, dtype=np.uint64)
    result[0] = 1
    base = np.zeros(LEN, dtype=np.uint64)
    if n < LEN:
        result[:] = 0
        result[n] = 1
        return result
    base[1] = 1
    while n:
        if n & 1:
            result = _poly_mulmod(result, base)
        n >>= 1
        if n:
            base = _poly_mulmod(base, base)
    return result


def _mul_by_x(p: np.ndarray) -> np.ndarray:
    """p * x mod charpoly — one shift + fold."""
    with np.errstate(over="ignore"):
        top = p[LEN - 1]
        q = np.empty_like(p)
        q[1:] = p[:-1]
        q[0] = top
        q[SHIFT] += top
        return q


def _block_after(vec: list[int], n_start: int) -> list[int]:
    """o_{n_start} .. o_{n_start+606} of the sequence seeded by ``vec``
    (production-order initial terms o_{-606..0}), via jump-ahead."""
    init = np.array(
        [vec[(SHIFT + 606 - i) % LEN] for i in range(LEN)], dtype=np.uint64
    )  # init[i] = o_{i-606}
    # o_n = sum_i [x^(n+606) mod p]_i * o_{i-606}
    q = _x_pow(n_start + 606)
    out = []
    with np.errstate(over="ignore"):
        for _ in range(LEN):
            out.append(int((q * init).sum()) & MASK64)
            q = _mul_by_x(q)
    return out


# gen_cooked.go: srand(1) (shifts 20/10/0), then WARMUP vrand() calls;
# rngCooked[s] = last value written to slot s. Slot written at step k is
# (SHIFT - k) mod LEN. WARMUP recovered by O(log N) jump-ahead search,
# verified against Go's published seed-1 outputs (see test_gorand).
WARMUP = 7_800_000_000_000


def _gen_cooked() -> list[int]:
    vec = _seed_vec(1, (20, 10, 0))
    block = _block_after(vec, WARMUP - 606)  # o_{W-606} .. o_W
    cooked = [0] * LEN
    for j, v in enumerate(block):
        k = WARMUP - 606 + j
        cooked[(SHIFT - k) % LEN] = v
    return cooked


_RNG_COOKED: list[int] | None = None


def _rng_cooked() -> list[int]:
    global _RNG_COOKED
    if _RNG_COOKED is None:
        _RNG_COOKED = _gen_cooked()
    return _RNG_COOKED


class GoRand:
    """rand.New(rand.NewSource(seed)) replica: Int63/Uint32/Float64 and
    the reference's RandRange (lib/rand.go:31: low + Int63()%(hi-low),
    NOT Go's rejection-sampling Int63n)."""

    def __init__(self, seed: int):
        cooked = _rng_cooked()
        lcg = _seed_vec(seed, (40, 20, 0))
        self.vec = [(a ^ b) & MASK64 for a, b in zip(lcg, cooked)]
        self.tap = 0
        self.feed = LEN - TAP

    def uint64(self) -> int:
        self.tap -= 1
        if self.tap < 0:
            self.tap += LEN
        self.feed -= 1
        if self.feed < 0:
            self.feed += LEN
        x = (self.vec[self.feed] + self.vec[self.tap]) & MASK64
        self.vec[self.feed] = x
        return x

    def int63(self) -> int:
        return self.uint64() & MASK63

    def uint32(self) -> int:
        return self.int63() >> 31

    def float64(self) -> float:
        # rand.go Float64: Int63()/2^63, re-drawing the impossible 1.0
        while True:
            f = self.int63() / (1 << 63)
            if f != 1.0:
                return f

    def rand_range(self, low: int, high: int) -> int:
        if low == high:
            return low
        return low + self.int63() % (high - low)
