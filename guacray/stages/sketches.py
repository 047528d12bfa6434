"""Mergeable sketches — approximate aggregates for 100 TB-scale stats.

The reference has no approximate aggregates (SURVEY.md §2.7); at
web scale, exact count-distinct over e.g. identifier surfaces is a full
shuffle, so the engine provides the standard mergeable-sketch path: one
sketch per block inside ``map_batches``, merged in a tiny second stage
(ray_guide.md "sketches are designed to be mergeable").

HyperLogLog implemented from the published algorithm (Flajolet et al.
2007, with the standard small-range linear-counting correction).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa


class HLL:
    """HyperLogLog with 2^p registers (p=12 → ~1.6% typical error)."""

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (registers if registers is not None
                          else np.zeros(self.m, dtype=np.uint8))

    def add_hashes(self, hashes: np.ndarray) -> None:
        """hashes: uint64 array."""
        idx = (hashes >> np.uint64(64 - self.p)).astype(np.int64)
        rest = hashes << np.uint64(self.p)
        # rank = leading zeros of remaining bits + 1 (capped)
        nbits = 64 - self.p
        rank = np.full(len(hashes), nbits + 1, dtype=np.uint8)
        found = np.zeros(len(hashes), dtype=bool)
        for b in range(nbits):
            mask = (rest >> np.uint64(63 - b)) & np.uint64(1)
            hit = (~found) & (mask == 1)
            rank[hit] = b + 1
            found |= hit
        np.maximum.at(self.registers, idx, rank)

    def add_strings(self, values) -> None:
        hs = np.array([int.from_bytes(
            hashlib.blake2b(str(v).encode(), digest_size=8).digest(), "big")
            for v in values], dtype=np.uint64)
        if len(hs):
            self.add_hashes(hs)

    def merge(self, other: "HLL") -> "HLL":
        assert self.p == other.p
        return HLL(self.p, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** (-self.registers.astype(np.float64)))
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * math.log(m / zeros)  # linear counting
        return float(est)

    def serialize(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def deserialize(cls, b: bytes) -> "HLL":
        return cls(b[0], np.frombuffer(b[1:], dtype=np.uint8).copy())


def approx_distinct(ds, col: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT col): one HLL per block, merged on
    the driver (sketch bytes only — ~4 KB each, never the data)."""
    def sketch(batch: pa.Table) -> pa.Table:
        h = HLL(p)
        h.add_strings(batch[col].to_pylist())
        return pa.table({"sketch": pa.array([h.serialize()],
                                            type=pa.binary())})

    parts = ds.map_batches(sketch, batch_format="pyarrow",
                           batch_size=None).take_all()
    acc = HLL(p)
    for row in parts:
        acc = acc.merge(HLL.deserialize(row["sketch"]))
    return acc.estimate()


# ------------------------------------------------------ quantiles

def weighted_quantile_cont(values: np.ndarray, counts: np.ndarray,
                           q: float) -> float:
    """Exact quantile_cont over a value histogram.

    Equivalent to ``np.percentile(np.repeat(values, counts), q*100)``
    (linear interpolation, DuckDB quantile_cont semantics) but computed
    from (value, count) pairs — O(#distinct) instead of O(N).  This is
    the exact scale path for LOW-cardinality columns: the histogram is
    a mergeable algebraic aggregate, so no task ever sees a full group.
    """
    order = np.argsort(values, kind="stable")
    v = np.asarray(values, dtype=np.float64)[order]
    c = np.asarray(counts, dtype=np.int64)[order]
    n = int(c.sum())
    if n == 0:
        return float("nan")
    pos = q * (n - 1)                      # 0-indexed rank, fractional
    lo_rank = int(np.floor(pos))
    frac = pos - lo_rank
    cum = np.cumsum(c)                     # cum[i] = #items ≤ v[i]
    lo_i = int(np.searchsorted(cum, lo_rank + 1))
    lo = v[lo_i]
    if frac == 0.0:
        return float(lo)
    hi_i = int(np.searchsorted(cum, lo_rank + 2))
    hi = v[hi_i]
    return float(lo + (hi - lo) * frac)


class KLL:
    """Deterministic KLL quantile sketch (Karnin–Lang–Liberty 2016).

    The mergeable-quantile path for HIGH-cardinality columns, where the
    exact histogram would itself be O(distinct).  Standard compactor
    hierarchy: level i holds items of weight 2^i; a full level sorts
    and promotes every other item.  The classic algorithm flips a coin
    for the even/odd offset; this implementation alternates a per-level
    flag instead, trading a provable-in-expectation bound for exact
    reproducibility (same inputs ⇒ same sketch on any worker — the
    determinism contract every stage in this engine keeps).

    Error: rank error ≲ 3/k · N in practice (property-tested).
    """

    def __init__(self, k: int = 200):
        self.k = k
        self.compactors: list[list[float]] = [[]]
        self.offsets: list[bool] = [False]
        self.n = 0

    def _capacity(self, level: int) -> int:
        height = len(self.compactors)
        return max(2, int(self.k * (2.0 / 3.0) ** (height - 1 - level)))

    def _grow(self) -> None:
        self.compactors.append([])
        self.offsets.append(False)

    def _size(self) -> int:
        return sum(len(c) for c in self.compactors)

    def _max_size(self) -> int:
        return sum(self._capacity(i) for i in range(len(self.compactors)))

    def _compress(self) -> None:
        while self._size() >= self._max_size():
            for i, c in enumerate(self.compactors):
                if len(c) >= self._capacity(i):
                    if i + 1 == len(self.compactors):
                        self._grow()
                    c.sort()
                    start = 1 if self.offsets[i] else 0
                    self.offsets[i] = not self.offsets[i]
                    self.compactors[i + 1].extend(c[start::2])
                    self.compactors[i] = []
                    break
            else:
                break

    def add(self, value: float) -> None:
        self.compactors[0].append(float(value))
        self.n += 1
        self._compress()

    def add_many(self, values) -> None:
        for v in values:
            self.compactors[0].append(float(v))
        self.n += len(values)
        self._compress()

    def merge(self, other: "KLL") -> "KLL":
        out = KLL(self.k)
        while len(out.compactors) < max(len(self.compactors),
                                        len(other.compactors)):
            out._grow()
        for src in (self, other):
            for i, c in enumerate(src.compactors):
                out.compactors[i].extend(c)
        out.n = self.n + other.n
        out._compress()
        return out

    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for i, c in enumerate(self.compactors):
            vals.extend(c)
            wts.extend([1 << i] * len(c))
        return np.asarray(vals, dtype=np.float64), np.asarray(wts, dtype=np.int64)

    def quantile(self, q: float) -> float:
        v, w = self._weighted_items()
        if len(v) == 0:
            return float("nan")
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        cum = np.cumsum(w)
        target = q * cum[-1]
        return float(v[int(np.searchsorted(cum, target, side="left"))
                       if target > 0 else 0])

    def serialize(self) -> bytes:
        import pickle
        return pickle.dumps((self.k, self.n, self.offsets, self.compactors))

    @classmethod
    def deserialize(cls, b: bytes) -> "KLL":
        import pickle
        k, n, offsets, compactors = pickle.loads(b)
        s = cls(k)
        s.n, s.offsets, s.compactors = n, offsets, compactors
        return s


def approx_quantiles(ds, col: str, qs: list[float], k: int = 200) -> list[float]:
    """Approximate quantiles of ``col``: one KLL per block inside
    ``map_batches``, merged on the driver (sketch bytes only — the HLL
    pattern; never the data)."""
    def sketch(batch: pa.Table) -> pa.Table:
        s = KLL(k)
        s.add_many(batch[col].to_numpy(zero_copy_only=False))
        return pa.table({"sketch": pa.array([s.serialize()],
                                            type=pa.binary())})

    parts = ds.map_batches(sketch, batch_format="pyarrow",
                           batch_size=None).take_all()
    acc = KLL(k)
    for row in parts:
        acc = acc.merge(KLL.deserialize(row["sketch"]))
    return [acc.quantile(q) for q in qs]


# ---------------------------------------------------------- Bloom filter

class Bloom:
    """Vectorized Bloom filter (double hashing, no false negatives).

    The broadcast pre-filter for big-big semi/anti joins: at 100 TB the
    right side's distinct keys don't fit a broadcast array, but ~1.2 MB
    of Bloom bits per million keys (1% fp) does — rows that are
    definitely-not-members skip the exact hash join entirely.  Built
    per block inside ``map_batches`` and OR-merged (bits only) like the
    HLL sketch.
    """

    _KEY2 = "guacbloomsecond!"  # 16-char alt key for the second hash

    def __init__(self, m_bits: int, k: int, bits: np.ndarray | None = None):
        self.m = int(m_bits)
        self.k = int(k)
        self.bits = (bits if bits is not None
                     else np.zeros((self.m + 7) // 8, dtype=np.uint8))

    @classmethod
    def for_capacity(cls, n: int, fp_rate: float = 0.01) -> "Bloom":
        n = max(1, n)
        m = int(np.ceil(-n * np.log(fp_rate) / (np.log(2) ** 2)))
        k = max(1, round(m / n * np.log(2)))
        return cls(m, k)

    def _hashes(self, values) -> tuple[np.ndarray, np.ndarray]:
        import pandas as pd
        arr = np.asarray(values)
        h1 = pd.util.hash_array(arr)
        h2 = pd.util.hash_array(arr, hash_key=self._KEY2) | np.uint64(1)
        return h1, h2

    def add_array(self, values) -> None:
        if len(values) == 0:
            return
        h1, h2 = self._hashes(values)
        for i in range(self.k):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(self.m)
            np.bitwise_or.at(self.bits, (idx >> np.uint64(3)).astype(np.int64),
                             (1 << (idx & np.uint64(7))).astype(np.uint8))

    def contains_array(self, values) -> np.ndarray:
        if len(values) == 0:
            return np.zeros(0, dtype=bool)
        h1, h2 = self._hashes(values)
        out = np.ones(len(h1), dtype=bool)
        for i in range(self.k):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(self.m)
            byte = self.bits[(idx >> np.uint64(3)).astype(np.int64)]
            out &= (byte >> (idx & np.uint64(7)).astype(np.uint8)) & 1 > 0
        return out

    def merge(self, other: "Bloom") -> "Bloom":
        assert self.m == other.m and self.k == other.k
        return Bloom(self.m, self.k, np.bitwise_or(self.bits, other.bits))

    def serialize(self) -> bytes:
        import struct
        return struct.pack("<qq", self.m, self.k) + self.bits.tobytes()

    @classmethod
    def deserialize(cls, b: bytes) -> "Bloom":
        import struct
        m, k = struct.unpack("<qq", b[:16])
        return cls(m, k, np.frombuffer(b[16:], dtype=np.uint8).copy())


def build_bloom(ds, col: str, capacity: int, fp_rate: float = 0.01,
                fan_in: int = 8) -> Bloom:
    """Distributed Bloom build: one filter per block (same (m,k) from
    the shared capacity), OR-merged — bits only, never the keys.

    Unlike the 4 KB HLL, a big-capacity Bloom is megabytes, so
    driver-collecting one sketch PER BLOCK would be blocks × m bits at
    100 TB.  A tree-reduce level first ORs the per-block sketches down
    to ``fan_in`` partials inside the cluster; only those reach the
    driver."""
    proto = Bloom.for_capacity(capacity, fp_rate)

    def sketch(batch: pa.Table) -> pa.Table:
        b = Bloom(proto.m, proto.k)
        b.add_array(batch[col].to_numpy(zero_copy_only=False))
        return pa.table({"sketch": pa.array([b.serialize()],
                                            type=pa.binary())})

    def combine(batch: pa.Table) -> pa.Table:
        acc = Bloom(proto.m, proto.k)
        for s in batch["sketch"].to_pylist():
            acc = acc.merge(Bloom.deserialize(s))
        return pa.table({"sketch": pa.array([acc.serialize()],
                                            type=pa.binary())})

    parts = ds.map_batches(sketch, batch_format="pyarrow",
                           batch_size=None) \
        .repartition(fan_in) \
        .map_batches(combine, batch_format="pyarrow", batch_size=None) \
        .take_all()
    acc = Bloom(proto.m, proto.k)
    for row in parts:
        acc = acc.merge(Bloom.deserialize(row["sketch"]))
    return acc
