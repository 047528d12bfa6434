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
