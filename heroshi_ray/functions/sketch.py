"""Mergeable sketches for 10^10-scale reporting (SURVEY.md §2.5 G5).

HyperLogLog (Flajolet et al. '07, dense 2^p registers): each map task
emits ONE serialized sketch per batch; a tiny final stage merges them —
the shuffle moves kilobytes instead of the key column. Deterministic
given deterministic input hashing (SipHash64).
"""

from __future__ import annotations

import numpy as np


class HyperLogLog:
    def __init__(self, p: int = 14):
        if not 4 <= p <= 18:
            raise ValueError("p in [4,18]")
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, keys: np.ndarray) -> None:
        """keys: uint64 hashes (already well-mixed)."""
        keys = np.asarray(keys, dtype=np.uint64)
        idx = (keys >> np.uint64(64 - self.p)).astype(np.int64)
        rest = keys << np.uint64(self.p)  # remaining bits, top-aligned
        # rank = position of first 1-bit in the remaining 64-p bits, 1-based
        nz = rest != 0
        lead = np.full(len(keys), 64 - self.p + 1, dtype=np.uint8)
        if nz.any():
            r = rest[nz]
            # clz via float64 exponent: floor(log2) is exact for the top
            # 53 bits; a ±1 rank slip on 2^53-boundary values is far below
            # HLL's inherent error and fully deterministic
            bl = np.floor(np.log2(r.astype(np.float64))).astype(np.int64) + 1
            lead[nz] = np.clip(64 - bl + 1, 1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, lead)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("p mismatch")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.ldexp(1.0, -self.registers.astype(np.int64))
        e = alpha * m * m / inv.sum()
        if e <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                e = m * np.log(m / zeros)  # linear counting
        return float(e)

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "HyperLogLog":
        h = cls(b[0])
        h.registers = np.frombuffer(b[1:], dtype=np.uint8).copy()
        return h
