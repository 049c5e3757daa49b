"""A-P — per-host politeness scheduler state as an actor pool (SURVEY.md §2.3).

Replaces heroshi io-worker's per-host connection-limit + delay
([UPSTREAM-H], reference unavailable) with token buckets sharded by
``hash64(host) % n_shards``. Deterministic: the simulated clock is
``epoch_index × epoch_seconds``, so the oracle crawler replays the
identical budget sequence.
"""

from __future__ import annotations

import numpy as np

import ray

from ..functions.hashing import hash64
from .tokenbucket import TokenBuckets


@ray.remote(num_cpus=0.1)
class PolitenessShard:
    def __init__(self, epoch_seconds: float, burst: float):
        self.tb = TokenBuckets(epoch_seconds, burst)

    def budgets(self, hosts: list[str], now_s: float, delays: list[float]) -> list[int]:
        return [self.tb.budget(h, now_s, d) for h, d in zip(hosts, delays)]

    def consume(self, hosts: list[str], now_s: float, delays: list[float],
                counts: list[int]) -> None:
        for h, d, c in zip(hosts, delays, counts):
            if c > 0:
                self.tb.consume(h, now_s, d, c)

    def state(self) -> dict:
        return self.tb.state()

    def load_state(self, s: dict) -> None:
        self.tb = TokenBuckets.from_state(s)


class PolitenessPool:
    def __init__(self, n_shards: int = 4, epoch_seconds: float = 60.0, burst: float = 10.0):
        self.n_shards = n_shards
        self.epoch_seconds = epoch_seconds
        self.burst = burst
        self.shards = [
            PolitenessShard.remote(epoch_seconds, burst) for _ in range(n_shards)
        ]

    def _route(self, hosts: list[str]) -> np.ndarray:
        return (hash64(hosts) % np.uint64(self.n_shards)).astype(np.int64)

    def budgets(self, hosts: list[str], now_s: float, delays: list[float]) -> dict[str, int]:
        if not hosts:
            return {}
        sh = self._route(hosts)
        refs, idxs = [], []
        for s in np.unique(sh):
            idx = np.flatnonzero(sh == s)
            refs.append(
                self.shards[int(s)].budgets.remote(
                    [hosts[i] for i in idx], now_s, [delays[i] for i in idx]
                )
            )
            idxs.append(idx)
        out: dict[str, int] = {}
        for idx, res in zip(idxs, ray.get(refs)):
            for i, b in zip(idx, res):
                out[hosts[i]] = b
        return out

    def consume(self, counts: dict[str, int], now_s: float, delays: dict[str, float]) -> None:
        if not counts:
            return
        hosts = list(counts)
        sh = self._route(hosts)
        refs = []
        for s in np.unique(sh):
            idx = np.flatnonzero(sh == s)
            hh = [hosts[i] for i in idx]
            refs.append(
                self.shards[int(s)].consume.remote(
                    hh, now_s, [delays[h] for h in hh], [counts[h] for h in hh]
                )
            )
        ray.get(refs)

    def state(self) -> list[dict]:
        return ray.get([s.state.remote() for s in self.shards])

    def load_state(self, states: list[dict]) -> None:
        ray.get([s.load_state.remote(st) for s, st in zip(self.shards, states)])

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []
