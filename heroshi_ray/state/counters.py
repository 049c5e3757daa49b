"""A-C — metrics counters actor (SURVEY.md §2.3).

Stages report per-batch counters fire-and-forget (``.add.remote`` with
no ray.get); the driver flushes at epoch commit into the T5 metrics
table. One actor is enough: increments are tiny and batched per block.
"""

from __future__ import annotations

from collections import defaultdict

import ray


@ray.remote(num_cpus=0.05)
class CountersActor:
    def __init__(self):
        self.counts: dict[str, int] = defaultdict(int)

    def add(self, **kv: int) -> None:
        for k, v in kv.items():
            self.counts[k] += int(v)

    def flush(self) -> dict[str, int]:
        out = dict(self.counts)
        self.counts = defaultdict(int)
        return out

    def peek(self) -> dict[str, int]:
        return dict(self.counts)
