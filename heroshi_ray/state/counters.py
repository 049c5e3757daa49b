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
    """Increments are idempotent when the reporter passes a content
    token: a Ray-retried fetch task re-reports with the same token and
    the duplicate is dropped (bounded LRU — retries arrive promptly)."""

    REPLAY_MAX = 8192

    def __init__(self):
        from collections import OrderedDict

        self.counts: dict[str, int] = defaultdict(int)
        self._seen: "OrderedDict[bytes, None]" = OrderedDict()

    def add(self, _token: bytes | None = None, **kv: int) -> None:
        if _token is not None:
            if _token in self._seen:
                return
            self._seen[_token] = None
            if len(self._seen) > self.REPLAY_MAX:
                self._seen.popitem(last=False)
        for k, v in kv.items():
            self.counts[k] += int(v)

    def flush(self) -> dict[str, int]:
        out = dict(self.counts)
        self.counts = defaultdict(int)
        # commit point: clear the replay log like SeenShard.save does —
        # a later epoch re-reporting byte-identical content must count
        self._seen.clear()
        return out

    def snapshot(self) -> dict[str, int]:
        return dict(self.counts)

    def restore(self, counts: dict) -> None:
        self.counts = defaultdict(int, {k: int(v) for k, v in counts.items()})

    def peek(self) -> dict[str, int]:
        return dict(self.counts)
