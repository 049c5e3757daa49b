"""Per-host token buckets — the politeness scheduler state (SURVEY.md §2.3 A-P).

Heroshi's io-worker serializes + delays requests per host
([UPSTREAM-H], reference unavailable); here politeness is a budget
applied per crawl *epoch*: each host accrues tokens at ``1/crawl_delay``
per simulated second, capped at ``burst``, and an epoch may schedule at
most ``floor(tokens)`` URLs for that host. The clock is injected
(epoch index × epoch_seconds) so runs are deterministic and the oracle
crawler (tests/oracle_crawler.py) can replay the identical schedule.
"""

from __future__ import annotations


class TokenBuckets:
    def __init__(self, epoch_seconds: float = 60.0, burst: float = 10.0):
        self.epoch_seconds = float(epoch_seconds)
        self.burst = float(burst)
        self._tokens: dict[str, float] = {}
        self._last: dict[str, float] = {}

    def budget(self, host: str, now_s: float, delay_s: float) -> int:
        """Tokens available for ``host`` at simulated time ``now_s``
        (does not consume)."""
        rate = 1.0 / max(delay_s, 1e-9)
        last = self._last.get(host)
        tokens = self._tokens.get(host, self.burst)
        if last is not None:
            tokens = min(self.burst, tokens + (now_s - last) * rate)
        return int(tokens)

    def consume(self, host: str, now_s: float, delay_s: float, n: int) -> None:
        rate = 1.0 / max(delay_s, 1e-9)
        last = self._last.get(host)
        tokens = self._tokens.get(host, self.burst)
        if last is not None:
            tokens = min(self.burst, tokens + (now_s - last) * rate)
        self._tokens[host] = tokens - n
        self._last[host] = now_s

    # checkpointing
    def state(self) -> dict:
        return {"tokens": dict(self._tokens), "last": dict(self._last),
                "epoch_seconds": self.epoch_seconds, "burst": self.burst}

    @classmethod
    def from_state(cls, s: dict) -> "TokenBuckets":
        tb = cls(s["epoch_seconds"], s["burst"])
        tb._tokens = dict(s["tokens"])
        tb._last = dict(s["last"])
        return tb
