"""heroshi_ray — a Ray-Data-native URL-frontier + fetch-scheduler engine.

A from-scratch reimplementation of the capabilities of temoto/heroshi
(crawler brain: URL frontier, URL-seen set, per-host politeness, robots
handling, crawl ordering) expressed Ray-Data-first:

- every table is a ``ray.data.Dataset`` of Arrow blocks,
- per-record work is vectorized ``map_batches`` over zero-copy Arrow,
- stateful pieces (URL-seen cuckoo shards, robots cache, token buckets)
  live in actor pools,
- wide steps are explicit ``groupby`` / ``sort`` shuffles with documented
  partition keys.

The reference checkout at /root/reference was empty at build time
(SURVEY.md §0); the binding functional spec is /root/repo/BASELINE.json
(north_star / north_rule / input_hint) plus public knowledge of heroshi's
io-worker/manager split.
"""

__version__ = "0.1.0"
