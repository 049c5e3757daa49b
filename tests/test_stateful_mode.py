"""Physical-plan equivalence: the crawl loop's stateful stages
(fetch / extract / image-rows) must produce identical results whether
they run as Ray Data actor pools (the 100-TB plan) or as per-worker-
process cached tasks (the small-epoch fast path, runtime.task_stage).

Auto mode routes fixture-scale epochs to tasks, so without this test
the actors path would lose coverage entirely."""

from __future__ import annotations

import pyarrow.compute as pc

from heroshi_ray.fixtures import write_fixture_dir
from heroshi_ray.sources.io import read_epoch_tables


def _run(paths, wd, mode):
    from heroshi_ray.pipelines.crawl import Crawler, CrawlConfig

    cfg = CrawlConfig(epoch_budget=48, max_epochs=4, stateful_mode=mode)
    crawler = Crawler(paths, wd, cfg)
    report = crawler.run()
    order = crawler.schedule_order().to_pandas()
    order = order.sort_values(["sched_epoch", "rank"], kind="mergesort")
    adm = read_epoch_tables(wd, "admitted_log")
    admitted = sorted(adm.column("surt").to_pylist()) if adm is not None else []
    crawler.shutdown()
    return report, list(zip(order["host"], order["url"])), admitted


def test_actor_and_task_modes_identical(ray_session, tmp_path_factory):
    fx = str(tmp_path_factory.mktemp("fx_mode"))
    paths = write_fixture_dir(fx, n_hosts=4, n_pages=40, n_images=12, n_seeds=6, seed=7)

    rep_t, order_t, adm_t = _run(
        paths, str(tmp_path_factory.mktemp("wd_tasks")), "tasks"
    )
    rep_a, order_a, adm_a = _run(
        paths, str(tmp_path_factory.mktemp("wd_actors")), "actors"
    )

    assert order_t == order_a
    assert adm_t == adm_a
    assert rep_t.fetch_ok == rep_a.fetch_ok
    assert rep_t.fetch_err == rep_a.fetch_err
    assert rep_t.urls_admitted == rep_a.urls_admitted
