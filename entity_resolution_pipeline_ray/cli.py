"""CLI entry point — the ``ray job submit`` surface.

Usage (the only place in the library allowed to own a Ray session):

    python -m entity_resolution_pipeline_ray.cli run \
        --pages /data/pages_parquet --labeled-pairs /data/gt.parquet \
        --workdir /out/run1 [--num-cpus 32] [--synthetic-pages 20000]

Runs the checkpointed ER pipeline (resumable: re-running with the same
--workdir skips completed stages), writes clusters parquet + json/md reports.
Reference analog: ``python main.py --stage all`` (/root/reference/main.py:104-167).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser(prog="entity_resolution_pipeline_ray")
    sub = p.add_subparsers(dest="cmd", required=True)
    run = sub.add_parser("run", help="run the ER pipeline (checkpointed, resumable)")
    run.add_argument("--pages", help="pages parquet file/dir or CSV dir (url, warc_ts, html, text, lang)")
    run.add_argument("--synthetic-pages", type=int, default=0, help="generate N synthetic pages instead of --pages")
    run.add_argument("--labeled-pairs", help="ground-truth pairs parquet/csv (left,right,match)")
    run.add_argument("--workdir", required=True, help="checkpoint + output directory")
    run.add_argument("--num-cpus", type=int, default=0, help="ray.init num_cpus (0 = let Ray decide)")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kw = {"address": "local", "include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(**kw)
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from .config import DEFAULT_CONFIG
    from .pipelines.er import pairwise_f1_against_gold, run_er_pipeline_checkpointed
    from .pipelines.reporting import er_report, save_report
    from .sources.pages import PagesSpec, labeled_pairs_table, pages_dataset
    from .sources.readers import read_labeled_pairs, read_pages

    if args.synthetic_pages:
        spec = PagesSpec(num_pages=args.synthetic_pages, num_shards=max(8, args.synthetic_pages // 1000))
        pages = pages_dataset(spec)
        gt = labeled_pairs_table(spec)
    else:
        if not (args.pages and args.labeled_pairs):
            p.error("--pages and --labeled-pairs are required unless --synthetic-pages is set")
        pages = read_pages(args.pages)
        gt = read_labeled_pairs(args.labeled_pairs)

    os.makedirs(args.workdir, exist_ok=True)
    res, resumed = run_er_pipeline_checkpointed(pages, gt, args.workdir, DEFAULT_CONFIG)
    pw = pairwise_f1_against_gold(res["clusters"], gt)
    rep = er_report(res, pw)
    save_report(rep, os.path.join(args.workdir, "report.json"), os.path.join(args.workdir, "report.md"))
    print(
        json.dumps(
            {
                "workdir": args.workdir,
                "resumed_stages": [k for k, v in resumed.items() if v],
                "pairwise_f1": pw["f1"],
                "n_clusters": rep["clusters"]["n_clusters"],
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
