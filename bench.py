"""Benchmark harness: headline ER pipeline + representative operator pipelines.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec", "queries": {...},
   "sf": ..., "num_cpus": N, "er_pages_per_sec": ...}

Environment: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS
(default 32).  This script OWNS its Ray session (the library never inits).

--scaling: runs the headline ER job twice in fresh subprocesses at N=2 and
4N=8 CPUs on identical input and reports both throughputs + scaling
efficiency.  On this sandbox ~8 hardware threads are actually usable (the
1->4 worker multiprocessing probe scales at ~0.96 efficiency; beyond 8 the
curve is flat), so 2->8 is the honest 4x pair; a 32-logical-CPU run on the
same box measures oversubscription, not scaling.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
ER_PAGES = int(os.environ.get("GRAFT_ER_PAGES", "20000"))

ORACLE_QUERIES = [
    "q1_pricing_summary",
    "q_events_hourly",
    "t_string_counts",
    "d_minhash_pairs",
    "s_knn_bruteforce",
    "m_media_features",
]


def _quiet():
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)


def _consume(out) -> int:
    import pandas as pd
    import pyarrow as pa

    if isinstance(out, pd.DataFrame):
        return len(out)
    if isinstance(out, pa.Table):
        return out.num_rows
    return out.count()


def run_er(num_cpus: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False, logging_level="ERROR")
    _quiet()
    from entity_resolution_pipeline_ray.pipelines.er import run_er_on_spec
    from entity_resolution_pipeline_ray.sources.pages import PagesSpec

    spec = PagesSpec(num_pages=ER_PAGES, num_shards=32)
    t0 = time.time()
    res = run_er_on_spec(spec)
    n_clusters_rows = res["clusters"].count()
    dt = time.time() - t0
    ray.shutdown()
    return {"sec": dt, "pages": ER_PAGES, "pages_per_sec": ER_PAGES / dt, "rows": n_clusters_rows}


def run_full() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False, logging_level="ERROR")
    _quiet()
    import __ray_entry__ as E
    from entity_resolution_pipeline_ray.pipelines.er import run_er_on_spec
    from entity_resolution_pipeline_ray.sources.pages import PagesSpec

    queries: dict[str, float] = {}

    spec = PagesSpec(num_pages=ER_PAGES, num_shards=32)
    t0 = time.time()
    res = run_er_on_spec(spec)
    res["clusters"].count()
    er_sec = time.time() - t0
    queries[f"er_pipeline_{ER_PAGES}_pages"] = round(er_sec, 2)

    qmap = E.queries()
    # warm the page cache so per-query numbers measure compute + shuffle
    for name in ORACLE_QUERIES:
        _consume(qmap[name](SF_DIR))
    for name in ORACLE_QUERIES:
        t0 = time.time()
        _consume(qmap[name](SF_DIR))
        queries[name] = round(time.time() - t0, 2)
    ray.shutdown()
    return {
        "metric": f"ER end-to-end sec on {ER_PAGES} synthetic pages (planted clusters) + operator pipelines at {SF_DIR}",
        "value": round(er_sec, 2),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").rsplit("/", 1)[-1],
        "num_cpus": NUM_CPUS,
        "er_pages_per_sec": round(ER_PAGES / er_sec, 1),
    }


def run_scaling() -> dict:
    """Same ER job, fresh processes, N=2 vs 4N=8 CPUs, identical input.

    Uses a 100k-page corpus (GRAFT_SCALING_PAGES to override): scaling
    efficiency measures the parallel fraction, so the job must be big enough
    that per-stage compute dominates the fixed per-execution costs (driver-side
    model fit, Ray operator startup) — at 20k pages the fixed ~25s floors the
    ratio regardless of implementation.
    """
    pages = int(os.environ.get("GRAFT_SCALING_PAGES", "100000"))

    def child(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SCALING_CHILD="1", GRAFT_ER_PAGES=str(pages))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env, capture_output=True, text=True, check=True
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo_cpus, hi_cpus = 2, 8
    r_lo = child(lo_cpus)
    r_hi = child(hi_cpus)
    eff = (r_lo["sec"] / r_hi["sec"]) / (hi_cpus / lo_cpus)
    return {
        "metric": "ER throughput scaling, fresh ray.init sessions, identical input",
        "pages": pages,
        "cpus_lo": lo_cpus,
        "cpus_hi": hi_cpus,
        "sec_lo": round(r_lo["sec"], 2),
        "sec_hi": round(r_hi["sec"], 2),
        "pages_per_sec_lo": round(r_lo["pages_per_sec"], 1),
        "pages_per_sec_hi": round(r_hi["pages_per_sec"], 1),
        "scaling_efficiency": round(eff, 3),
        "note": "sandbox has ~8 usable hardware threads; 2->8 is the honest 4x pair (32 logical CPUs oversubscribe one box)",
    }


if __name__ == "__main__":
    if os.environ.get("GRAFT_SCALING_CHILD"):
        print(json.dumps(run_er(NUM_CPUS)))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_full()))
