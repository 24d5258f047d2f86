"""Benchmark harness: headline ER pipeline + representative operator pipelines.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec", "queries": {...},
   "sf": ..., "num_cpus": N, "er_pages_per_sec": ...}

Environment: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS
(default 32).  This script OWNS its Ray session (the library never inits).

--scaling: runs the headline ER job in fresh subprocesses at N=2 and 4N=8
CPUs on identical pre-materialized Parquet input (interleaved repeats, median
per leg — the shared-host VM drifts +-30%), and reports throughput at both
levels, raw scaling efficiency, the box's own measured hardware ceiling for
2->8 (pure-python multiprocessing), and efficiency normalized to that
ceiling.  ~8 hardware threads are usable here (beyond 8 the machine curve is
flat), so 2->8 is the only honest 4x pair; 8->32 would measure
oversubscription, not scaling.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# must be set BEFORE ray.init so worker processes inherit it
os.environ.setdefault(
    "RAY_DATA_LOGGING_CONFIG",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "entity_resolution_pipeline_ray", "ray_data_logging.yaml"),
)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
ER_PAGES = int(os.environ.get("GRAFT_ER_PAGES", "20000"))

ORACLE_QUERIES = [
    "q1_pricing_summary",
    "q_events_hourly",
    "t_string_counts",
    "d_minhash_pairs",
    "d_apply_fuzzy",
    "s_knn_bruteforce",
    "m_media_features",
    "g_pagerank",
    # round-4 late-session optimized operators (two-sort / broadcast plans)
    "g_triangles",
    "t_tfidf_topk",
    # round-5: the round-4 heavies, recorded so the next regression in this
    # family is visible driver-round-over-round (VERDICT r4 item 4)
    "g_lpa_communities",
    "q3_shipping_priority",
    "d_incremental_fuzzy",
    "q_fuzzy_name_pairs",
]


def _quiet():
    from entity_resolution_pipeline_ray.rayops import configure_context

    configure_context()


def _consume(out) -> int:
    import pandas as pd
    import pyarrow as pa

    if isinstance(out, pd.DataFrame):
        return len(out)
    if isinstance(out, pa.Table):
        return out.num_rows
    return out.count()


def host_speed_sentinel() -> float:
    """Absolute single-core speed of THIS window, in seconds (lower = faster):
    md5 over 32 MiB, a fixed pure-CPU workload with no BLAS/thread variance.
    The 2→8-worker contention probe only measures the parallel-scaling RATIO —
    a frequency-throttled or stolen-CPU host can scale cleanly while every
    absolute wall-time inflates ~1.3×; this sentinel makes that visible, so
    cross-window comparisons of recorded bench numbers can be normalized."""
    import hashlib

    blob = bytes(range(256)) * (32 * 1024 * 1024 // 256)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        hashlib.md5(blob).hexdigest()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def _corpus_dir(spec) -> str:
    body = f"{spec.body_words[0]}-{spec.body_words[1]}"
    return f"/tmp/er_bench_corpus/p{spec.num_pages}_s{spec.num_shards}_b{body}_seed{spec.seed}"


def ensure_corpus(spec) -> str:
    """Materialize the deterministic corpus to Parquet ONCE (untimed; shared by
    every parallelism level — identical input bytes).  The benchmarked job then
    READS Parquet, matching the production input shape (input_hint) instead of
    timing generator scaffolding."""
    import pyarrow.parquet as pq

    import ray.data as rd
    from entity_resolution_pipeline_ray.sources.pages import labeled_pairs_table, pages_dataset

    d = _corpus_dir(spec)
    marker = os.path.join(d, "_COMPLETE")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(os.path.join(d, "pages"), exist_ok=True)
        pages_dataset(spec).write_parquet(os.path.join(d, "pages"))
        pq.write_table(labeled_pairs_table(spec), os.path.join(d, "labeled_pairs.parquet"))
        with open(marker, "w") as f:
            f.write("ok")
    return d


def run_er(num_cpus: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False, logging_level="ERROR")
    _quiet()
    import pyarrow.parquet as pq

    import ray.data as rd
    from entity_resolution_pipeline_ray.pipelines.er import run_er_pipeline
    from entity_resolution_pipeline_ray.sources.pages import PagesSpec

    body = tuple(int(x) for x in os.environ.get("GRAFT_ER_BODY", "60,150").split(","))
    spec = PagesSpec(num_pages=ER_PAGES, num_shards=32, body_words=body)
    d = ensure_corpus(spec)
    labeled = pq.read_table(os.path.join(d, "labeled_pairs.parquet"))
    # warm the page cache with one untimed scan (guide: measure compute+shuffle)
    rd.read_parquet(os.path.join(d, "pages")).count()
    from entity_resolution_pipeline_ray.rayops import read_parquet_clean

    if os.environ.get("GRAFT_SCALING_WARMUP", "1") != "0":
        # small untimed pipeline warmup: spawns worker processes + imports once
        # (per-session fixed cost; a production session streams for hours) so
        # the timed run measures steady-state throughput at this CPU count
        w = run_er_pipeline(
            read_parquet_clean(os.path.join(d, "pages")).limit(max(2000, ER_PAGES // 16)), labeled
        )
        w["clusters"].count()
    t0 = time.time()
    pages = read_parquet_clean(os.path.join(d, "pages"))
    res = run_er_pipeline(pages, labeled)
    n_clusters_rows = res["clusters"].count()
    dt = time.time() - t0
    ray.shutdown()
    return {"sec": dt, "pages": ER_PAGES, "pages_per_sec": ER_PAGES / dt, "rows": n_clusters_rows}


def run_full() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False, logging_level="ERROR")
    _quiet()
    import pyarrow.parquet as pq

    import __ray_entry__ as E
    import ray.data as rd
    from entity_resolution_pipeline_ray.pipelines.er import run_er_pipeline
    from entity_resolution_pipeline_ray.sources.pages import PagesSpec

    queries: dict[str, float] = {}

    # the shared-host VM drifts +-2x over minutes: repeat every timed leg and
    # take the per-leg MEDIAN (samples published alongside) so one noisy
    # window doesn't define the recorded number
    repeats = int(os.environ.get("GRAFT_BENCH_REPEATS", "3"))
    med = lambda xs: sorted(xs)[len(xs) // 2]

    # benchmark the engine on pre-materialized Parquet (the production input
    # shape — see ensure_corpus), not the synthetic-generator scaffolding
    spec = PagesSpec(num_pages=ER_PAGES, num_shards=32)
    d = ensure_corpus(spec)
    labeled = pq.read_table(os.path.join(d, "labeled_pairs.parquet"))
    rd.read_parquet(os.path.join(d, "pages")).count()  # warm page cache
    # one UNTIMED warmup run: the first pipeline execution pays worker-process
    # start + imports (a per-session fixed cost, amortized to nothing over a
    # real corpus); the timed repeats then measure steady-state throughput.
    # The warmup duration is still published below.
    t0 = time.time()
    from entity_resolution_pipeline_ray.rayops import read_parquet_clean

    res = run_er_pipeline(read_parquet_clean(os.path.join(d, "pages")), labeled)
    res["clusters"].count()
    er_warmup_sec = round(time.time() - t0, 2)
    er_samples = []
    for _ in range(repeats):
        t0 = time.time()
        res = run_er_pipeline(read_parquet_clean(os.path.join(d, "pages")), labeled)
        res["clusters"].count()
        er_samples.append(time.time() - t0)
    er_sec = med(er_samples)
    queries[f"er_pipeline_{ER_PAGES}_pages"] = round(er_sec, 2)

    qmap = E.queries()
    # warm the page cache so per-query numbers measure compute + shuffle
    for name in ORACLE_QUERIES:
        _consume(qmap[name](SF_DIR))
    from entity_resolution_pipeline_ray.rayops import clear_dataset_memo

    q_samples: dict[str, list[float]] = {n: [] for n in ORACLE_QUERIES}
    for _ in range(repeats):
        for name in ORACLE_QUERIES:
            # cross-query dataset memos (e.g. the minhash pair set shared by
            # d_minhash_pairs/d_apply_fuzzy) would turn repeat samples into
            # cache reads — every timed sample recomputes from the parquet
            clear_dataset_memo()
            t0 = time.time()
            _consume(qmap[name](SF_DIR))
            q_samples[name].append(time.time() - t0)
    for name in ORACLE_QUERIES:
        queries[name] = round(med(q_samples[name]), 2)

    # incremental append vs from-scratch on the SAME 20k-page corpus — the
    # operational win, quantified (VERDICT r4 item 6): a ~5% crawl shard
    # appends to a finished checkpointed run vs re-running the whole pipeline
    # with the same pinned vocab/model.
    import shutil
    import tempfile

    import numpy as np
    import pyarrow as pa_

    from entity_resolution_pipeline_ray.functions.hashing import md5_u64
    from entity_resolution_pipeline_ray.pipelines.er import (
        er_incremental_append,
        run_er_pipeline_checkpointed,
    )

    pages_tbl = pq.read_table(os.path.join(d, "pages"))
    urls = pages_tbl["url"].to_pylist()
    is_new = np.array([md5_u64(u) % 20 == 0 for u in urls])
    base_t, append_t = pages_tbl.filter(pa_.array(~is_new)), pages_tbl.filter(pa_.array(is_new))
    base_urls = set(base_t["url"].to_pylist())
    lp_mask = [
        (l in base_urls) and (r in base_urls)
        for l, r in zip(labeled["left_url"].to_pylist(), labeled["right_url"].to_pylist())
    ]
    lp_base = labeled.filter(pa_.array(lp_mask))
    wd = tempfile.mkdtemp(prefix="er_bench_incr_")
    try:
        run_er_pipeline_checkpointed(rd.from_arrow(base_t), lp_base, wd)  # untimed base epoch
        t0 = time.time()
        inc = er_incremental_append(wd, rd.from_arrow(append_t))
        inc["clusters"].count()
        append_sec = time.time() - t0
        t0 = time.time()
        res = run_er_pipeline(rd.from_arrow(pages_tbl), lp_base)
        res["clusters"].count()
        scratch_sec = time.time() - t0
    finally:
        shutil.rmtree(wd, ignore_errors=True)
    queries["er_incremental_append_5pct_20k"] = round(append_sec, 2)
    queries["er_incremental_from_scratch_20k"] = round(scratch_sec, 2)
    incr = {
        "append_shard_pages": int(is_new.sum()),
        "append_sec": round(append_sec, 2),
        "from_scratch_sec": round(scratch_sec, 2),
        "speedup": round(scratch_sec / append_sec, 2) if append_sec > 0 else None,
    }
    ray.shutdown()
    return {
        "metric": f"ER end-to-end sec on {ER_PAGES} synthetic pages (planted clusters) + operator pipelines at {SF_DIR}",
        "value": round(er_sec, 2),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").rsplit("/", 1)[-1],
        "num_cpus": NUM_CPUS,
        "er_pages_per_sec": round(ER_PAGES / er_sec, 1),
        "repeats": repeats,
        "er_samples_sec": [round(x, 2) for x in er_samples],
        "er_warmup_sec_untimed": er_warmup_sec,
        "query_samples_sec": {n: [round(x, 2) for x in xs] for n, xs in q_samples.items()},
        "incremental": incr,
        "host_speed_sentinel_sec": host_speed_sentinel(),
    }


def run_scaling() -> dict:
    """Same ER job, fresh processes, N=2 vs 4N=8 CPUs, identical Parquet input.

    Corpus: 40k pages with realistic page weights (300-700 body words) so
    per-stage compute dominates the fixed per-execution costs (driver-side
    model fit, Ray operator startup).  GRAFT_SCALING_PAGES / GRAFT_ER_BODY /
    GRAFT_SCALING_REPEATS override.
    """
    pages = int(os.environ.get("GRAFT_SCALING_PAGES", "40000"))

    def child(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_SCALING_CHILD="1",
            GRAFT_ER_PAGES=str(pages),
            GRAFT_ER_BODY=os.environ.get("GRAFT_ER_BODY", "300,700"),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env, capture_output=True, text=True, check=True
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo_cpus, hi_cpus = 2, 8
    # the sandbox VM's throughput drifts +-30% over minutes (shared host);
    # interleave repeated legs AND the hardware-ceiling probe, then take
    # per-series medians so each series samples the same drift distribution
    repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "3"))
    lo_secs, hi_secs, hw_samples = [], [], []
    for _ in range(repeats):
        lo_secs.append(child(lo_cpus)["sec"])
        hi_secs.append(child(hi_cpus)["sec"])
        hw_samples.append(_hardware_ceiling(lo_cpus, hi_cpus))
    lo_secs.sort()
    hi_secs.sort()
    hw_samples.sort()
    med = lambda xs: xs[len(xs) // 2]
    hw = med(hw_samples)
    r_lo = {"sec": med(lo_secs), "pages_per_sec": pages / med(lo_secs)}
    r_hi = {"sec": med(hi_secs), "pages_per_sec": pages / med(hi_secs)}
    eff = (r_lo["sec"] / r_hi["sec"]) / (hi_cpus / lo_cpus)
    # least-interference estimate: the MIN of each series is the sample least
    # polluted by other tenants of this shared host (samples range 3x within a
    # run); paired with the BEST ceiling sample it bounds what this pipeline
    # would measure on a quiet machine
    eff_min = (lo_secs[0] / hi_secs[0]) / (hi_cpus / lo_cpus)
    hw_best = hw_samples[-1]
    return {
        "metric": "ER throughput scaling, fresh ray.init sessions, identical Parquet input",
        "pages": pages,
        "cpus_lo": lo_cpus,
        "cpus_hi": hi_cpus,
        "sec_lo": round(r_lo["sec"], 2),
        "sec_hi": round(r_hi["sec"], 2),
        "pages_per_sec_lo": round(r_lo["pages_per_sec"], 1),
        "pages_per_sec_hi": round(r_hi["pages_per_sec"], 1),
        "scaling_efficiency": round(eff, 3),
        "samples_sec_lo": [round(x, 1) for x in lo_secs],
        "samples_sec_hi": [round(x, 1) for x in hi_secs],
        "samples_hw_ceiling": [round(x, 3) for x in hw_samples],
        "hardware_ceiling_efficiency": round(hw, 3),
        "efficiency_vs_hardware_ceiling": round(eff / hw, 3) if hw else None,
        "scaling_efficiency_least_interference": round(eff_min, 3),
        "efficiency_vs_ceiling_least_interference": round(eff_min / hw_best, 3) if hw_best else None,
        "host_speed_sentinel_sec": host_speed_sentinel(),
        "note": (
            "single-box sandbox: this VM itself delivers only ~3.2x real speedup from 2 to 8 "
            "workers (pure-python multiprocessing baseline = the hardware ceiling reported "
            "above); the pipeline's efficiency is therefore reported both raw and normalized "
            "to that ceiling. On a real N->4N node cluster the ceiling is ~1.0."
        ),
    }


def _hardware_ceiling(lo: int, hi: int) -> float:
    """Measured wall-clock scaling of pure CPU work on THIS box between the two
    worker counts (multiprocessing, no Ray) — the ceiling any pipeline can hit."""
    import multiprocessing as mp

    def _t(k: int) -> float:
        with mp.Pool(k) as p:
            p.map(_burn, [2_000_000] * k)  # warm
            t0 = time.time()
            p.map(_burn, [6_000_000] * 48)
            return time.time() - t0

    return (_t(lo) / _t(hi)) / (hi / lo)


def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


if __name__ == "__main__":
    if os.environ.get("GRAFT_SCALING_CHILD"):
        print(json.dumps(run_er(NUM_CPUS)))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_full()))
