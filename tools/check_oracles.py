"""Local mimic of the driver's correctness gate: run each __ray_entry__
queries() entry and its oracle_sql() via DuckDB on the same sf dir, compare
row-count + schema + order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault(
    "RAY_DATA_LOGGING_CONFIG",
    "/root/repo/entity_resolution_pipeline_ray/ray_data_logging.yaml",
)

import numpy as np
import pandas as pd


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, mine: pd.DataFrame, oracle: pd.DataFrame) -> str:
    if len(mine) != len(oracle):
        return f"ROWS {len(mine)} vs {len(oracle)}"
    m, o = canon(mine), canon(oracle)
    if list(m.columns) != list(o.columns):
        return f"SCHEMA {list(m.columns)} vs {list(o.columns)}"
    for c in m.columns:
        a, b = m[c].to_numpy(), o[c].to_numpy()
        if np.issubdtype(m[c].dtype, np.floating) or np.issubdtype(o[c].dtype, np.floating):
            af = a.astype(np.float64)
            bf = b.astype(np.float64)
            if not np.allclose(af, bf, rtol=0, atol=0, equal_nan=True):
                mx = np.nanmax(np.abs(af - bf))
                return f"VALUES col {c} max_abs_diff={mx:.3e}" + (" (tiny float)" if mx < 1e-9 else "")
        else:
            if not (a == b).all():
                i = int(np.nonzero(a != b)[0][0])
                return f"VALUES col {c} first_diff row {i}: {a[i]!r} vs {b[i]!r}"
    return "OK"


def main():
    import duckdb
    import ray

    flags = {"--at-scale-plans", "--tiny-blocks"}
    unknown = [a for a in sys.argv[1:] if a.startswith("--") and a not in flags]
    if unknown:
        sys.exit(f"unknown flag(s): {unknown}; valid: {sorted(flags)}")
    argv = [a for a in sys.argv[1:] if a not in flags]
    at_scale = "--at-scale-plans" in sys.argv[1:]
    tiny_blocks = "--tiny-blocks" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    if tiny_blocks:
        # block-boundary torture: force every dataset into many tiny blocks so
        # sorted-group / prefix-sum / first_per_key boundary logic is exercised
        # at toy scale the way a 100-TB run's block counts would exercise it
        DataContext.get_current().target_max_block_size = 64 * 1024
        print("tiny-blocks mode: target_max_block_size = 64 KiB")
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    if at_scale:
        # Force every size-gated operator onto its distributed (100-TB) plan:
        # zero the broadcast/driver-side thresholds so the toy corpus takes the
        # same code path a trillion-row corpus would.  Complements the
        # dual-plan equality unit tests with a registry-wide value check.
        from entity_resolution_pipeline_ray.pipelines import dedup as _D
        from entity_resolution_pipeline_ray.pipelines import graph as _G
        from entity_resolution_pipeline_ray.pipelines import relational as _R
        from entity_resolution_pipeline_ray.stages import blocking as _B

        _B.DRIVER_CENSUS_MAX_ROWS = 0
        _R.Q3_CUST_BROADCAST_MAX = 0
        _D.BROADCAST_THRESHOLD_ROWS = 0
        _G.EDGE_BROADCAST_MAX_ROWS = 0
        _G.NODE_BROADCAST_MAX_ROWS = 0
        # ... and every gate whose default lives in a function signature or
        # config dataclass (broadcast_threshold_rows / driver_merge_threshold /
        # driver_edge_threshold) resolves through config.scale_gate:
        from entity_resolution_pipeline_ray import config as _cfg

        _cfg.SCALE_GATE_OVERRIDE = 0
        print("at-scale-plans mode: all broadcast/driver-census gates forced to 0")

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = E.queries()
    oracles = E.oracle_sql()
    if only and (missing := only - set(qs)):
        sys.exit(f"unknown query name(s): {sorted(missing)}")
    failures = 0
    checked = 0
    import time

    for name, fn in qs.items():
        if only and name not in only:
            continue
        checked += 1
        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"{name}: QUERY ERROR {type(ex).__name__}: {ex}")
            failures += 1
            continue
        dt = time.time() - t0
        if name in oracles:
            try:
                o = con.sql(oracles[name]).df()
            except Exception as ex:
                print(f"{name}: ORACLE ERROR {ex}")
                failures += 1
                continue
            verdict = compare(name, mine, o)
        else:
            verdict = f"rows-only ({len(mine)} rows)"
        status = "OK" if verdict.startswith(("OK", "rows-only")) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{name}: {verdict}  [{dt:.1f}s]")
    ray.shutdown()
    sys.exit(1 if failures or checked == 0 else 0)


if __name__ == "__main__":
    main()
