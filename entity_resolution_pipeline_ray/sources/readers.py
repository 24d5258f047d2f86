"""Input readers: pages corpus and ground-truth labeled pairs.

Reference analogs:
- S1 recursive CSV directory reader with all-string dtype + custom NA tokens
  (/root/reference/src/batch_parallel_preprocessing.py:200-242, glob :104) — here the
  primary input is Parquet (input_hint), with CSV parity; chunking is Ray
  blocks for free.
- S2 ground-truth pair reader: (left,right,match) with 'true' bool parsing
  (/root/reference/src/batch_parallel_querying.py:267-297).
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc


def read_pages(path: str, *, columns: list[str] | None = None):
    """Read the pages corpus from a Parquet file/directory or recursive CSV glob.

    Parquet is the primary format (columns pruned at the read); CSV is parity
    with the reference's directory reader (recursive ``**/*.csv``).
    """
    import ray.data as rd

    from ..rayops import read_parquet_clean

    if os.path.isdir(path):
        csvs = sorted(glob.glob(os.path.join(path, "**", "*.csv"), recursive=True))
        jsons = sorted(glob.glob(os.path.join(path, "**", "*.jsonl"), recursive=True))
        pqs = sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
        if pqs or not (csvs or jsons):
            return read_parquet_clean(path, columns=columns)
        ds = rd.read_csv(csvs) if csvs else rd.read_json(jsons)
        return ds.select_columns(columns) if columns else ds
    if path.endswith(".csv"):
        ds = rd.read_csv(path)
        return ds.select_columns(columns) if columns else ds
    if path.endswith((".jsonl", ".json")):
        # JSONL (one record per line) — the web-crawl interchange format
        ds = rd.read_json(path)
        return ds.select_columns(columns) if columns else ds
    return read_parquet_clean(path, columns=columns)


def read_labeled_pairs(path: str) -> pa.Table:
    """Ground-truth pairs → (left_url, right_url, match: bool).

    Accepts parquet or csv; tolerates the reference's header variants
    (left/right/match) and string bools ('true'/'True'/'1' — reference parses
    exactly 'true', /root/reference/src/batch_parallel_querying.py:289)."""
    import pyarrow.csv as pacsv
    import pyarrow.parquet as pq

    if path.endswith(".csv"):
        tbl = pacsv.read_csv(path)
    else:
        tbl = pq.read_table(path)
    cols = {c.lower(): c for c in tbl.column_names}
    left = cols.get("left_url") or cols.get("left")
    right = cols.get("right_url") or cols.get("right")
    match = cols.get("match")
    if not (left and right and match):
        raise ValueError(f"labeled pairs file needs left/right/match columns, got {tbl.column_names}")
    m = tbl[match]
    if not pa.types.is_boolean(m.type):
        lowered = pc.utf8_lower(pc.cast(m, pa.string()))
        m = pc.is_in(lowered, value_set=pa.array(["true", "1", "t", "yes"]))
    lo = pc.min_element_wise(tbl[left], tbl[right])
    hi = pc.max_element_wise(tbl[left], tbl[right])
    return pa.table({"left_url": lo, "right_url": hi, "match": m})
