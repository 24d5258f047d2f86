"""Per-stage Parquet checkpoints with JSON lineage manifests — the engine's
resume story.

Replaces the reference's whole-state pickle checkpoints
(save_checkpoint/load_checkpoint, /root/reference/src/utils.py:47-86; per-stage
cadences e.g. /root/reference/src/batch_parallel_preprocessing.py:147-155) with the
batch-native form: every stage writes partitioned Parquet into
``<workdir>/<stage>/data/`` via an ATOMIC tmp-dir + rename, plus a manifest
recording per-file lineage (file, rows, bytes) and stage metrics (row counts,
wall time, optional score histogram).  A killed run resumes by loading every
stage whose manifest says "complete" and recomputing only the rest — the
manifest is written strictly AFTER the data rename, so a crash mid-write never
yields a complete-but-corrupt stage.
"""

from __future__ import annotations

import json
import os
import shutil
import time


class StageCheckpoint:
    def __init__(self, workdir: str, stage: str):
        self.stage = stage
        self.dir = os.path.join(workdir, stage)
        self.data_dir = os.path.join(self.dir, "data")
        self.manifest_path = os.path.join(self.dir, "manifest.json")

    def is_complete(self) -> bool:
        if not os.path.exists(self.manifest_path):
            return False
        try:
            with open(self.manifest_path) as f:
                return json.load(f).get("status") == "complete"
        except (json.JSONDecodeError, OSError):
            return False

    def manifest(self) -> dict:
        with open(self.manifest_path) as f:
            return json.load(f)

    def load(self):
        import ray.data as rd

        return rd.read_parquet(self.data_dir)

    def write(self, ds, metrics: dict | None = None):
        """Write the stage output atomically and record lineage.  Returns a
        Dataset re-read from the checkpoint (so downstream consumes the
        persisted bytes — identical on resume)."""
        import pyarrow.parquet as pq

        t0 = time.time()
        tmp = self.data_dir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        # invalidate any stale complete-manifest BEFORE touching the data dir:
        # a crash between the rmtree and the new manifest must read as
        # incomplete (recompute), never complete-but-corrupt
        if os.path.exists(self.manifest_path):
            os.remove(self.manifest_path)
        shutil.rmtree(self.data_dir, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        ds.write_parquet(tmp)
        partitions = []
        total_rows = 0
        for name in sorted(os.listdir(tmp)):
            if not name.endswith(".parquet"):
                continue
            p = os.path.join(tmp, name)
            md = pq.read_metadata(p)
            partitions.append({"file": name, "rows": md.num_rows, "bytes": os.path.getsize(p)})
            total_rows += md.num_rows
        os.rename(tmp, self.data_dir)
        elapsed = time.time() - t0
        man = {
            "status": "complete",
            "stage": self.stage,
            "rows": total_rows,
            "partitions": partitions,
            "t_write_sec": round(elapsed, 3),
            # stage throughput: the dataset is lazy, so execution happens
            # inside write_parquet and elapsed covers compute + persist —
            # the per-stage throughput metric the run's lineage reports
            "rows_per_sec": round(total_rows / elapsed, 1) if elapsed > 0 else None,
            "metrics": metrics or {},
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        mtmp = self.manifest_path + ".tmp"
        with open(mtmp, "w") as f:
            json.dump(man, f, indent=1)
        os.replace(mtmp, self.manifest_path)
        return self.load()


def run_stage(workdir: str, stage: str, compute_fn, metrics_fn=None):
    """Compute-or-load one stage.  ``compute_fn() -> Dataset``;
    ``metrics_fn(ds) -> dict`` (optional, e.g. score histogram)."""
    ckpt = StageCheckpoint(workdir, stage)
    if ckpt.is_complete():
        return ckpt.load(), True
    os.makedirs(ckpt.dir, exist_ok=True)
    ds = compute_fn()
    metrics = metrics_fn(ds) if metrics_fn else None
    return ckpt.write(ds, metrics), False
