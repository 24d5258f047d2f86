"""Session-scoped Ray fixture: one ray.init per pytest session (the only place
in the test tree that owns a Ray session)."""

from __future__ import annotations

import logging
import os
import sys

import pytest

sys.path.insert(0, "/root/repo")
# quiet worker-side schema-hash warnings; must be set before ray.init
os.environ.setdefault(
    "RAY_DATA_LOGGING_CONFIG",
    "/root/repo/entity_resolution_pipeline_ray/ray_data_logging.yaml",
)


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()
