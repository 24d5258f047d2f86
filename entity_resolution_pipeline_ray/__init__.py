"""entity_resolution_pipeline_ray — a Ray-Data-native record-linkage / data-processing engine.

A from-scratch engine with the capabilities of the reference entity-resolution
pipeline (yalelibrary-metadata-services/entity_resolution_pipeline): deterministic
text normalization/extraction, string interning + dedup, MinHash/LSH candidate
blocking, pairwise similarity feature engineering, a locally-trained logistic
match classifier, and distributed transitive clustering — all expressed as
``ray.data.Dataset`` transforms (``map_batches`` over zero-copy Arrow batches,
actor pools for stateful stages, explicit shuffles for the wide steps).

This package NEVER calls ``ray.init()`` / ``ray.shutdown()`` — sessions are
owned by the caller (bench.py, CLI scripts, the test fixture, or the driver).
"""

__version__ = "0.1.0"
