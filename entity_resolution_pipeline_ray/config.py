"""Engine configuration.

Analog of the reference's ``config.yml`` (see /root/reference/config.yml) but as a
plain dataclass: every knob that shapes results (seeds, shingle/band geometry,
feature set, classifier hyperparameters, clustering thresholds) lives here so a
pipeline run is reproducible from the config alone.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# When not None, this FORCES every size-gate that picks between a
# broadcast/driver-side plan and the distributed plan — including thresholds a
# caller passed explicitly, because the gates are performance-only dual plans
# (pinned equal in tests) and the point of the override is that NO call path
# escapes it.  ``tools/check_oracles.py --at-scale-plans`` sets this to 0 so
# the whole registry runs its 100-TB code paths at toy scale.  Production code
# must never set it.
SCALE_GATE_OVERRIDE: int | None = None


def scale_gate(threshold: int) -> int:
    """Resolve a size-gate threshold against the module-wide override.

    Call this AT THE COMPARISON SITE on the already-resolved threshold (default
    or caller-supplied) — wrapping only defaults would let explicitly-passed
    thresholds (e.g. ``g_pagerank`` → ``pagerank_on_edges``) escape the
    ``--at-scale-plans`` forcing."""
    return threshold if SCALE_GATE_OVERRIDE is None else SCALE_GATE_OVERRIDE


@dataclass(frozen=True)
class MinHashConfig:
    """MinHash/LSH geometry.

    num_perm = num_bands * band_rows.  With band_rows=4, num_bands=32 the
    collision probability for Jaccard 0.7 is 1-(1-0.7^4)^32 ≈ 0.9998 — chosen so
    that planted near-duplicate clusters (template noise keeps pair Jaccard
    >= ~0.7) block together with margin, supporting the pairwise-F1 >= 0.99 gate.
    """

    num_perm: int = 128
    num_bands: int = 32
    shingle_size: int = 3  # word shingles
    seed: int = 42


@dataclass(frozen=True)
class BlockingConfig:
    """Candidate-generation knobs.

    max_block_size / pair_budget guard against power-law hot blocks (top
    domains / shared templates): an uncapped block of n docs emits n*(n-1)/2
    pairs.  Blocks larger than ``max_block_size`` are deterministically
    sub-sampled (sorted by doc_id, stride sampling) and flagged in the stage
    metrics.  The reference never faced this (its candidate-generation stage is
    declared but unimplemented — /root/reference/src/pipeline.py:354).
    """

    max_block_size: int = 200
    use_title_key: bool = True


@dataclass(frozen=True)
class TfidfConfig:
    vocab_size: int = 50_000
    min_df: int = 2


@dataclass(frozen=True)
class FeatureConfig:
    """Config-driven feature selection + normalization.

    Reference analogs: include/exclude lists with wildcard groups
    (/root/reference/src/batch_parallel_feature_engineering.py:704-803, config.yml:164-193)
    and the global StandardScaler fit/transform (:890-967).  ``include``/
    ``exclude`` are fnmatch patterns over FEATURE_NAMES (empty include = all).
    """

    include: tuple[str, ...] = ()
    exclude: tuple[str, ...] = ()
    standardize: bool = False
    # G4: recursive feature elimination with CV (reference rfe_* knobs at
    # config.yml / batch_parallel_feature_engineering.py:969-1048) — disabled
    # by default, same as the reference
    rfecv: bool = False
    rfe_step: int = 1
    rfe_cv_folds: int = 3


@dataclass(frozen=True)
class PrefilterConfig:
    """Cheap vectorized rule pass before the classifier (reference analog:
    ``_apply_prefilters`` /root/reference/src/batch_parallel_feature_engineering.py:805-888,
    all rules disabled by default at config.yml:154-161 — same default here).

    Rules (applied in order; None disables a rule):
    - sketch >= high_sketch_match → forced match (prob 1.0)
    - title_exact and sketch >= exact_title_sketch → forced match
    - sketch < low_sketch_nonmatch and title_jw < low_title_jw → forced
      non-match (prob 0.0)
    """

    enabled: bool = False
    high_sketch_match: float | None = 0.95
    exact_title_sketch: float | None = 0.5
    low_sketch_nonmatch: float | None = 0.02
    low_title_jw: float | None = 0.5


@dataclass(frozen=True)
class ClassifierConfig:
    """Mirrors the reference trainer hyperparameters
    (/root/reference/src/batch_parallel_classification.py:456-536, config.yml:196-206)."""

    learning_rate: float = 0.1
    max_iterations: int = 100
    convergence_tolerance: float = 1e-4
    l2_lambda: float = 1e-4
    batch_size: int = 4096
    max_training_pairs: int = 80_000  # seeded subsample above this (reference trained on ~77.5k pairs)
    class_weight: str = "balanced"
    decision_threshold: float = 0.6
    train_ratio: float = 0.7
    random_seed: int = 42


@dataclass(frozen=True)
class ClusteringConfig:
    """Transitive clustering (reference analog:
    /root/reference/src/batch_parallel_classification.py:840-943, config.yml:209-214).

    ``algorithm``: 'connected_components' (default; distributed min-label
    propagation with a driver union-find fast path), 'label_propagation'
    (deterministic async majority-vote LPA), or 'louvain' (multi-level
    modularity) — the reference's config-string selection at :871-935."""

    min_edge_weight: float = 0.5
    min_cluster_size: int = 1
    max_rounds: int = 100
    algorithm: str = "connected_components"
    # edge count below which connected components takes the driver union-find
    # fast path; 0 forces the distributed min-label propagation (the 100 TB
    # plan) end to end
    driver_edge_threshold: int = 5_000_000


@dataclass(frozen=True)
class ExecutionConfig:
    """Per-stage physical knobs — sized so no stage starves the others."""

    batch_size: int = 1024
    scorer_concurrency: int = 16  # actor-pool MAX; pools autoscale from 1
    scorer_batch_size: int = 4096
    join_num_partitions: int = 32
    broadcast_threshold_rows: int = 2_000_000  # below this, side tables are ray.put broadcast


@dataclass(frozen=True)
class ERConfig:
    minhash: MinHashConfig = field(default_factory=MinHashConfig)
    blocking: BlockingConfig = field(default_factory=BlockingConfig)
    tfidf: TfidfConfig = field(default_factory=TfidfConfig)
    features: FeatureConfig = field(default_factory=FeatureConfig)
    prefilter: PrefilterConfig = field(default_factory=PrefilterConfig)
    classifier: ClassifierConfig = field(default_factory=ClassifierConfig)
    clustering: ClusteringConfig = field(default_factory=ClusteringConfig)
    execution: ExecutionConfig = field(default_factory=ExecutionConfig)


DEFAULT_CONFIG = ERConfig()
