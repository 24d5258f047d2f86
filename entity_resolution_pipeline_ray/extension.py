"""User-extension surface — the SURVEY §2.11 map made concrete.

The reference's primary extension points are config-driven: stages are classes
with ``__init__(config)`` + ``execute()`` called by name from the orchestrator
(/root/reference/src/pipeline.py:55-62,122-404), and feature engineering /
selection is steered entirely from config.yml (:77-193).  Here the same two
surfaces are explicit registries over pure Arrow-batch functions:

- **Stage registry**: a ``Stage`` is any callable ``(Dataset, ctx) -> Dataset``;
  ``register_stage`` names it, ``build_pipeline`` composes named stages in
  order.  All built-in per-record transforms are just functions, so users slot
  custom stages between them without touching engine code.
- **Pair-feature registry**: ``register_pair_feature(name, fn)`` appends a
  vectorized pair feature (``fn(left, right) -> (n,) float array`` over the
  side payloads of ``stages.scoring.pair_feature_matrix``) to the scoring
  matrix AND to ``FEATURE_NAMES``, so config feature selection
  (``FeatureConfig.include/exclude``), training, model persistence and
  importance reporting all see it with zero further wiring — the Ray-native
  analog of adding a feature block to config.yml:77-161.

Registration mutates process-global tables; workers pick the extras up via the
closure captured at pipeline build time (the scoring stage ships its feature
list with the broadcast payload), so register BEFORE building the pipeline.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

STAGES: dict[str, Callable] = {}


def register_stage(name: str, fn: Callable | None = None):
    """Register ``fn`` as a named stage; usable as a decorator."""

    def _reg(f: Callable) -> Callable:
        if name in STAGES:
            raise ValueError(f"stage {name!r} already registered")
        STAGES[name] = f
        return f

    return _reg(fn) if fn is not None else _reg


def unregister_stage(name: str) -> None:
    STAGES.pop(name, None)


def build_pipeline(ds, stage_names: list[str], ctx: dict[str, Any] | None = None):
    """Compose registered stages in order: ds -> stage1 -> stage2 -> ... .
    Lazy end to end — nothing executes until the returned Dataset is consumed."""
    ctx = ctx or {}
    for name in stage_names:
        if name not in STAGES:
            raise KeyError(f"unknown stage {name!r}; registered: {sorted(STAGES)}")
        ds = STAGES[name](ds, ctx)
    return ds


def register_pair_feature(name: str, fn: Callable) -> None:
    """Add a custom scoring feature: ``fn(left_payload, right_payload) ->
    (n_pairs,) float64``.  Appended after the built-in columns, in
    registration order."""
    from .stages import scoring

    if name in scoring.FEATURE_NAMES:
        raise ValueError(f"feature {name!r} already exists")
    scoring.EXTRA_PAIR_FEATURES[name] = fn
    scoring.FEATURE_NAMES.append(name)


def unregister_pair_feature(name: str) -> None:
    from .stages import scoring

    if name in scoring.EXTRA_PAIR_FEATURES:
        del scoring.EXTRA_PAIR_FEATURES[name]
        scoring.FEATURE_NAMES.remove(name)


# ----------------------------------------------------------- built-in stages
# The engine's own per-record transforms, exposed by name so user pipelines
# can interleave custom stages with them.


@register_stage("extract")
def _stage_extract(ds, ctx):
    from .stages.extract import extract_docs

    return extract_docs(ds)


@register_stage("doc_features")
def _stage_doc_features(ds, ctx):
    from .config import DEFAULT_CONFIG
    from .stages.signatures import compute_doc_features

    cfg = ctx.get("cfg", DEFAULT_CONFIG)
    return compute_doc_features(ds, cfg.minhash, cfg.tfidf)
