"""Pure, deterministic scalar/vector kernels used inside ``map_batches`` bodies.

Everything here is a function of its inputs only (no environment, no network,
no wall-clock) — the per-row determinism invariant (byte-identical extracted
text per url) depends on it.
"""
