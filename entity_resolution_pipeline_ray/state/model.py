"""Trained match-classifier model artifact.

Reference analog: the pickled LR model (weights + bias + feature_names,
/root/reference/src/batch_parallel_classification.py:366-394,628-713) — here a small
JSON artifact (no pickle) broadcast to scorer actors via ``ray.put``.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import numpy as np


@dataclass
class LRModel:
    feature_names: list[str]
    weights: np.ndarray  # (n_features,) float64
    bias: float
    threshold: float = 0.6
    metrics: dict = field(default_factory=dict)

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        from ..functions.similarity import sigmoid

        return sigmoid(X @ self.weights + self.bias)

    def to_json(self) -> str:
        return json.dumps(
            {
                "feature_names": self.feature_names,
                "weights": self.weights.tolist(),
                "bias": self.bias,
                "threshold": self.threshold,
                "metrics": self.metrics,
            }
        )

    @classmethod
    def from_json(cls, s: str) -> "LRModel":
        d = json.loads(s)
        return cls(
            feature_names=d["feature_names"],
            weights=np.asarray(d["weights"], dtype=np.float64),
            bias=float(d["bias"]),
            threshold=float(d["threshold"]),
            metrics=d.get("metrics", {}),
        )

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "LRModel":
        with open(path) as f:
            return cls.from_json(f.read())
