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
    # optional global standardization fitted on the train split (A8 analog,
    # /root/reference/src/batch_parallel_feature_engineering.py:890-967)
    scaler_mean: np.ndarray | None = None
    scaler_std: np.ndarray | None = None

    def transform(self, X: np.ndarray) -> np.ndarray:
        if self.scaler_mean is not None:
            return (X - self.scaler_mean) / self.scaler_std
        return X

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        from ..functions.similarity import sigmoid

        return sigmoid(self.transform(X) @ self.weights + self.bias)

    def feature_importance(self) -> dict[str, float]:
        """Normalized |weight| shares (reference ``_compute_feature_importance``,
        /root/reference/src/batch_parallel_classification.py:1011-1042)."""
        a = np.abs(self.weights)
        total = a.sum() or 1.0
        imp = {n: float(v / total) for n, v in zip(self.feature_names, a)}
        return dict(sorted(imp.items(), key=lambda kv: -kv[1]))

    def to_json(self) -> str:
        return json.dumps(
            {
                "feature_names": self.feature_names,
                "weights": self.weights.tolist(),
                "bias": self.bias,
                "threshold": self.threshold,
                "metrics": self.metrics,
                "scaler_mean": self.scaler_mean.tolist() if self.scaler_mean is not None else None,
                "scaler_std": self.scaler_std.tolist() if self.scaler_std is not None else None,
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
            scaler_mean=np.asarray(d["scaler_mean"], dtype=np.float64) if d.get("scaler_mean") is not None else None,
            scaler_std=np.asarray(d["scaler_std"], dtype=np.float64) if d.get("scaler_std") is not None else None,
        )

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "LRModel":
        with open(path) as f:
            return cls.from_json(f.read())
