"""Weighted L1/L2 error metrics (reference src/metrics/weighted_li.py
WeightedL2Error / WeightedL1Error — torchmetrics accumulators used by
the panoptic module to track node-offset regression quality).

Functional accumulators over (sum of weighted errors, sum of weights)
— both plain int/float arrays, so they psum across devices like the
confusion matrix.
"""
from dataclasses import dataclass, field

import numpy as np

__all__ = ['WeightedL1Error', 'WeightedL2Error']


@dataclass
class _WeightedError:
    order: int = 2

    def __post_init__(self):
        self.reset()

    def reset(self):
        self.total = 0.0
        self.weight = 0.0

    def update(self, pred, target, weight=None):
        pred = np.asarray(pred, np.float64)
        target = np.asarray(target, np.float64)
        err = np.abs(pred - target) ** self.order
        if err.ndim > 1:
            err = err.sum(-1)
        if weight is None:
            weight = np.ones(err.shape[0])
        w = np.asarray(weight, np.float64).reshape(-1)
        self.total += float((err * w).sum())
        self.weight += float(w.sum())

    def compute(self):
        return self.total / max(self.weight, 1e-12)


@dataclass
class WeightedL1Error(_WeightedError):
    order: int = field(default=1)


@dataclass
class WeightedL2Error(_WeightedError):
    order: int = field(default=2)
