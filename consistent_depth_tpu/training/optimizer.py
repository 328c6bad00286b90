"""Optimizer registry (reference: optimizer/__init__.py — torch Adam
only). optax equivalents with matching hyperparameter semantics:
torch Adam(lr, betas, eps=1e-8) == optax.adam(lr, b1, b2, eps=1e-8)
(both bias-corrected; optax eps_root=0)."""

from __future__ import annotations

import optax

OPTIMIZER_MAP = {
    "Adam": lambda lr, betas=(0.9, 0.999): optax.adam(
        lr, b1=betas[0], b2=betas[1], eps=1e-8),
    "SGD": lambda lr, betas=None: optax.sgd(lr),
    "AdamW": lambda lr, betas=(0.9, 0.999): optax.adamw(
        lr, b1=betas[0], b2=betas[1], eps=1e-8),
}

OPTIMIZER_NAMES = list(OPTIMIZER_MAP.keys())


def create(name: str, learning_rate: float, **kwargs) -> optax.GradientTransformation:
    return OPTIMIZER_MAP[name](learning_rate, **kwargs)
