"""Robust M-estimator kernels.

Vectorized port of ``mapping/robust_loss_function.{hpp,cpp}``: each kernel
maps a squared error ``t = e^T Lambda e`` to a loss rho(t) and an IRLS
weight rho'(t). Names and formulas match the reference exactly; the
default for pose-graph optimization is Huber with scale 0.01
(``launcher_settings_default.json`` /PoseGraphOptimizerLM).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class LossFunction:
    kind: str = "Huber"
    scale: float = 0.01

    def loss(self, t):
        s = self.scale
        k = self.kind
        if k == "Squared":
            return t
        if k == "Huber":
            return jnp.where(t <= s, t, 2.0 * jnp.sqrt(s * t) - s)
        if k == "Cauchy":
            return s * jnp.log1p(t / s)
        if k == "Fair":
            r = jnp.sqrt(t / s)
            return 2.0 * s * (r - jnp.log1p(r))
        if k == "GemanMcClure" or k == "DCS":
            return s * t / (s + t)
        if k == "Welsch":
            return s * -jnp.expm1(-t / s)
        raise ValueError(f"unknown loss kind {k}")

    def weight(self, t):
        s = self.scale
        k = self.kind
        if k == "Squared":
            return jnp.ones_like(t)
        if k == "Huber":
            return jnp.where(t <= s, 1.0, jnp.sqrt(s / jnp.maximum(t, 1e-300)))
        if k == "Cauchy":
            return s / (s + t)
        if k == "Fair":
            return 1.0 / (1.0 + jnp.sqrt(t / s))
        if k == "GemanMcClure":
            return (s / (s + t)) ** 2
        if k == "Welsch":
            return jnp.exp(-t / s)
        if k == "DCS":
            return jnp.where(t <= s, 1.0, (2.0 * s / (s + t)) ** 2)
        raise ValueError(f"unknown loss kind {k}")


LOSS_KINDS = (
    "Squared",
    "Huber",
    "Cauchy",
    "Fair",
    "GemanMcClure",
    "Welsch",
    "DCS",
)
