"""Config-selectable cost functions for the matcher family.

Mirrors the reference's cost-function factory layer
(``cost_function_factory.cpp:51-66``: CostType in {"SquareError",
"GreedyEndpoint"}, parameters from the named CostConfigGroup) so every
matcher evaluates its winner's cost/covariance through a configured
``CostConfig`` instead of a hard-wired square error — the same dispatch
``scan_matcher_factory.cpp:30-89`` performs per matcher.

``CostConfig`` is a frozen (hashable) dataclass, so it rides along as a
static argument of the jitted matcher cores; the dispatch happens at
trace time and costs nothing at runtime.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..ops import gauss_newton, greedy_endpoint

COST_SQUARE_ERROR = "SquareError"
COST_GREEDY_ENDPOINT = "GreedyEndpoint"


@dataclass(frozen=True)
class CostConfig:
    """CostType + the union of both cost groups' parameters
    (reference defaults: ``launcher_settings_default.json`` CostSquareError
    / CostGreedyEndpoint groups)."""

    cost_type: str = COST_SQUARE_ERROR
    # SquareError (cost_function_square_error.cpp:131-146)
    covariance_scale: float = 1e4
    # GreedyEndpoint (cost_function_greedy_endpoint.cpp)
    hit_and_missed_dist: float = 0.075
    occupancy_threshold: float = 0.1
    kernel_size: int = 1
    standard_deviation: float = 0.05
    scaling_factor: float = 1.0

    def __post_init__(self):
        if self.cost_type not in (COST_SQUARE_ERROR, COST_GREEDY_ENDPOINT):
            raise ValueError(f"unknown cost type: {self.cost_type}")


def cost_at(ccfg: CostConfig, prob, observed, ranges, angles, mask,
            sensor_pose, resolution, offset_xy):
    """Total cost at a map-local sensor pose (trace-time dispatch)."""
    if ccfg.cost_type == COST_SQUARE_ERROR:
        return gauss_newton.cost(
            prob, observed, ranges, angles, mask, sensor_pose,
            resolution, offset_xy,
        )
    kx, ky, kc, kd = greedy_endpoint.make_kernel_tables(
        ccfg.kernel_size, resolution, ccfg.standard_deviation
    )
    return greedy_endpoint.cost(
        prob, observed, ranges, angles, mask, sensor_pose,
        resolution, offset_xy,
        kernel_ox=kx, kernel_oy=ky, kernel_cost=kc, default_cost=kd,
        hit_and_missed_dist=ccfg.hit_and_missed_dist,
        occupancy_threshold=ccfg.occupancy_threshold,
        scaling_factor=ccfg.scaling_factor,
    )


def covariance_at(ccfg: CostConfig, prob, observed, ranges, angles, mask,
                  sensor_pose, resolution, offset_xy):
    """Pose covariance at a map-local sensor pose.

    SquareError: scale * H^{-1} (cost_function_square_error.cpp:131-146).
    GreedyEndpoint: numeric-gradient g g^T + 0.1 I
    (cost_function_greedy_endpoint.cpp:105-162)."""
    if ccfg.cost_type == COST_SQUARE_ERROR:
        return gauss_newton.covariance(
            prob, observed, ranges, angles, mask, sensor_pose,
            resolution, offset_xy, ccfg.covariance_scale,
        )

    def fn(p):
        return cost_at(ccfg, prob, observed, ranges, angles, mask, p,
                       resolution, offset_xy)

    _, cov = greedy_endpoint.gradient_and_covariance(
        fn, jnp.asarray(sensor_pose), resolution
    )
    return cov
