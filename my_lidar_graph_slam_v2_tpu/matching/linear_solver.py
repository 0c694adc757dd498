"""Gauss-Newton (damped) sub-pixel scan matcher.

Equivalent of ``ScanMatcherLinearSolver``
(``scan_matcher_linear_solver.cpp``): iterative H dp = b refinement of the
sensor pose on the square-error cost, with the reference's lambda
halve/double schedule. The whole iteration runs device-side as one fused
jit (``ops/gauss_newton.gn_refine``).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core import pose as P
from ..ops import gauss_newton
from .types import ScanMatchingQuery, ScanMatchingSummary


@dataclass(frozen=True)
class LinearSolverConfig:
    num_iterations_max: int = 10
    convergence_threshold: float = 1e-4
    initial_lambda: float = 1e-4
    resolution: float = 0.05
    covariance_scale: float = 1e4


@functools.partial(jax.jit, static_argnames=("cfg",))
def _refine_core(cfg, prob, observed, ranges, angles, mask, sensor_pose, offset_xy):
    n = jnp.maximum(jnp.sum(mask).astype(jnp.float32), 1.0)
    cost0 = gauss_newton.cost(
        prob, observed, ranges, angles, mask, sensor_pose,
        cfg.resolution, offset_xy,
    )
    pose, cost, iters = gauss_newton.gn_refine(
        prob, observed, ranges, angles, mask, sensor_pose,
        cfg.resolution, offset_xy,
        max_iterations=cfg.num_iterations_max,
        convergence_threshold=cfg.convergence_threshold,
        initial_lambda=cfg.initial_lambda,
    )
    cov = gauss_newton.covariance(
        prob, observed, ranges, angles, mask, pose,
        cfg.resolution, offset_xy, cfg.covariance_scale,
    )
    return pose, cost / n, cov, iters, cost0 / n


class LinearSolverMetrics:
    """Reference series set (``scan_matcher_linear_solver.cpp:15-53``)."""

    _NAMES = (
        "OptimizationTime", "DiffTranslation", "DiffRotation",
        "NumOfIterations", "InitialCost", "FinalCost", "NumOfScans",
    )

    def __init__(self, matcher_name: str):
        from ..metrics.registry import MetricManager

        vs = MetricManager.instance().value_sequence
        for n in self._NAMES:
            setattr(self, n, vs(f"{matcher_name}.{n}"))


class ScanMatcherLinearSolver:
    def __init__(self, cfg: LinearSolverConfig,
                 name: str = "FinalScanMatcherLinearSolver"):
        self.cfg = cfg
        self.name = name
        self.metrics = LinearSolverMetrics(name)

    def optimize_pose(self, query: ScanMatchingQuery, **_) -> ScanMatchingSummary:
        import time as _time

        t0 = _time.perf_counter()
        gm, scan = query.grid_map, query.scan
        sensor_pose = P.compound(query.initial_pose, scan.rel_sensor_pose)
        # Single device->host fetch of the whole result (see
        # models/fused_matcher.py — per-scalar reads each cost a round trip)
        pose, ncost, cov, iters, ncost0 = jax.device_get(
            _refine_core(
                self.cfg,
                gm.prob,
                gm.observed,
                scan.ranges,
                scan.angles,
                scan.mask,
                jnp.asarray(sensor_pose, jnp.float32),
                jnp.asarray(gm.offset_xy, jnp.float32),
            )
        )
        est_pose = P.move_backward(np.asarray(pose, np.float64), scan.rel_sensor_pose)
        mm = self.metrics
        mm.OptimizationTime.observe(int((_time.perf_counter() - t0) * 1e6))
        diff = P.inverse_compound(query.initial_pose, est_pose)
        mm.DiffTranslation.observe(float(P.distance(diff)))
        mm.DiffRotation.observe(abs(float(diff[2])))
        mm.NumOfIterations.observe(int(iters))
        mm.InitialCost.observe(float(ncost0))
        mm.FinalCost.observe(float(ncost))
        mm.NumOfScans.observe(int(scan.num_valid))
        return ScanMatchingSummary(
            pose_found=True,
            normalized_cost=float(ncost),
            initial_pose=np.asarray(query.initial_pose),
            estimated_pose=est_pose,
            covariance=np.asarray(cov, np.float64),
        )
