"""Fused frontend matcher: CSM window search + GN refinement in one jit.

The reference frontend runs two matchers back to back
(``lidar_graph_slam_frontend.cpp:210-237``): the correlative searcher and
the linear-solver (GN) refiner.  Device-side both are cheap; what is not
cheap is synchronizing with the host between them (this environment's TPU
tunnel costs ~30-60 ms per round trip).  This module compiles the whole
two-stage match — coarse map precompute, coarse+fine sweeps, gating,
argmax, iterative GN refinement, covariance — into ONE jitted function
with a single result fetch, and exposes it with the standard matcher API.

Results are identical to running ScanMatcherCorrelative followed by
ScanMatcherLinearSolver (same underlying ops), minus host latency.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core import pose as P
from ..matching.correlative import CorrelativeConfig, _correlative_core
from ..matching.linear_solver import LinearSolverConfig
from ..matching.types import ScanMatchingQuery, ScanMatchingSummary
from ..ops import gauss_newton, pool


@functools.partial(jax.jit, static_argnames=("ccfg", "lcfg"))
def _fused_core(
    ccfg: CorrelativeConfig,
    lcfg: LinearSolverConfig,
    prob,
    observed,
    ranges,
    angles,
    mask,
    sensor_pose,
    offset_xy,
    score_threshold,
    known_rate_threshold,
):
    coarse_p = pool.sliding_window_max2d(prob, ccfg.low_resolution)
    coarse_o = pool.sliding_window_max2d(observed, ccfg.low_resolution)
    (csm_pose, score, known, found, _, _) = _correlative_core(
        ccfg, prob, observed, coarse_p, coarse_o,
        ranges, angles, mask, sensor_pose, offset_xy,
        score_threshold, known_rate_threshold,
    )
    n = jnp.maximum(jnp.sum(mask).astype(jnp.float32), 1.0)
    refined, cost, iters = gauss_newton.gn_refine(
        prob, observed, ranges, angles, mask, csm_pose,
        ccfg.resolution, offset_xy,
        max_iterations=lcfg.num_iterations_max,
        convergence_threshold=lcfg.convergence_threshold,
        initial_lambda=lcfg.initial_lambda,
    )
    cov = gauss_newton.covariance(
        prob, observed, ranges, angles, mask, refined,
        ccfg.resolution, offset_xy, lcfg.covariance_scale,
    )
    return refined, cov, score, known, found, cost / n, iters


class FusedCorrelativeGNMatcher:
    """Drop-in two-stage matcher; ``fused = True`` tells the frontend to
    skip its separate final-matcher call."""

    fused = True

    def __init__(self, ccfg: CorrelativeConfig, lcfg: LinearSolverConfig):
        self.ccfg = ccfg
        self.lcfg = lcfg

    def optimize_pose(
        self,
        query: ScanMatchingQuery,
        score_threshold: float = 0.0,
        known_rate_threshold: float = 0.0,
    ) -> ScanMatchingSummary:
        gm, scan = query.grid_map, query.scan
        sensor_pose = P.compound(query.initial_pose, scan.rel_sensor_pose)
        out = _fused_core(
            self.ccfg, self.lcfg,
            gm.prob, gm.observed, scan.ranges, scan.angles, scan.mask,
            jnp.asarray(sensor_pose, jnp.float32),
            jnp.asarray(gm.offset_xy, jnp.float32),
            jnp.float32(score_threshold),
            jnp.float32(known_rate_threshold),
        )
        refined, cov, score, known, found, ncost, iters = jax.device_get(out)
        est = P.move_backward(np.asarray(refined, np.float64), scan.rel_sensor_pose)
        return ScanMatchingSummary(
            pose_found=bool(found),
            normalized_cost=float(ncost),
            initial_pose=np.asarray(query.initial_pose),
            estimated_pose=est,
            covariance=np.asarray(cov, np.float64),
            normalized_score=float(score),
            known_rate=float(known),
        )
