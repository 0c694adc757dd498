"""Hill-climbing scan matcher.

Port of ``ScanMatcherHillClimbing``
(``mapping/scan_matcher_hill_climbing.cpp:63-169``): greedy 6-neighbor
(+-x, +-y, +-theta) descent on the greedy-endpoint cost with step halving
after stalls.  The 6 candidate costs per iteration are evaluated in one
vmapped jit; the sequential accept/refine loop runs on host (the loop is
short and inherently serial).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core import pose as P
from .cost import CostConfig, cost_at, covariance_at
from .types import ScanMatchingQuery, ScanMatchingSummary

_MOVES = np.array(
    [
        [1.0, 0.0, 0.0],
        [-1.0, 0.0, 0.0],
        [0.0, 1.0, 0.0],
        [0.0, -1.0, 0.0],
        [0.0, 0.0, 1.0],
        [0.0, 0.0, -1.0],
    ]
)


@dataclass(frozen=True)
class HillClimbingConfig:
    linear_step: float = 0.1
    angular_step: float = 0.1
    max_iterations: int = 100
    max_num_of_refinements: int = 5
    resolution: float = 0.05
    # Cost selected per config like the reference
    # (scan_matcher_factory.cpp:103-130); the reference default pairs
    # HillClimbing with CostGreedyEndpoint
    # (launcher_settings_default.json ScanMatcherHillClimbing group).
    cost: CostConfig = CostConfig(cost_type="GreedyEndpoint")


class ScanMatcherHillClimbing:
    def __init__(self, cfg: HillClimbingConfig):
        self.cfg = cfg
        ccfg = cfg.cost

        @jax.jit
        def costs_at(prob, observed, ranges, angles, mask, poses, offset_xy):
            def one(p):
                return cost_at(
                    ccfg, prob, observed, ranges, angles, mask, p,
                    cfg.resolution, offset_xy,
                )

            return jax.vmap(one)(poses)

        @jax.jit
        def cov_at(prob, observed, ranges, angles, mask, p, offset_xy):
            return covariance_at(
                ccfg, prob, observed, ranges, angles, mask, p,
                cfg.resolution, offset_xy,
            )

        self._costs_at = costs_at
        self._cov_at = cov_at

    def optimize_pose(self, query: ScanMatchingQuery, **_) -> ScanMatchingSummary:
        cfg = self.cfg
        gm, scan = query.grid_map, query.scan
        sensor_pose = np.asarray(
            P.compound(query.initial_pose, scan.rel_sensor_pose), np.float64
        )
        off = jnp.asarray(gm.offset_xy, jnp.float32)

        def costs(poses):
            return np.asarray(
                self._costs_at(
                    gm.prob, gm.observed, scan.ranges, scan.angles, scan.mask,
                    jnp.asarray(np.asarray(poses, np.float32)), off,
                )
            )

        min_cost = float(costs(sensor_pose[None])[0])
        best = sensor_pose.copy()
        lin, ang = cfg.linear_step, cfg.angular_step
        iters = refinements = 0
        while True:
            cand = best[None, :] + _MOVES * np.array([lin, lin, ang])[None, :]
            c = costs(cand)
            i = int(np.argmin(c))
            if c[i] < min_cost:
                min_cost = float(c[i])
                best = cand[i]
                updated = True
            else:
                refinements += 1
                lin *= 0.5
                ang *= 0.5
                updated = False
            iters += 1
            if not (
                (updated or refinements < cfg.max_num_of_refinements)
                and iters < cfg.max_iterations
            ):
                break

        n = max(scan.num_valid, 1)
        bp = jnp.asarray(best, jnp.float32)
        cov = self._cov_at(
            gm.prob, gm.observed, scan.ranges, scan.angles, scan.mask,
            bp, off,
        )
        est = P.move_backward(best, scan.rel_sensor_pose)
        return ScanMatchingSummary(
            pose_found=True,
            normalized_cost=min_cost / n,
            initial_pose=np.asarray(query.initial_pose),
            estimated_pose=est,
            covariance=np.asarray(cov, np.float64),
        )
