"""Exhaustive grid-search scan matcher.

Port of ``ScanMatcherGridSearch``
(``mapping/scan_matcher_grid_search.cpp:84-178``): full (x, y, theta)
enumeration with configured ranges/steps and pixel-accurate scoring, with
per-candidate score AND known-rate gating.  The whole grid is evaluated as
one dense sweep (ops/csm.py).  Linear steps must equal the map resolution
(the reference's default config) so translations are integer cell shifts.
"""
from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core import pose as P
from ..ops import csm, gauss_newton, pool
from .cost import CostConfig, cost_at, covariance_at
from .types import ScanMatchingQuery, ScanMatchingSummary


@dataclass(frozen=True)
class GridSearchConfig:
    range_x: float = 2.5
    range_y: float = 2.5
    range_theta: float = 0.5
    step_x: float = 0.05
    step_y: float = 0.05
    step_theta: float = 0.005
    resolution: float = 0.05
    crop_rows: int = 448
    crop_cols: int = 448
    covariance_scale: float = 1e4
    precision: str = "split"
    # Winner cost/covariance evaluator (reference CostType dispatch,
    # scan_matcher_factory.cpp:30-100); None = SquareError.
    cost: CostConfig = None

    def __post_init__(self):
        if abs(self.step_x - self.resolution) > 1e-9 or abs(
            self.step_y - self.resolution
        ) > 1e-9:
            raise ValueError(
                "grid-search linear steps must equal the map resolution"
            )

    @property
    def wins(self):
        wx = int(math.ceil(0.5 * self.range_x / self.step_x))
        wy = int(math.ceil(0.5 * self.range_y / self.step_y))
        wt = int(math.ceil(0.5 * self.range_theta / self.step_theta))
        return wx, wy, wt


@functools.partial(jax.jit, static_argnames=("cfg",))
def _grid_search_core(
    cfg, prob, observed, ranges, angles, mask, sensor_pose, offset_xy,
    score_threshold, known_rate_threshold,
):
    wx, wy, wt = cfg.wins
    T = 2 * wt + 1
    nx, ny = 2 * wx + 1, 2 * wy + 1
    n_valid = jnp.maximum(jnp.sum(mask).astype(jnp.float32), 1.0)
    norm = 1.0 / n_valid
    scores, known = csm.csm_sweep(
        prob, observed, ranges, angles, mask, sensor_pose,
        jnp.int32(-wt), jnp.float32(cfg.step_theta), jnp.ones(T, bool),
        jnp.int32(-wx), jnp.int32(-wy), cfg.resolution, offset_xy,
        n_theta=T, nx=nx, ny=ny, stride=1,
        crop_rows=cfg.crop_rows, crop_cols=cfg.crop_cols,
        precision=cfg.precision,
    )
    eligible = (scores * norm > score_threshold) & (
        known * norm > known_rate_threshold
    )
    # Reference iteration order: t outer, then x, then y; first max wins
    s_txy = jnp.where(eligible, scores, -jnp.inf).transpose(0, 2, 1)
    flat = s_txy.reshape(-1)
    best = jnp.argmax(flat)
    bt = best // (nx * ny)
    bx = (best // ny) % nx
    by = best % ny
    best_score = flat[best] * norm
    pose_found = best_score > score_threshold
    best_sensor_pose = jnp.stack(
        [
            sensor_pose[0] + (bx.astype(jnp.float32) - wx) * cfg.step_x,
            sensor_pose[1] + (by.astype(jnp.float32) - wy) * cfg.step_y,
            sensor_pose[2] + (bt.astype(jnp.float32) - wt) * cfg.step_theta,
        ]
    )
    ncost = gauss_newton.cost(
        prob, observed, ranges, angles, mask, best_sensor_pose,
        cfg.resolution, offset_xy,
    ) * norm
    cov = gauss_newton.covariance(
        prob, observed, ranges, angles, mask, best_sensor_pose,
        cfg.resolution, offset_xy, cfg.covariance_scale,
    )
    return best_sensor_pose, best_score, pose_found, ncost, cov


class ScanMatcherGridSearch:
    def __init__(self, cfg: GridSearchConfig):
        self.cfg = cfg

    def optimize_pose(
        self, query: ScanMatchingQuery,
        score_threshold: float = 0.0, known_rate_threshold: float = 0.0,
    ) -> ScanMatchingSummary:
        gm, scan = query.grid_map, query.scan
        sensor_pose = P.compound(query.initial_pose, scan.rel_sensor_pose)
        # Single device->host fetch of the whole result tuple (per-scalar
        # lazy reads would each pay a device round trip)
        pose_s, score, found, ncost, cov = jax.device_get(_grid_search_core(
            self.cfg, gm.prob, gm.observed, scan.ranges, scan.angles,
            scan.mask, jnp.asarray(sensor_pose, jnp.float32),
            jnp.asarray(gm.offset_xy, jnp.float32),
            jnp.float32(score_threshold), jnp.float32(known_rate_threshold),
        ))
        est = P.move_backward(np.asarray(pose_s, np.float64), scan.rel_sensor_pose)
        return ScanMatchingSummary(
            pose_found=bool(found),
            normalized_cost=float(ncost),
            initial_pose=np.asarray(query.initial_pose),
            estimated_pose=est,
            covariance=np.asarray(cov, np.float64),
            normalized_score=float(score),
        )
