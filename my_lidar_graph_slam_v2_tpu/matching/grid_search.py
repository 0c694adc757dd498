"""Exhaustive grid-search scan matcher.

Port of ``ScanMatcherGridSearch``
(``mapping/scan_matcher_grid_search.cpp:84-178``): full (x, y, theta)
enumeration with configured ranges/steps and pixel-accurate scoring, with
per-candidate score AND known-rate gating.  Steps equal to the map
resolution evaluate the whole grid as one dense integer-shift sweep
(ops/csm.py); arbitrary steps (the reference accepts any) run the general
per-theta gather core (``_pixel_scores_gather``) — identical scoring
semantics at fractional cell offsets.
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

    @property
    def integer_steps(self) -> bool:
        """Steps equal to the map resolution take the dense-sweep path
        (translations are integer cell shifts); any other step runs the
        general gather core — the reference accepts arbitrary steps
        (``scan_matcher_grid_search.cpp:84-178``)."""
        return (
            abs(self.step_x - self.resolution) <= 1e-9
            and abs(self.step_y - self.resolution) <= 1e-9
        )

    @property
    def wins(self):
        wx = int(math.ceil(0.5 * self.range_x / self.step_x))
        wy = int(math.ceil(0.5 * self.range_y / self.step_y))
        wt = int(math.ceil(0.5 * self.range_theta / self.step_theta))
        return wx, wy, wt


def _pixel_scores_gather(
    cfg, prob, observed, ranges, angles, mask, sensor_pose, offset_xy,
):
    """Pixel-accurate (score, known) over the full (theta, x, y) grid at
    ARBITRARY linear steps: per-theta beam endpoints, then one gather per
    (x, y) offset grid — the direct formulation of the reference's
    per-candidate ``ScorePixelAccurate`` loop, vectorized.  Used when
    ``step != resolution`` (fractional cell offsets change each beam's
    floor cell, so integer-shift sweeps cannot represent the grid)."""
    from ..ops import quant

    wx, wy, wt = cfg.wins
    T = 2 * wt + 1
    nx, ny = 2 * wx + 1, 2 * wy + 1
    h, w = prob.shape
    probf = quant.dequant_prob(prob)
    res = jnp.float32(cfg.resolution)
    dx = (jnp.arange(nx, dtype=jnp.float32) - wx) * cfg.step_x
    dy = (jnp.arange(ny, dtype=jnp.float32) - wy) * cfg.step_y
    thetas = (
        sensor_pose[2]
        + (jnp.arange(T, dtype=jnp.float32) - wt) * cfg.step_theta
    )
    mf = mask.astype(jnp.float32)

    def per_theta(_, theta):
        ang = theta + angles
        hx = sensor_pose[0] + ranges * jnp.cos(ang)  # [B]
        hy = sensor_pose[1] + ranges * jnp.sin(ang)
        cx = jnp.floor(
            (hx[None, None, :] + dx[:, None, None] - offset_xy[0]) / res
        ).astype(jnp.int32)  # [nx, 1, B] -> broadcast [nx, ny, B]
        cy = jnp.floor(
            (hy[None, None, :] + dy[None, :, None] - offset_xy[1]) / res
        ).astype(jnp.int32)
        cx, cy = jnp.broadcast_arrays(cx, cy)
        inside = (cx >= 0) & (cx < w) & (cy >= 0) & (cy < h)
        cxc = jnp.clip(cx, 0, w - 1)
        cyc = jnp.clip(cy, 0, h - 1)
        p = jnp.where(inside, probf[cyc, cxc], 0.0)
        o = jnp.where(inside, observed[cyc, cxc], False)
        score = jnp.sum(p * mf[None, None, :], axis=-1)  # [nx, ny]
        known = jnp.sum(o * mf[None, None, :], axis=-1)
        return None, (score, known)

    _, (scores, known) = jax.lax.scan(per_theta, None, thetas)
    return scores.transpose(0, 2, 1), known.transpose(0, 2, 1)  # [T, ny, nx]


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
    if cfg.integer_steps:
        scores, known = csm.csm_sweep(
            prob, observed, ranges, angles, mask, sensor_pose,
            jnp.int32(-wt), jnp.float32(cfg.step_theta), jnp.ones(T, bool),
            jnp.int32(-wx), jnp.int32(-wy), cfg.resolution, offset_xy,
            n_theta=T, nx=nx, ny=ny, stride=1,
            crop_rows=cfg.crop_rows, crop_cols=cfg.crop_cols,
            precision=cfg.precision,
        )
    else:
        scores, known = _pixel_scores_gather(
            cfg, prob, observed, ranges, angles, mask, sensor_pose,
            offset_xy,
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
    # Winner cost/covariance through the configured CostType (reference
    # dispatch: scan_matcher_factory.cpp:30-100) — NOT hard-wired square
    # error; a GreedyEndpoint-configured matcher must evaluate greedy
    # endpoint cost here.
    ccfg = cfg.cost or CostConfig(covariance_scale=cfg.covariance_scale)
    ncost = cost_at(
        ccfg, prob, observed, ranges, angles, mask, best_sensor_pose,
        cfg.resolution, offset_xy,
    ) * norm
    cov = covariance_at(
        ccfg, prob, observed, ranges, angles, mask, best_sensor_pose,
        cfg.resolution, offset_xy,
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
