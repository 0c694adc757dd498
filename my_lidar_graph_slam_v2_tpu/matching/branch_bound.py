"""Branch-and-bound scan matcher (level-synchronous TPU formulation).

The reference (``mapping/scan_matcher_branch_bound.cpp:111-278``) runs a
best-first priority queue over a coarse-to-fine map pyramid (heights
0..node_height_max, window 2^h), with 4-way spatial splits and full theta
enumeration at the root.  Its bounds are admissible (the pyramid stores
window maxima), so the search returns exactly the leaf that maximizes the
fine score subject to the per-node gates:

* a leaf wins iff its fine score beats the running max AND its own (fine)
  known rate exceeds the threshold;
* ancestors only ever prune — never change the winner — because their
  coarse score/known-rate upper-bound their children's.

On TPU the data-dependent queue is hostile to XLA (SURVEY.md section 7,
hard part 2), so the equivalent *level-synchronous* computation is used:
evaluate every level of the pyramid as one dense strided sweep (each is a
single MXU correlation); the coarse levels reproduce the reference's
pruning exactly as eligibility masks, and the winner is the gated fine
argmax.  Dense level sweeps are geometric in total cost (sum_h T *
(W/2^h)^2 ~ 4/3 the finest level), so dropping the queue costs at most
~1.3x the work the reference's *worst case* does while being fully
parallel; the pyramid bounds still matter for the threshold semantics.

Search-window coverage mirrors the reference: blocks of 2^h_max cells from
-win, i.e. fine offsets span [-win, -win + n_blocks * 2^h_max).
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
from .types import ScanMatchingQuery, ScanMatchingSummary


@dataclass(frozen=True)
class BranchBoundConfig:
    node_height_max: int = 6
    range_x: float = 2.5
    range_y: float = 2.5
    range_theta: float = 0.5
    resolution: float = 0.05
    n_theta_max: int = 208
    crop_rows: int = 448
    crop_cols: int = 448
    covariance_scale: float = 1e4
    precision: str = "split"

    @property
    def win_cells(self):
        wx = int(math.ceil(0.5 * self.range_x / self.resolution))
        wy = int(math.ceil(0.5 * self.range_y / self.resolution))
        return wx, wy

    @property
    def blocks(self):
        wx, wy = self.win_cells
        step = 1 << self.node_height_max
        nbx = (2 * wx) // step + 1
        nby = (2 * wy) // step + 1
        return nbx, nby


@functools.partial(jax.jit, static_argnames=("cfg",))
def _branch_bound_core(
    cfg: BranchBoundConfig,
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
    wx, wy = cfg.win_cells
    nbx, nby = cfg.blocks
    top = 1 << cfg.node_height_max
    nxf, nyf = nbx * top, nby * top
    T = cfg.n_theta_max

    step_theta, theta0, theta_mask = csm.theta_search_params(
        ranges, mask, cfg.resolution, cfg.range_theta, T
    )
    n_valid = jnp.maximum(jnp.sum(mask).astype(jnp.float32), 1.0)
    norm = 1.0 / n_valid

    common = dict(
        ranges=ranges,
        angles=angles,
        beam_mask=mask,
        sensor_pose=sensor_pose,
        theta0_index=theta0,
        step_theta=step_theta,
        theta_mask=theta_mask,
        x0=jnp.int32(-wx),
        y0=jnp.int32(-wy),
        resolution=cfg.resolution,
        offset_xy=offset_xy,
    )

    # Ancestor (pyramid) gates never change the winner: a coarse node's
    # score and known-rate upper-bound every descendant's (window-max maps),
    # so "ancestor pruned" implies "leaf fails its own gate".  The winner is
    # therefore exactly the gated fine argmax, evaluated as one dense sweep
    # (the pyramid's job — skipping work — is obviated by evaluating the
    # level as a single MXU correlation; per-level sweeps would re-build the
    # T x crop^2 hit image once per level for no result change).
    eligible = theta_mask[:, None, None] & jnp.ones((T, nyf, nxf), bool)

    f_scores, f_known = csm.csm_sweep(
        prob, observed, n_theta=T, nx=nxf, ny=nyf, stride=1,
        crop_rows=cfg.crop_rows, crop_cols=cfg.crop_cols,
        precision=cfg.precision, **common,
    )
    eligible &= (f_known * norm > known_rate_threshold)
    s_txy = jnp.where(eligible, f_scores, -jnp.inf).transpose(0, 2, 1)
    flat = s_txy.reshape(-1)
    best = jnp.argmax(flat)
    bt = best // (nxf * nyf)
    bx = (best // nyf) % nxf
    by = best % nyf
    best_score = flat[best] * norm
    pose_found = best_score > score_threshold
    # Reference defaults best offsets to 0 when nothing clears the gates
    bx = jnp.where(pose_found, bx - wx, 0)
    by = jnp.where(pose_found, by - wy, 0)
    btt = jnp.where(pose_found, theta0 + bt, 0)

    best_sensor_pose = jnp.stack(
        [
            sensor_pose[0] + bx.astype(jnp.float32) * cfg.resolution,
            sensor_pose[1] + by.astype(jnp.float32) * cfg.resolution,
            sensor_pose[2] + btt.astype(jnp.float32) * step_theta,
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


class ScanMatcherBranchBound:
    def __init__(self, cfg: BranchBoundConfig):
        self.cfg = cfg

    def optimize_pose(
        self, query: ScanMatchingQuery,
        score_threshold: float = 0.0, known_rate_threshold: float = 0.0,
    ) -> ScanMatchingSummary:
        gm, scan = query.grid_map, query.scan
        sensor_pose = P.compound(query.initial_pose, scan.rel_sensor_pose)
        pose_s, score, found, ncost, cov = _branch_bound_core(
            self.cfg, gm.prob, gm.observed, scan.ranges, scan.angles,
            scan.mask, jnp.asarray(sensor_pose, jnp.float32),
            jnp.asarray(gm.offset_xy, jnp.float32),
            jnp.float32(score_threshold), jnp.float32(known_rate_threshold),
        )
        est = P.move_backward(np.asarray(pose_s, np.float64), scan.rel_sensor_pose)
        return ScanMatchingSummary(
            pose_found=bool(found),
            normalized_cost=float(ncost),
            initial_pose=np.asarray(query.initial_pose),
            estimated_pose=est,
            covariance=np.asarray(cov, np.float64),
            normalized_score=float(score),
        )
