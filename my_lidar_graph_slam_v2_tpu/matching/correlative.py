"""Real-time correlative scan matcher, TPU-native.

Functional equivalent of ``ScanMatcherCorrelative``
(``scan_matcher_correlative.cpp:116-368``) and its FPGA twin
(``scan_matcher_correlative_fpga.cpp``): instead of walking candidates
sequentially with coarse-map pruning against a running maximum, the whole
window is evaluated as two dense sweeps (ops/csm.py) and the winner picked
by a masked argmax:

* coarse sweep: stride ``low_resolution`` on the sliding-window-max map —
  used only for the score/known-rate *gating* semantics of the reference
  (a fine candidate is eligible iff its coarse block passes both
  thresholds; since the coarse map upper-bounds the fine scores, the
  surviving argmax is identical to the reference's prune-then-descend).
* fine sweep: stride 1 over the union of all coarse blocks
  ``[-win, -win + n_blocks*low_res)``, matching the reference's
  ``EvaluateHighResolutionMap`` block extent.
* tie-break: candidates ordered (theta, x, y) with first-wins argmax,
  matching the reference loop nesting.

The argmax pose is then polished by the caller's final matcher (GN); this
class also reports cost and covariance at the winner like the reference
(``scan_matcher_correlative.cpp:209-216``).
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
from .types import MapRaster, ScanArrays, ScanMatchingQuery, ScanMatchingSummary


@dataclass(frozen=True)
class CorrelativeConfig:
    low_resolution: int = 5
    range_x: float = 0.25
    range_y: float = 0.25
    range_theta: float = 0.5
    resolution: float = 0.05
    n_theta_max: int = 208
    crop_rows: int = 384
    crop_cols: int = 384
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
        nbx = (2 * wx) // self.low_resolution + 1
        nby = (2 * wy) // self.low_resolution + 1
        return nbx, nby


@functools.partial(
    jax.jit, static_argnames=("cfg",)
)
def _correlative_core(
    cfg: CorrelativeConfig,
    prob,
    observed,
    coarse_prob,
    coarse_observed,
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
    nxf, nyf = nbx * cfg.low_resolution, nby * cfg.low_resolution
    T = cfg.n_theta_max

    step_theta, theta0, theta_mask = csm.theta_search_params(
        ranges, mask, cfg.resolution, cfg.range_theta, T
    )
    n_valid = jnp.sum(mask).astype(jnp.float32)
    norm = 1.0 / jnp.maximum(n_valid, 1.0)

    # Shared beam geometry + hit images: the coarse and fine sweeps use
    # identical per-theta endpoint cells, so the (dominant) one-hot hit
    # image build happens once.
    hr, hc, valid, r0, c0 = csm.beam_cells(
        ranges, angles, mask, sensor_pose, theta0, step_theta, theta_mask,
        cfg.resolution, offset_xy,
        n_theta=T, crop_rows=cfg.crop_rows, crop_cols=cfg.crop_cols,
    )
    hit_img = csm.build_hit_images(
        hr, hc, valid, theta_mask,
        crop_rows=cfg.crop_rows, crop_cols=cfg.crop_cols,
    )
    x0 = jnp.int32(-wx)
    y0 = jnp.int32(-wy)
    c_scores, c_known = csm.sweep_from_hits(
        hit_img, r0, c0, coarse_prob, coarse_observed, x0, y0,
        nx=nbx, ny=nby, stride=cfg.low_resolution, precision=cfg.precision,
    )
    f_scores, f_known = csm.sweep_from_hits(
        hit_img, r0, c0, prob, observed, x0, y0,
        nx=nxf, ny=nyf, stride=1, precision=cfg.precision,
    )

    # Reference gating: a fine candidate is reachable iff its coarse block
    # beats BOTH thresholds (scan_matcher_correlative.cpp:178-189)
    block_ok = (c_scores * norm > score_threshold) & (
        c_known * norm > known_rate_threshold
    )  # [T, nby, nbx]
    ok = jnp.repeat(
        jnp.repeat(block_ok, cfg.low_resolution, axis=1),
        cfg.low_resolution,
        axis=2,
    )  # [T, nyf, nxf]
    eligible = ok & theta_mask[:, None, None]

    # Order (theta, x, y) to match the reference's loop nesting tie-break
    scores_txy = jnp.where(
        eligible, f_scores, -jnp.inf
    ).transpose(0, 2, 1)  # [T, nxf, nyf]
    flat = scores_txy.reshape(-1)
    best = jnp.argmax(flat)
    bt, bx, by = (
        best // (nxf * nyf),
        (best // nyf) % nxf,
        best % nyf,
    )
    best_sum = flat[best]
    best_score = best_sum * norm
    best_known = f_known.transpose(0, 2, 1).reshape(-1)[best] * norm
    pose_found = best_score > score_threshold

    best_sensor_pose = jnp.stack(
        [
            sensor_pose[0] + (bx.astype(jnp.float32) - wx) * cfg.resolution,
            sensor_pose[1] + (by.astype(jnp.float32) - wy) * cfg.resolution,
            sensor_pose[2]
            + (theta0 + bt).astype(jnp.float32) * step_theta,
        ]
    )

    cost_val = gauss_newton.cost(
        prob, observed, ranges, angles, mask, best_sensor_pose,
        cfg.resolution, offset_xy,
    )
    cov = gauss_newton.covariance(
        prob, observed, ranges, angles, mask, best_sensor_pose,
        cfg.resolution, offset_xy, cfg.covariance_scale,
    )
    # Candidate accounting (parity with the reference's NumOfProcessedNodes/
    # NumOfIgnoredNodes series, scan_matcher_correlative.cpp:16-71): fine
    # nodes whose coarse block passed both gates were "processed", the rest
    # of the window was pruned.
    n_processed = jnp.sum(eligible).astype(jnp.int32)
    n_total = (
        jnp.sum(theta_mask).astype(jnp.int32) * jnp.int32(nxf) * jnp.int32(nyf)
    )
    return (
        best_sensor_pose,
        best_score,
        best_known,
        pose_found,
        cost_val * norm,
        cov,
        n_processed,
        n_total,
    )


class MatcherMetrics:
    """The reference's per-matcher series set
    (``scan_matcher_correlative.cpp:16-71``), registered lazily under the
    matcher's name (times in microseconds like the reference's
    ``Timer::ElapsedMicro``)."""

    _NAMES = (
        "InputSetupTime", "OptimizationTime", "DiffTranslation",
        "DiffRotation", "WinSizeX", "WinSizeY", "WinSizeTheta",
        "StepSizeX", "StepSizeY", "StepSizeTheta", "NumOfIgnoredNodes",
        "NumOfProcessedNodes", "ScoreValue", "CostValue", "NumOfScans",
    )

    def __init__(self, matcher_name: str):
        from ..metrics.registry import MetricManager

        vs = MetricManager.instance().value_sequence
        for n in self._NAMES:
            setattr(self, n, vs(f"{matcher_name}.{n}"))


class ScanMatcherCorrelative:
    """Host-side wrapper holding the static config and coarse-map cache."""

    def __init__(self, cfg: CorrelativeConfig, name: str = "ScanMatcherCorrelative"):
        self.cfg = cfg
        self.name = name
        self.metrics = MatcherMetrics(name)

    def coarse_of(self, grid_map: MapRaster):
        key = ("swmax", self.cfg.low_resolution)
        if key not in grid_map.coarse:
            cp = pool.sliding_window_max2d(grid_map.prob, self.cfg.low_resolution)
            co = pool.sliding_window_max2d(grid_map.observed, self.cfg.low_resolution)
            grid_map.coarse[key] = (cp, co)
        return grid_map.coarse[key]

    def optimize_pose(
        self,
        query: ScanMatchingQuery,
        score_threshold: float = 0.0,
        known_rate_threshold: float = 0.0,
    ) -> ScanMatchingSummary:
        import time as _time

        t0 = _time.perf_counter()
        gm, scan = query.grid_map, query.scan
        sensor_pose = P.compound(query.initial_pose, scan.rel_sensor_pose)
        coarse_prob, coarse_obs = self.coarse_of(gm)
        mm = self.metrics
        mm.InputSetupTime.observe(int((_time.perf_counter() - t0) * 1e6))
        t1 = _time.perf_counter()
        (pose_s, score, known, found, ncost, cov, n_proc, n_total) = (
            _correlative_core(
                self.cfg,
                gm.prob,
                gm.observed,
                coarse_prob,
                coarse_obs,
                scan.ranges,
                scan.angles,
                scan.mask,
                jnp.asarray(sensor_pose, jnp.float32),
                jnp.asarray(gm.offset_xy, jnp.float32),
                jnp.float32(score_threshold),
                jnp.float32(known_rate_threshold),
            )
        )
        est_pose = P.move_backward(
            np.asarray(pose_s, np.float64), scan.rel_sensor_pose
        )
        mm.OptimizationTime.observe(int((_time.perf_counter() - t1) * 1e6))
        self._observe_metrics(
            query, scan, est_pose, score, ncost, int(n_proc), int(n_total)
        )
        return ScanMatchingSummary(
            pose_found=bool(found),
            normalized_cost=float(ncost),
            initial_pose=np.asarray(query.initial_pose),
            estimated_pose=est_pose,
            covariance=np.asarray(cov, np.float64),
            normalized_score=float(score),
            known_rate=float(known),
        )

    def _observe_metrics(
        self, query, scan, est_pose, score, ncost, n_proc, n_total
    ):
        """Observe the reference series (``scan_matcher_correlative.cpp:
        304-345``); window/step sizes recomputed host-side from the same
        formulas the jitted core uses."""
        cfg = self.cfg
        mm = self.metrics
        diff = P.inverse_compound(query.initial_pose, est_pose)
        mm.DiffTranslation.observe(float(P.distance(diff)))
        mm.DiffRotation.observe(abs(float(diff[2])))
        wx, wy = cfg.win_cells
        nbx, nby = cfg.blocks
        n_theta = n_total // (nbx * nby * cfg.low_resolution**2)
        valid = np.asarray(scan.mask, bool)
        max_range = float(np.max(np.where(valid, np.asarray(scan.ranges), 0.0)))
        step_theta = 2.0 * math.asin(0.5 * cfg.resolution / max(max_range, 1e-6))
        mm.WinSizeX.observe(2 * wx)
        mm.WinSizeY.observe(2 * wy)
        mm.WinSizeTheta.observe(n_theta)
        mm.StepSizeX.observe(cfg.resolution)
        mm.StepSizeY.observe(cfg.resolution)
        mm.StepSizeTheta.observe(step_theta)
        mm.NumOfIgnoredNodes.observe(n_total - n_proc)
        mm.NumOfProcessedNodes.observe(n_proc)
        mm.ScoreValue.observe(float(score))
        mm.CostValue.observe(float(ncost))
        mm.NumOfScans.observe(int(valid.sum()))
