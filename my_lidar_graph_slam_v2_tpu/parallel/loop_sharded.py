"""Sharded batched loop detection: candidate fan-out across chips.

Generalizes the reference's two-IP-core parallel loop detector
(``loop_detector_fpga_parallel.cpp:32-68``, static halving of the query
list over 2 accelerators) to N devices: candidates are padded to a device
multiple and ``shard_map``-ed over the mesh's candidate axis; inside each
device the per-candidate correlative search runs under ``vmap``.  Each
candidate carries its own reference local-map raster (the equivalent of
the FPGA streaming the map unless BRAM-cached; here maps ride along in the
sharded batch and stay in HBM).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core import pose as P2
from ..matching.correlative import (
    CorrelativeConfig,
    _correlative_core,
    correlative_core_jit,
)
from ..ops import pool
from .mesh import AXIS_CANDIDATES


def _coarse_of(raster, low_resolution: int):
    """Per-raster cached sliding-window-max coarse maps (same cache slot
    the serial matcher uses, matching/correlative.py:coarse_of)."""
    key = ("swmax", low_resolution)
    if key not in raster.coarse:
        raster.coarse[key] = (
            pool.sliding_window_max2d(raster.prob, low_resolution),
            pool.sliding_window_max2d(raster.observed, low_resolution),
        )
    return raster.coarse[key]


def make_batched_loop_csm(mesh: Mesh, cfg: CorrelativeConfig):
    """Returns fn(stacked candidate arrays) -> per-candidate results, with
    the candidate axis sharded over the mesh."""

    def single(prob, observed, ranges, angles, mask, sensor_pose, offset_xy,
               score_thr, known_thr):
        coarse_p = pool.sliding_window_max2d(prob, cfg.low_resolution)
        coarse_o = pool.sliding_window_max2d(observed, cfg.low_resolution)
        # Drop the per-candidate node-accounting tail (batch detectors
        # aggregate their own counters) but keep the top-K exactness flag
        # so the host can re-run pruned-inexact candidates densely.
        out = _correlative_core(
            cfg, prob, observed, coarse_p, coarse_o,
            ranges, angles, mask, sensor_pose, offset_xy,
            score_thr, known_thr,
        )
        return out[:6] + (out[8],)

    batched = jax.vmap(single, in_axes=(0, 0, 0, 0, 0, 0, 0, None, None))

    if mesh.devices.size == 1:
        # Single device: the vmap core alone is the whole batch — one
        # dispatch for ALL candidates of a backend step (vs one dispatch
        # per candidate in the serial detector), no shard_map wrapper
        # needed (round-4 verdict #4).
        return jax.jit(batched)

    sharded = jax.shard_map(
        batched,
        mesh=mesh,
        in_specs=(
            P(AXIS_CANDIDATES), P(AXIS_CANDIDATES), P(AXIS_CANDIDATES),
            P(AXIS_CANDIDATES), P(AXIS_CANDIDATES), P(AXIS_CANDIDATES),
            P(AXIS_CANDIDATES), P(), P(),
        ),
        out_specs=(
            P(AXIS_CANDIDATES), P(AXIS_CANDIDATES), P(AXIS_CANDIDATES),
            P(AXIS_CANDIDATES), P(AXIS_CANDIDATES), P(AXIS_CANDIDATES),
            P(AXIS_CANDIDATES),
        ),
    )
    return jax.jit(sharded)


class LoopDetectorShardedCorrelative:
    """Drop-in loop detector running all candidates as one sharded batch.

    Equivalent results to ``loop.detector.LoopDetectorCorrelative`` (same
    matcher core); the final GN refinement runs per-hit on the host side
    afterwards, like the reference's final scan matcher."""

    def __init__(self, cfg, scan_matcher_cfg: CorrelativeConfig,
                 final_scan_matcher, mesh: Mesh, resolution: float = 0.05,
                 map_cache=None):
        from ..grid.map_cache import DeviceMapCache
        from ..metrics.registry import MetricManager

        self.cfg = cfg
        self.mcfg = scan_matcher_cfg
        self.final = final_scan_matcher
        self.mesh = mesh
        self.resolution = resolution
        self.map_cache = map_cache or DeviceMapCache(resolution)
        self._fn = make_batched_loop_csm(mesh, scan_matcher_cfg)
        # Bytes staged per detect() for the candidate map stack (u8 prob +
        # bool observed per candidate) — the transfer the FPGA's BRAM hit
        # avoids; tracked so cache wins are measurable.
        self._m_stack_bytes = MetricManager.instance().value_sequence(
            "LoopDetector.MapStackBytes"
        )

    def detect(self, queries) -> List[dict]:
        from ..loop.detector import scan_to_arrays
        from ..matching.types import ScanMatchingQuery

        if not queries:
            return []
        D = self.mesh.devices.size
        # Pad the candidate count to a power-of-two multiple of the device
        # count: the compiled batch shapes form a small bucket set (1, 2,
        # 4, ... per device) instead of one executable per distinct count.
        per_dev = max(1, -(-len(queries) // D))
        C = D * (1 << (per_dev - 1).bit_length())

        probs, obss, rngs, angs, msks, poses, offs = [], [], [], [], [], [], []
        rasters = {}
        for q in queries:
            lm = q["local_map"]
            if lm.local_map_id not in rasters:
                rasters[lm.local_map_id] = self.map_cache.raster(lm)
            raster = rasters[lm.local_map_id]
            arrays = scan_to_arrays(q["query_node"].scan_data, self.cfg.beam_capacity)
            map_local = P2.inverse_compound(
                q["local_map_node"].global_pose, q["query_node"].global_pose
            )
            sensor_pose = P2.compound(map_local, arrays.rel_sensor_pose)
            probs.append(raster.prob)
            obss.append(raster.observed)
            rngs.append(arrays.ranges)
            angs.append(arrays.angles)
            msks.append(arrays.mask)
            poses.append(np.asarray(sensor_pose, np.float32))
            offs.append(np.asarray(raster.offset_xy, np.float32))
        # Pad with copies of the first candidate (results discarded)
        while len(probs) < C:
            probs.append(probs[0])
            obss.append(obss[0])
            rngs.append(rngs[0])
            angs.append(angs[0])
            msks.append(msks[0])
            poses.append(poses[0])
            offs.append(offs[0])

        h, w = probs[0].shape
        self._m_stack_bytes.observe(C * h * w * 2)  # u8 prob + bool mask
        out = self._fn(
            jnp.stack(probs),
            jnp.stack(obss),
            jnp.stack(rngs),
            jnp.stack(angs),
            jnp.stack(msks),
            jnp.asarray(np.stack(poses)),
            jnp.asarray(np.stack(offs)),
            jnp.float32(self.cfg.score_threshold),
            jnp.float32(self.cfg.known_rate_threshold),
        )
        # np.array (not asarray): jax outputs view as read-only numpy, and
        # the dense-fallback path below overwrites per-candidate rows
        best_pose, score, known, found, ncost, cov, exact = (
            np.array(o) for o in out
        )

        results = []
        for i, q in enumerate(queries):
            if not exact[i]:
                # Top-K theta prune could not certify this candidate's
                # argmax — redo it densely through the serial core (rare).
                raster = rasters[q["local_map"].local_map_id]
                d = correlative_core_jit(
                    self.mcfg, raster.prob, raster.observed,
                    *_coarse_of(raster, self.mcfg.low_resolution),
                    jnp.asarray(rngs[i]), jnp.asarray(angs[i]),
                    jnp.asarray(msks[i]),
                    jnp.asarray(poses[i]), jnp.asarray(offs[i]),
                    jnp.float32(self.cfg.score_threshold),
                    jnp.float32(self.cfg.known_rate_threshold),
                    dense=True,
                )
                best_pose[i], score[i], known[i], found[i], ncost[i], cov[i] = (
                    np.asarray(o) for o in d[:6]
                )
            if not found[i]:
                continue
            arrays = scan_to_arrays(q["query_node"].scan_data, self.cfg.beam_capacity)
            raster = rasters[q["local_map"].local_map_id]
            est_robot = P2.move_backward(
                np.asarray(best_pose[i], np.float64), arrays.rel_sensor_pose
            )
            final = self.final.optimize_pose(
                ScanMatchingQuery(raster, arrays, est_robot)
            )
            results.append(
                dict(
                    relative_pose=final.estimated_pose,
                    local_map_id=q["local_map"].local_map_id,
                    scan_node_id=q["query_node"].node_id,
                    covariance=final.covariance,
                    score=float(score[i]),
                )
            )
        return results
