"""SLAM backend: loop search -> detection -> optimization -> write-back.

Mirrors ``LidarGraphSlamBackend::RunStep``
(``mapping/lidar_graph_slam_backend.cpp:93-198``): snapshot a loop-search
hint, generate candidates, detect loops, append loop edges, snapshot the
optimizable prefix, optimize, write poses back (with suffix propagation in
the facade).
"""
from __future__ import annotations

import time
from typing import Optional

from ..graph.optimizer import PoseGraphOptimizer
from ..loop.searcher import LoopSearcherNearest
from ..metrics.registry import MetricManager


class LidarGraphSlamBackend:
    def __init__(
        self,
        loop_searcher: LoopSearcherNearest,
        loop_detector,
        optimizer: PoseGraphOptimizer,
        metrics: Optional[MetricManager] = None,
        inline: bool = True,
    ):
        self.loop_searcher = loop_searcher
        self.loop_detector = loop_detector
        self.optimizer = optimizer
        self.inline = inline
        m = metrics or MetricManager.instance()
        self._m_step_time = m.value_sequence("Backend.StepTime")
        self._m_detections = m.value_sequence("Backend.NumOfDetections")
        self._m_candidates = m.value_sequence("Backend.NumOfCandidates")
        self._m_opt_iters = m.value_sequence("Backend.OptIterations")
        self._m_opt_error = m.value_sequence("Backend.OptFinalError")

    def run_step(self, parent) -> bool:
        """One backend pass; returns True if an optimization ran."""
        t0 = time.perf_counter()
        hint = parent.get_loop_search_hint()
        candidates = self.loop_searcher.search(hint)
        self._m_candidates.observe(len(candidates))
        if not candidates:
            self._m_step_time.observe(time.perf_counter() - t0)
            return False
        queries = parent.get_loop_detection_queries(candidates)
        results = self.loop_detector.detect(queries)
        self._m_detections.observe(len(results))
        if not results:
            self._m_step_time.observe(time.perf_counter() - t0)
            return False
        parent.append_loop_closing_edges(results)

        snapshot = parent.get_pose_graph_for_optimization()
        if snapshot is None:
            self._m_step_time.observe(time.perf_counter() - t0)
            return False
        # Block the frontend while poses are being rewritten
        # (NotifyOptimizationStarted/Done, lidar_graph_slam_backend.cpp:172-191)
        parent.notify_optimization_started()
        try:
            n_maps, n_scans, map_poses, scan_poses, edges = snapshot
            map_opt, scan_opt, stats = self.optimizer.optimize(
                map_poses, scan_poses, edges
            )
            parent.after_loop_closure(n_maps, n_scans, map_opt, scan_opt)
        finally:
            parent.notify_optimization_done()
        self._m_opt_iters.observe(stats.get("iterations", 0))
        self._m_opt_error.observe(stats.get("error", 0.0))
        self._m_step_time.observe(time.perf_counter() - t0)
        return True
