"""Module factory: build a SLAM system from a config mapping.

Mirrors the reference's string-typed factory layer
(``src/my_lidar_graph_slam/slam_module_factory.cpp`` and the per-module
``*_factory.cpp`` files): module types are selected by name so configs
stay JSON-compatible with the reference's settings files
(``launcher_settings_default.json``).
"""
from __future__ import annotations

from typing import Optional

from ..grid.builder import GridMapBuilder, GridMapBuilderConfig
from ..matching.correlative import CorrelativeConfig, ScanMatcherCorrelative
from ..matching.linear_solver import LinearSolverConfig, ScanMatcherLinearSolver
from ..metrics.registry import MetricManager
from ..sensor.filters import ScanAccumulator, ScanInterpolator, ScanOutlierFilter
from .frontend import FrontendConfig, LidarGraphSlamFrontend
from .slam import LidarGraphSlam

def create_scan_matcher(type_name: str, **kw):
    if type_name == "RealTimeCorrelative":
        return ScanMatcherCorrelative(CorrelativeConfig(**kw))
    if type_name == "LinearSolver":
        return ScanMatcherLinearSolver(LinearSolverConfig(**kw))
    if type_name == "BranchBound":
        from ..matching.branch_bound import BranchBoundConfig, ScanMatcherBranchBound

        return ScanMatcherBranchBound(BranchBoundConfig(**kw))
    if type_name == "GridSearch":
        from ..matching.grid_search import GridSearchConfig, ScanMatcherGridSearch

        return ScanMatcherGridSearch(GridSearchConfig(**kw))
    if type_name == "HillClimbing":
        from ..matching.hill_climbing import HillClimbingConfig, ScanMatcherHillClimbing

        return ScanMatcherHillClimbing(HillClimbingConfig(**kw))
    raise ValueError(f"unknown scan matcher type: {type_name}")


def create_default_backend(
    *,
    resolution: float = 0.05,
    beam_capacity: int = 512,
    usable_range_max: float = 20.0,
    n_theta_max: int = 208,
    crop: int = 448,
    score_threshold: float = 0.55,
    known_rate_threshold: float = 0.6,
    searcher_overrides: Optional[dict] = None,
    optimizer_overrides: Optional[dict] = None,
    inline: bool = True,
    sharded: Optional[bool] = None,
):
    """Default backend: nearest searcher + real-time-correlative loop
    detector (2.5 m x 2.5 m x 0.5 rad window) + LM optimizer, matching
    ``launcher_settings_default.json`` /Backend.

    ``sharded=None`` (default) runs all of a backend step's loop
    candidates as ONE batched dispatch (vmap), fanned out across all
    local devices when more than one accelerator is present — the
    N-device generalization of the reference's 2-IP-core parallel
    detector (``loop_detector_fpga_parallel.cpp:32-68``), with identical
    loop edges to the serial detector (tests/test_parallel.py).  On CPU
    hosts the batch stays on one device even when virtual devices are
    forced (fan-out over ``xla_force_host_platform_device_count`` shards
    is pure overhead).  Pass False to force the serial per-candidate
    fused detector, True to require the full-mesh fan-out."""
    from ..graph.optimizer import OptimizerConfig, PoseGraphOptimizer
    from ..loop.detector import LoopDetectorConfig, LoopDetectorCorrelative
    from ..loop.searcher import LoopSearcherConfig, LoopSearcherNearest
    from .backend import LidarGraphSlamBackend

    mesh_devices = None
    if sharded is None:
        import jax

        devs = jax.devices()
        sharded = True  # batched detector at any device count
        if devs[0].platform == "cpu" and len(devs) > 1:
            mesh_devices = 1
    if sharded:
        from ..parallel.loop_sharded import LoopDetectorShardedCorrelative
        from ..parallel.mesh import make_mesh

        loop_cfg = CorrelativeConfig(
            range_x=2.5,
            range_y=2.5,
            range_theta=0.5,
            resolution=resolution,
            n_theta_max=n_theta_max,
            crop_rows=crop,
            crop_cols=crop,
        )
        final_matcher = ScanMatcherLinearSolver(
            LinearSolverConfig(resolution=resolution),
            name="LoopDetector.FinalScanMatcherLinearSolver",
        )
        detector = LoopDetectorShardedCorrelative(
            LoopDetectorConfig(
                score_threshold=score_threshold,
                known_rate_threshold=known_rate_threshold,
                beam_capacity=beam_capacity,
                usable_range_max=usable_range_max,
            ),
            loop_cfg,
            final_matcher,
            make_mesh(mesh_devices),
            resolution=resolution,
        )
        searcher = LoopSearcherNearest(
            LoopSearcherConfig(**(searcher_overrides or {}))
        )
        optimizer = PoseGraphOptimizer(
            OptimizerConfig(**(optimizer_overrides or {}))
        )
        return LidarGraphSlamBackend(searcher, detector, optimizer, inline=inline)

    from ..models.fused_matcher import FusedCorrelativeGNMatcher

    # Fused CSM + GN detector matcher: one device dispatch + one result
    # fetch per loop candidate (identical results to the two-stage pair;
    # the reference's detector also chains matcher -> final matcher,
    # loop_detector_correlative.cpp:59-156)
    loop_matcher = FusedCorrelativeGNMatcher(
        CorrelativeConfig(
            range_x=2.5,
            range_y=2.5,
            range_theta=0.5,
            resolution=resolution,
            n_theta_max=n_theta_max,
            crop_rows=crop,
            crop_cols=crop,
        ),
        LinearSolverConfig(resolution=resolution),
        name="LoopDetector.ScanMatcherCorrelative",
        final_name="LoopDetector.FinalScanMatcherLinearSolver",
    )
    final_matcher = ScanMatcherLinearSolver(
        LinearSolverConfig(resolution=resolution),
        name="LoopDetector.FinalScanMatcherLinearSolver",
    )
    detector = LoopDetectorCorrelative(
        LoopDetectorConfig(
            score_threshold=score_threshold,
            known_rate_threshold=known_rate_threshold,
            beam_capacity=beam_capacity,
            usable_range_max=usable_range_max,
        ),
        loop_matcher,
        final_matcher,
        resolution=resolution,
    )
    searcher = LoopSearcherNearest(
        LoopSearcherConfig(**(searcher_overrides or {}))
    )
    optimizer = PoseGraphOptimizer(OptimizerConfig(**(optimizer_overrides or {})))
    return LidarGraphSlamBackend(searcher, detector, optimizer, inline=inline)


def create_default_slam(
    *,
    resolution: float = 0.05,
    map_rows: int = 1024,
    map_cols: int = 1024,
    beam_capacity: int = 512,
    samples_per_beam: int = 768,
    usable_range_max: float = 20.0,
    n_theta_max: int = 208,
    crop: int = 320,  # reference FPGA map-window contract (scan_matcher_correlative_fpga.cpp:484-527)
    backend=None,
    fused_matcher: bool = True,
    frontend_overrides: Optional[dict] = None,
    builder_overrides: Optional[dict] = None,
    matcher_overrides: Optional[dict] = None,
) -> LidarGraphSlam:
    """The reference's default configuration: real-time correlative local
    matcher + linear-solver final matcher, outlier filter + interpolator."""
    builder_cfg = GridMapBuilderConfig(
        resolution=resolution,
        local_map_rows=map_rows,
        local_map_cols=map_cols,
        latest_map_rows=map_rows,
        latest_map_cols=map_cols,
        beam_capacity=beam_capacity,
        samples_per_beam=samples_per_beam,
        usable_range_max=usable_range_max,
        **(builder_overrides or {}),
    )
    matcher_cfg = dict(
        resolution=resolution,
        n_theta_max=n_theta_max,
        crop_rows=crop,
        crop_cols=crop,
        **(matcher_overrides or {}),
    )
    if fused_matcher:
        from ..models.fused_matcher import FusedCorrelativeGNMatcher

        scan_matcher = FusedCorrelativeGNMatcher(
            CorrelativeConfig(**matcher_cfg),
            LinearSolverConfig(resolution=resolution),
            name="LocalSlam.ScanMatcherCorrelative",
            final_name="LocalSlam.FinalScanMatcherLinearSolver",
        )
    else:
        scan_matcher = ScanMatcherCorrelative(
            CorrelativeConfig(**matcher_cfg),
            name="LocalSlam.ScanMatcherCorrelative",
        )
    final_matcher = ScanMatcherLinearSolver(
        LinearSolverConfig(resolution=resolution),
        name="LocalSlam.FinalScanMatcherLinearSolver",
    )
    fe_cfg = FrontendConfig(
        beam_capacity=beam_capacity,
        usable_range_max=usable_range_max,
        **(frontend_overrides or {}),
    )
    frontend = LidarGraphSlamFrontend(
        fe_cfg,
        scan_matcher,
        final_matcher,
        outlier_filter=ScanOutlierFilter(valid_range_max=usable_range_max),
        interpolator=ScanInterpolator(dist_scans=resolution),
        accumulator=ScanAccumulator() if fe_cfg.use_scan_accumulator else None,
        metrics=MetricManager.instance(),
    )
    builder = GridMapBuilder(builder_cfg)
    return LidarGraphSlam(frontend, backend, builder)


def create_distributed_backend(
    mesh,
    *,
    resolution: float = 0.05,
    beam_capacity: int = 512,
    usable_range_max: float = 20.0,
    n_theta_max: int = 208,
    crop: int = 448,
    score_threshold: float = 0.55,
    known_rate_threshold: float = 0.6,
    searcher_overrides: Optional[dict] = None,
    optimizer_overrides: Optional[dict] = None,
    inline: bool = True,
):
    """Multi-chip backend (BASELINE config #5): loop candidates fanned
    out across the mesh (the N-device generalization of the reference's
    2-IP-core ``LoopDetectorFPGAParallel``) and the pose-graph solve
    distributed via the Schur-complement LM over psum collectives."""
    from ..graph.optimizer import OptimizerConfig
    from ..loop.detector import LoopDetectorConfig
    from ..loop.searcher import LoopSearcherConfig, LoopSearcherNearest
    from ..parallel.distributed import DistributedPoseGraphOptimizer
    from ..parallel.loop_sharded import LoopDetectorShardedCorrelative
    from .backend import LidarGraphSlamBackend

    matcher_cfg = CorrelativeConfig(
        range_x=2.5,
        range_y=2.5,
        range_theta=0.5,
        resolution=resolution,
        n_theta_max=n_theta_max,
        crop_rows=crop,
        crop_cols=crop,
    )
    final_matcher = ScanMatcherLinearSolver(
        LinearSolverConfig(resolution=resolution),
        name="LoopDetector.FinalScanMatcherLinearSolver",
    )
    detector = LoopDetectorShardedCorrelative(
        LoopDetectorConfig(
            score_threshold=score_threshold,
            known_rate_threshold=known_rate_threshold,
            beam_capacity=beam_capacity,
            usable_range_max=usable_range_max,
        ),
        matcher_cfg,
        final_matcher,
        mesh,
        resolution=resolution,
    )
    searcher = LoopSearcherNearest(
        LoopSearcherConfig(**(searcher_overrides or {}))
    )
    optimizer = DistributedPoseGraphOptimizer(
        mesh, OptimizerConfig(**(optimizer_overrides or {}))
    )
    return LidarGraphSlamBackend(searcher, detector, optimizer, inline=inline)
