"""Full SLAM with loop closure on a synthetic loop (BASELINE config #2:
multi-resolution CSM + loop detection + online pose-graph updates)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from my_lidar_graph_slam_v2_tpu.datasets import synthetic
from my_lidar_graph_slam_v2_tpu.pipeline.factory import (
    create_default_backend,
    create_default_slam,
)


@pytest.fixture(scope="module")
def loop_run():
    world = synthetic.World.office(seed=1, size=10.0)
    traj = synthetic.loop_trajectory(size=10.0, laps=1.15, step=0.16)
    seq = synthetic.generate(
        world, traj, n_beams=141, max_range=10.0,
        range_noise=0.01, odom_noise=(0.05, 0.02), seed=7,
    )
    backend = create_default_backend(
        beam_capacity=256, usable_range_max=10.0,
        n_theta_max=64, crop=384,
        searcher_overrides=dict(travel_dist_threshold=6.0),
    )
    slam = create_default_slam(
        map_rows=512, map_cols=512, beam_capacity=256,
        samples_per_beam=320, usable_range_max=10.0,
        n_theta_max=64, crop=320, backend=backend,
    )
    slam.start_backend()
    gts = []
    for scan, gt in zip(seq.scans, seq.ground_truth):
        if slam.process_scan(scan, scan.odom_pose):
            gts.append(gt)
    slam.stop_backend()
    est = slam.get_trajectory()
    return slam, est, np.asarray(gts), seq


def test_loop_edges_created(loop_run):
    slam, est, gts, seq = loop_run
    loops = [e for e in slam.pose_graph.edges if e.is_loop]
    assert len(loops) >= 1, "no loop closures detected over a full lap"


def test_ate_with_loop_closure(loop_run):
    slam, est, gts, seq = loop_run
    ate = synthetic.ate_rmse(est, gts)
    odom = np.stack([s.odom_pose for s in seq.scans])
    ate_odom = synthetic.ate_rmse(odom, seq.ground_truth)
    # Loop closure must beat drifting odometry clearly
    assert ate < 0.6 * ate_odom, (ate, ate_odom)
    assert ate < 0.15, f"ATE {ate:.3f} m"


def test_suffix_propagation_consistency(loop_run):
    """Map-local scan poses inside finished maps are invariant; global
    poses must satisfy global == compound(map_global, local)."""
    slam, est, gts, seq = loop_run
    from my_lidar_graph_slam_v2_tpu.core import pose as P

    pg = slam.pose_graph
    for node in pg.scan_nodes:
        mp = pg.local_map_nodes[node.local_map_id].global_pose
        # The intra-map odometry edge for this node has the local pose
        # as its relative pose; finished maps keep this consistent after
        # optimization only approximately (the optimizer moves nodes
        # independently), so just check it is not wildly off.
        recon = P.compound(mp, node.local_pose)
        err = np.linalg.norm(recon[:2] - node.global_pose[:2])
        assert err < 0.5, err


def test_compact_finished_maps_equivalence():
    """Single-host memory policy (grid/builder LocalMap.compact): finished
    local maps drop their f32 build raster for the u8 matching form +
    bit-packed observed mask.  Loop edges and the global map must be
    IDENTICAL to a run with compaction off — matching already runs on the
    u8-quantized copy (grid/map_cache.py) and the global map is built
    from scans (builder.construct_global_map), so nothing downstream ever
    reads the dropped f32 raster.  Reference memory bar: 82-94 MB peak at
    Intel scale (experiments_old.md:199-225)."""
    world = synthetic.World.office(seed=3, size=9.0)
    traj = synthetic.loop_trajectory(size=9.0, laps=1.1, step=0.2)
    seq = synthetic.generate(
        world, traj, n_beams=121, max_range=10.0,
        range_noise=0.01, odom_noise=(0.03, 0.012), seed=3,
    )

    def run(compact):
        backend = create_default_backend(
            beam_capacity=256, usable_range_max=10.0,
            n_theta_max=64, crop=384,
            searcher_overrides=dict(travel_dist_threshold=5.0),
        )
        slam = create_default_slam(
            map_rows=512, map_cols=512, beam_capacity=256,
            samples_per_beam=320, usable_range_max=10.0,
            n_theta_max=64, crop=320, backend=backend,
            builder_overrides=dict(compact_finished_maps=compact),
        )
        slam.start_backend()
        for scan in seq.scans:
            slam.process_scan(scan, scan.odom_pose)
        slam.stop_backend()
        pose, gmap = slam.get_global_map()
        return slam, pose, np.asarray(gmap.prob)

    slam_c, pose_c, gmap_c = run(True)
    slam_n, pose_n, gmap_n = run(False)

    finished = [lm for lm in slam_c.builder.local_maps if lm.finished]
    assert finished, "run produced no finished local maps"
    for lm in finished:
        assert lm.compacted and lm.logodds is None and lm.holds_raster
        # the compact raster reproduces the matching form exactly
        r = lm.raster(slam_c.builder.cfg.resolution)
        assert r.prob.dtype == np.uint8

    loops_c = [(e.local_map_node_id, e.scan_node_id)
               for e in slam_c.pose_graph.edges if e.is_loop]
    loops_n = [(e.local_map_node_id, e.scan_node_id)
               for e in slam_n.pose_graph.edges if e.is_loop]
    assert loops_c == loops_n and len(loops_c) >= 1
    np.testing.assert_allclose(pose_c, pose_n, atol=1e-9)
    np.testing.assert_array_equal(gmap_c, gmap_n)

    # retention: compact form (device u8 + bool) is 2.5x smaller than
    # the f32+bool build raster it replaces in HBM
    h, w = slam_c.builder.cfg.local_map_rows, slam_c.builder.cfg.local_map_cols
    full_bytes = 5 * h * w
    for lm in finished:
        compact_bytes = lm.prob_q.nbytes + lm.observed.nbytes
        assert compact_bytes <= 0.41 * full_bytes
