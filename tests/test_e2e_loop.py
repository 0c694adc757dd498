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
