"""End-to-end odometry-only SLAM on a synthetic world (BASELINE config #1:
single-resolution CSM, no loop closure)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from my_lidar_graph_slam_v2_tpu.datasets import synthetic
from my_lidar_graph_slam_v2_tpu.pipeline.factory import create_default_slam


@pytest.fixture(scope="module")
def run_result():
    world = synthetic.World.office(seed=1, size=10.0)
    traj = synthetic.loop_trajectory(size=10.0, laps=0.25, step=0.08)
    seq = synthetic.generate(
        world, traj, n_beams=181, max_range=10.0,
        range_noise=0.01, odom_noise=(0.03, 0.01), seed=2,
    )
    slam = create_default_slam(
        map_rows=512, map_cols=512, beam_capacity=512,
        samples_per_beam=320, usable_range_max=10.0,
        n_theta_max=96, crop=320,
    )
    gt_at_keyframe = []
    for scan, gt in zip(seq.scans, seq.ground_truth):
        updated = slam.process_scan(scan, scan.odom_pose)
        if updated:
            gt_at_keyframe.append(gt)
    est = slam.get_trajectory()
    return slam, est, np.asarray(gt_at_keyframe), seq


def test_trajectory_tracks_ground_truth(run_result):
    slam, est, gt, seq = run_result
    assert len(est) == len(gt)
    assert len(est) >= 10
    ate = synthetic.ate_rmse(est, gt)
    # Odometry-only drift over a short arc should stay small with CSM
    assert ate < 0.05, f"ATE {ate:.3f} m"
    # ... and beat raw odometry
    odom = np.stack([s.odom_pose for s in seq.scans])
    ate_odom = synthetic.ate_rmse(odom, seq.ground_truth)
    assert ate < ate_odom, (ate, ate_odom)


def test_pose_graph_structure(run_result):
    slam, est, gt, _ = run_result
    pg = slam.pose_graph
    assert len(pg.scan_nodes) == len(est)
    assert len(pg.local_map_nodes) >= 1
    # every scan node has exactly one intra-map odometry edge
    intra = [e for e in pg.edges if e.edge_type == 0]
    assert len(intra) == len(pg.scan_nodes)
    # all but the latest local map are finished
    for n in pg.local_map_nodes[:-1]:
        assert n.finished


def test_global_map_construction(run_result):
    slam, est, gt, _ = run_result
    map_pose, raster = slam.get_global_map()
    prob = np.asarray(raster.prob)
    occupied = (prob > 0.55).sum()
    free = ((prob > 0) & (prob < 0.5)).sum()
    assert occupied > 200
    assert free > 10 * occupied  # corridors are mostly free space
