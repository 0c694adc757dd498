"""Full-pipeline multi-chip e2e (BASELINE config #5 shape): frontend +
sharded loop-candidate detection + distributed Schur LM on the virtual
8-device mesh, compared against the single-device backend."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from my_lidar_graph_slam_v2_tpu.datasets import synthetic
from my_lidar_graph_slam_v2_tpu.parallel.mesh import make_mesh
from my_lidar_graph_slam_v2_tpu.pipeline.factory import (
    create_default_backend,
    create_default_slam,
    create_distributed_backend,
)


def _run(backend, *, small=False):
    world = synthetic.World.office(seed=21, size=10.0)
    traj = synthetic.loop_trajectory(size=10.0, laps=1.25, step=0.3)
    seq = synthetic.generate(
        world, traj, n_beams=121, max_range=10.0,
        range_noise=0.01, odom_noise=(0.05, 0.02), seed=22,
    )
    slam = create_default_slam(
        map_rows=384 if small else 512, map_cols=384 if small else 512,
        beam_capacity=256,
        samples_per_beam=192 if small else 256, usable_range_max=10.0,
        n_theta_max=48 if small else 64, crop=256 if small else 320,
        backend=backend,
        builder_overrides=dict(travel_dist_threshold=1.5),
    )
    gt = []
    for scan, g in zip(seq.scans, seq.ground_truth):
        if slam.process_scan(scan, scan.odom_pose):
            gt.append(g)
    slam.stop_backend()
    est = slam.get_trajectory()
    ate = synthetic.ate_rmse(est, np.asarray(gt))
    n_loops = sum(1 for e in slam.pose_graph.edges if e.is_loop)
    return ate, n_loops


def test_distributed_pipeline_smoke():
    """Fast default-tier check: the full pipeline with the sharded backend
    on the 8-device mesh closes the loop and lands a sane ATE."""
    mesh = make_mesh()
    kw = dict(
        usable_range_max=10.0, n_theta_max=48, crop=256,
        beam_capacity=256,
        searcher_overrides=dict(travel_dist_threshold=10.0, node_dist_threshold=5.0),
    )
    ate_d, loops_d = _run(create_distributed_backend(mesh, **kw), small=True)
    assert loops_d >= 1, "distributed detector found no loops"
    assert ate_d < 0.12, f"distributed ATE {ate_d:.3f}"


@pytest.mark.slow
def test_distributed_pipeline_matches_single():
    mesh = make_mesh()
    kw = dict(
        usable_range_max=10.0, n_theta_max=64, crop=320,
        beam_capacity=256,
        searcher_overrides=dict(travel_dist_threshold=10.0, node_dist_threshold=5.0),
    )
    ate_s, loops_s = _run(create_default_backend(**kw))
    ate_d, loops_d = _run(create_distributed_backend(mesh, **kw))
    assert loops_d >= 1, "distributed detector found no loops"
    assert ate_d < 0.12, f"distributed ATE {ate_d:.3f}"
    # same detector core -> comparable closure quality
    assert ate_d == pytest.approx(ate_s, abs=0.05)
