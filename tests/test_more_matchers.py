"""Grid-search, branch-and-bound, hill-climbing matchers + greedy cost."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from my_lidar_graph_slam_v2_tpu.core import pose as P
from my_lidar_graph_slam_v2_tpu.matching.branch_bound import (
    BranchBoundConfig,
    ScanMatcherBranchBound,
)
from my_lidar_graph_slam_v2_tpu.matching.grid_search import (
    GridSearchConfig,
    ScanMatcherGridSearch,
)
from my_lidar_graph_slam_v2_tpu.matching.hill_climbing import (
    HillClimbingConfig,
    ScanMatcherHillClimbing,
)
from my_lidar_graph_slam_v2_tpu.matching.types import ScanMatchingQuery

from tests.test_matchers import RES, build_map, make_scan_arrays


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(21)
    true_pose = np.array([0.35, -0.25, 0.12])
    # Enough repeated observations that free cells drop below the greedy
    # endpoint gate (p < 0.1 needs ~14 miss updates at p_miss = 0.46)
    gm, geom = build_map(
        [np.array([0.0, 0.0, 0.0])] * 16 + [true_pose] * 16, rng=rng
    )
    scan = make_scan_arrays(true_pose)
    return gm, scan, true_pose


def test_grid_search_recovers(scene):
    gm, scan, true_pose = scene
    init = true_pose + np.array([0.3, -0.3, 0.1])
    m = ScanMatcherGridSearch(GridSearchConfig(
        range_x=1.0, range_y=1.0, range_theta=0.3, step_theta=0.01,
        crop_rows=384, crop_cols=384,
    ))
    s = m.optimize_pose(ScanMatchingQuery(gm, scan, init))
    assert s.pose_found
    err = s.estimated_pose - true_pose
    assert abs(err[0]) < 1.5 * RES and abs(err[1]) < 1.5 * RES
    assert abs(P.normalize_angle(err[2])) < 0.02


def test_branch_bound_recovers_and_matches_dense(scene):
    gm, scan, true_pose = scene
    init = true_pose + np.array([0.3, -0.3, 0.1])
    m = ScanMatcherBranchBound(BranchBoundConfig(
        node_height_max=4, range_x=1.0, range_y=1.0, range_theta=0.3,
        n_theta_max=64, crop_rows=384, crop_cols=384,
    ))
    s = m.optimize_pose(ScanMatchingQuery(gm, scan, init))
    assert s.pose_found
    err = s.estimated_pose - true_pose
    assert abs(err[0]) < 1.5 * RES and abs(err[1]) < 1.5 * RES
    assert abs(P.normalize_angle(err[2])) < 0.02
    assert s.normalized_score > 0.4


def test_branch_bound_equals_dense_gated_argmax(scene):
    """The bound-ordered while_loop must return exactly the winner of a
    dense fine sweep over the same window (the reference's prune rule
    never changes the argmax)."""
    import jax.numpy as jnp

    from my_lidar_graph_slam_v2_tpu.matching.branch_bound import (
        _branch_bound_core,
    )
    from my_lidar_graph_slam_v2_tpu.ops import csm

    gm, scan, true_pose = scene
    init = true_pose + np.array([0.3, -0.3, 0.1])
    cfg = BranchBoundConfig(
        node_height_max=4, range_x=1.0, range_y=1.0, range_theta=0.3,
        n_theta_max=64, crop_rows=384, crop_cols=384,
    )
    sensor_pose = jnp.asarray(init, jnp.float32)
    from my_lidar_graph_slam_v2_tpu.ops import pool as _pool

    pyr_p = _pool.pyramid_jit(gm.prob, cfg.bound_height)[-1]
    pyr_o = _pool.pyramid_jit(gm.observed, cfg.bound_height)[-1]
    pose_s, score, found, _, _ = _branch_bound_core(
        cfg, gm.prob, gm.observed, pyr_p, pyr_o,
        scan.ranges, scan.angles, scan.mask,
        sensor_pose, jnp.asarray(gm.offset_xy, jnp.float32),
        jnp.float32(0.2), jnp.float32(0.1),
    )
    assert bool(found)

    # Dense oracle over the identical window/steps
    wx, wy = cfg.win_cells
    nbx, nby = cfg.blocks
    block = 1 << cfg.bound_height
    T = cfg.n_theta_max
    step_t, t0i, tmask = csm.theta_search_params(
        scan.ranges, scan.mask, cfg.resolution, cfg.range_theta, T)
    hr, hc, valid, r0, c0 = csm.beam_cells(
        scan.ranges, scan.angles, scan.mask, sensor_pose, t0i, step_t,
        tmask, cfg.resolution, jnp.asarray(gm.offset_xy, jnp.float32),
        n_theta=T, crop_rows=cfg.crop_rows, crop_cols=cfg.crop_cols)
    img = csm.build_hit_images(hr, hc, valid, tmask,
                               crop_rows=cfg.crop_rows,
                               crop_cols=cfg.crop_cols)
    fs, fk = csm.sweep_from_hits(
        img, r0, c0, gm.prob, gm.observed, jnp.int32(-wx), jnp.int32(-wy),
        nx=nbx * block, ny=nby * block, stride=1, precision=cfg.precision)
    n = float(np.asarray(scan.mask, bool).sum())
    elig = np.asarray(tmask)[:, None, None] & (np.asarray(fk) / n > 0.1)
    s = np.where(elig, np.asarray(fs), -np.inf)
    assert float(score) == pytest.approx(s.max() / n, abs=1e-5)
    # winner offsets: recover from the returned sensor pose
    dx = float(pose_s[0] - sensor_pose[0]) / cfg.resolution
    dy = float(pose_s[1] - sensor_pose[1]) / cfg.resolution
    bt, by_, bx_ = np.unravel_index(int(s.argmax()), s.shape)
    assert round(dx) == bx_ - wx
    assert round(dy) == by_ - wy


def test_branch_bound_threshold_gating(scene):
    gm, scan, true_pose = scene
    init = true_pose + np.array([0.3, -0.3, 0.1])
    m = ScanMatcherBranchBound(BranchBoundConfig(
        node_height_max=4, range_x=1.0, range_y=1.0, range_theta=0.3,
        n_theta_max=64, crop_rows=384, crop_cols=384,
    ))
    # Impossible score threshold -> not found, offsets default to zero
    s = m.optimize_pose(
        ScanMatchingQuery(gm, scan, init), score_threshold=0.99
    )
    assert not s.pose_found
    np.testing.assert_allclose(s.estimated_pose, init, atol=1e-5)


def test_hill_climbing_improves(scene):
    gm, scan, true_pose = scene
    init = true_pose + np.array([0.06, -0.05, 0.03])
    m = ScanMatcherHillClimbing(HillClimbingConfig())
    s = m.optimize_pose(ScanMatchingQuery(gm, scan, init))
    err0 = np.linalg.norm(init[:2] - true_pose[:2])
    err1 = np.linalg.norm(s.estimated_pose[:2] - true_pose[:2])
    assert err1 <= err0 + 0.03
    assert np.all(np.isfinite(s.covariance))


def test_greedy_endpoint_cost_prefers_true_pose(scene):
    from my_lidar_graph_slam_v2_tpu.ops import greedy_endpoint as ge

    gm, scan, true_pose = scene
    kx, ky, kc, kd = ge.make_kernel_tables(1, RES, 0.05)
    off = jnp.asarray(gm.offset_xy, jnp.float32)

    def cost(p):
        return float(ge.cost(
            gm.prob, gm.observed, scan.ranges, scan.angles, scan.mask,
            jnp.asarray(p, jnp.float32), RES, off,
            kernel_ox=kx, kernel_oy=ky, kernel_cost=kc, default_cost=kd,
        ))

    c_true = cost(true_pose)
    c_off = cost(true_pose + np.array([0.4, 0.4, 0.2]))
    assert c_true < c_off


def test_branch_bound_pyramid_cached_per_map(scene):
    """Repeat matches against the same raster reuse the cached pyramid
    (the reference's per-local-map precomputed-map cache,
    loop_detector_branch_bound.cpp:83-89)."""
    from my_lidar_graph_slam_v2_tpu.matching import branch_bound as bb
    from my_lidar_graph_slam_v2_tpu.ops import pool

    gm, scan, true_pose = scene
    cfg = BranchBoundConfig(
        node_height_max=4, range_x=1.0, range_y=1.0, range_theta=0.3,
        n_theta_max=64, crop_rows=384, crop_cols=384,
    )
    m = bb.ScanMatcherBranchBound(cfg)
    # the scene fixture is shared across tests: start from a cold cache
    gm.coarse.pop(("pyr", cfg.bound_height), None)
    calls = []
    orig = pool.pyramid_jit

    def counting(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    pool.pyramid_jit, saved = counting, orig
    try:
        init = true_pose + np.array([0.2, -0.2, 0.05])
        s1 = m.optimize_pose(ScanMatchingQuery(gm, scan, init))
        n_after_first = len(calls)
        s2 = m.optimize_pose(ScanMatchingQuery(gm, scan, init))
    finally:
        pool.pyramid_jit = saved
    assert n_after_first == 2  # prob + observed, first call only
    assert len(calls) == n_after_first  # second detect: no recompute
    np.testing.assert_allclose(s1.estimated_pose, s2.estimated_pose)


def test_grid_search_arbitrary_steps(scene):
    """Arbitrary linear steps (reference accepts any,
    scan_matcher_grid_search.cpp:84-178): the general gather core must
    (a) agree with the integer-shift sweep when step == resolution and
    (b) find the true pose at a non-resolution step."""
    gm, scan, true_pose = scene
    init = true_pose + np.array([0.12, -0.09, 0.04])

    m_int = ScanMatcherGridSearch(GridSearchConfig(
        range_x=0.6, range_y=0.6, range_theta=0.2,
        step_x=RES, step_y=RES, step_theta=0.02, resolution=RES,
        crop_rows=384, crop_cols=384,
    ))
    s_int = m_int.optimize_pose(ScanMatchingQuery(gm, scan, init))

    # Same grid through the general core (force by epsilon-different step)
    eps = 1e-7
    m_gen = ScanMatcherGridSearch(GridSearchConfig(
        range_x=0.6, range_y=0.6, range_theta=0.2,
        step_x=RES + eps, step_y=RES + eps, step_theta=0.02, resolution=RES,
        crop_rows=384, crop_cols=384,
    ))
    assert not m_gen.cfg.integer_steps
    s_gen = m_gen.optimize_pose(ScanMatchingQuery(gm, scan, init))
    np.testing.assert_allclose(
        s_gen.estimated_pose, s_int.estimated_pose, atol=1e-4
    )
    assert s_gen.normalized_score == pytest.approx(
        s_int.normalized_score, abs=1e-3
    )

    # Genuinely non-resolution step: half-cell stepping still locks on
    m_half = ScanMatcherGridSearch(GridSearchConfig(
        range_x=0.5, range_y=0.5, range_theta=0.2,
        step_x=RES / 2, step_y=RES / 2, step_theta=0.02, resolution=RES,
        crop_rows=384, crop_cols=384,
    ))
    s_half = m_half.optimize_pose(ScanMatchingQuery(gm, scan, init))
    assert s_half.pose_found or s_half.normalized_score > 0.3
    assert np.linalg.norm(s_half.estimated_pose[:2] - true_pose[:2]) < 0.08
