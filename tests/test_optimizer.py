import numpy as np
import pytest

jax = pytest.importorskip("jax")

from my_lidar_graph_slam_v2_tpu.core import pose as P
from my_lidar_graph_slam_v2_tpu.graph.loss import LossFunction
from my_lidar_graph_slam_v2_tpu.graph.optimizer import (
    OptimizerConfig,
    PoseGraphOptimizer,
)


def build_loop_graph(n_maps=8, scans_per_map=6, noise=0.03, seed=0):
    """Synthetic bipartite pose graph: maps around a circle, scans around
    each map, odometry edges with drifty relative poses, plus one correct
    loop edge closing the circle. Returns ground truth + noisy init."""
    rng = np.random.default_rng(seed)
    R = 5.0
    gt_maps = []
    gt_scans = []
    for i in range(n_maps):
        a = 2 * np.pi * i / n_maps
        gt_maps.append([R * np.cos(a), R * np.sin(a), a + np.pi / 2])
    gt_maps = np.array(gt_maps)
    map_idx, scan_idx, is_loop, rels, infos = [], [], [], [], []
    info = np.diag([100.0, 100.0, 400.0])
    sid = 0
    for i in range(n_maps):
        if i > 0:
            # Inter-map odometry edge: previous map node -> first scan of
            # this map (mirrors AppendLocalMap, grid_map_builder.cpp:209-241)
            a0 = 2 * np.pi * i / n_maps
            first_scan = [R * np.cos(a0), R * np.sin(a0), a0 + np.pi / 2]
            rel0 = P.inverse_compound(gt_maps[i - 1], np.array(first_scan))
            rel0 = rel0 + rng.normal(0, noise, 3) * [1, 1, 0.5]
            map_idx.append(i - 1)
            scan_idx.append(sid)  # ties to the first scan added below
            is_loop.append(0)
            rels.append(rel0)
            infos.append(info)
        for k in range(scans_per_map):
            a = 2 * np.pi * (i + k / scans_per_map / 2) / n_maps
            gt_scans.append([R * np.cos(a), R * np.sin(a), a + np.pi / 2])
            rel = P.inverse_compound(gt_maps[i], np.array(gt_scans[-1]))
            rel = rel + rng.normal(0, noise, 3) * [1, 1, 0.5]
            map_idx.append(i)
            scan_idx.append(sid)
            is_loop.append(0)
            rels.append(rel)
            infos.append(info)
            sid += 1
    gt_scans = np.array(gt_scans)
    # Loop edge: map 0 <-> last scan (exact relative pose, high info)
    rel = P.inverse_compound(gt_maps[0], gt_scans[-1])
    map_idx.append(0)
    scan_idx.append(sid - 1)
    is_loop.append(1)
    rels.append(rel)
    infos.append(np.diag([400.0, 400.0, 1600.0]))

    # Noisy initialization: drift grows along the trajectory
    drift = np.cumsum(rng.normal(0, 0.05, (n_maps, 3)) * [1, 1, 0.3], axis=0)
    init_maps = gt_maps + drift
    sdrift = np.repeat(drift, scans_per_map, axis=0)
    init_scans = gt_scans + sdrift + rng.normal(0, 0.02, gt_scans.shape)
    edges = (
        np.array(map_idx, np.int32),
        np.array(scan_idx, np.int32),
        np.array(is_loop, np.int32),
        np.stack(rels),
        np.stack(infos),
    )
    return gt_maps, gt_scans, init_maps, init_scans, edges


def numpy_lm_oracle(map_poses, scan_poses, edges, loss, iters=10, lam0=1e-4):
    """Independent dense f64 LM on the same error model (test oracle)."""
    map_idx, scan_idx, is_loop, rel, info = edges
    M, N = len(map_poses), len(scan_poses)
    mp = map_poses.copy()
    sp = scan_poses.copy()

    def err_jac(mp, sp):
        s = mp[map_idx]
        e_ = sp[scan_idx]
        st, ct = np.sin(s[:, 2]), np.cos(s[:, 2])
        d = e_ - s
        x = ct * d[:, 0] + st * d[:, 1]
        y = -st * d[:, 0] + ct * d[:, 1]
        et = np.arctan2(np.sin(d[:, 2] - rel[:, 2]), np.cos(d[:, 2] - rel[:, 2]))
        e = np.stack([x - rel[:, 0], y - rel[:, 1], et], -1)
        E = len(map_idx)
        Js = np.zeros((E, 3, 3))
        Je = np.zeros((E, 3, 3))
        Js[:, 0, 0], Js[:, 0, 1], Js[:, 0, 2] = -ct, -st, y
        Js[:, 1, 0], Js[:, 1, 1], Js[:, 1, 2] = st, -ct, -x
        Js[:, 2, 2] = -1
        Je[:, 0, 0], Je[:, 0, 1] = ct, st
        Je[:, 1, 0], Je[:, 1, 1] = -st, ct
        Je[:, 2, 2] = 1
        return e, Js, Je

    def total(mp, sp):
        e, _, _ = err_jac(mp, sp)
        chi2 = np.einsum("ei,eij,ej->e", e, info, e)
        return float(np.sum([loss.loss(c) for c in chi2]))

    lam = lam0
    prev = total(mp, sp)
    for _ in range(iters):
        e, Js, Je = err_jac(mp, sp)
        chi2 = np.einsum("ei,eij,ej->e", e, info, e)
        w = np.where(is_loop > 0, [float(loss.weight(c)) for c in chi2], 1.0)
        winfo = info * w[:, None, None]
        nv = 3 * (M + N)
        H = np.zeros((nv, nv))
        b = np.zeros(nv)
        for k in range(len(map_idx)):
            si_, ei_ = 3 * map_idx[k], 3 * (M + scan_idx[k])
            JsT = Js[k].T @ winfo[k]
            JeT = Je[k].T @ winfo[k]
            H[si_:si_+3, si_:si_+3] += JsT @ Js[k]
            H[ei_:ei_+3, ei_:ei_+3] += JeT @ Je[k]
            H[si_:si_+3, ei_:ei_+3] += JsT @ Je[k]
            H[ei_:ei_+3, si_:si_+3] += (JsT @ Je[k]).T
            b[si_:si_+3] -= JsT @ e[k]
            b[ei_:ei_+3] -= JeT @ e[k]
        H += lam * np.eye(nv)
        H[:3, :] = 0
        H[:, :3] = 0
        H[:3, :3] = np.eye(3)
        b[:3] = 0
        dp = np.linalg.solve(H, b)
        mp = mp + dp[: 3 * M].reshape(M, 3)
        sp = sp + dp[3 * M:].reshape(N, 3)
        cur = total(mp, sp)
        lam = lam * 0.5 if cur < prev else lam * 2.0
        if abs(prev - cur) < 1e-4:
            break
        prev = cur
    return mp, sp, total(mp, sp)


@pytest.mark.parametrize("solver", ["dense", "schur"])
def test_optimizer_reduces_error(solver):
    gt_m, gt_s, init_m, init_s, edges = build_loop_graph()
    opt = PoseGraphOptimizer(OptimizerConfig(solver=solver))
    mp, sp, stats = opt.optimize(init_m, init_s, edges)
    assert stats["error"] < stats["initial_error"] * 0.2, stats
    # optimized scan poses should be closer to ground truth after gauge
    # alignment (the solution is anchored at map 0's drifted pose)
    from my_lidar_graph_slam_v2_tpu.datasets.synthetic import ate_rmse

    err_before = ate_rmse(init_s, gt_s)
    err_after = ate_rmse(sp, gt_s)
    assert err_after < err_before, (err_before, err_after)


def test_matches_numpy_oracle():
    gt_m, gt_s, init_m, init_s, edges = build_loop_graph(n_maps=5, scans_per_map=4)
    loss = LossFunction("Huber", 0.01)
    mp_o, sp_o, err_o = numpy_lm_oracle(init_m, init_s, edges, loss)
    for solver in ("dense", "schur"):
        opt = PoseGraphOptimizer(OptimizerConfig(solver=solver))
        mp, sp, stats = opt.optimize(init_m, init_s, edges)
        # Same optimum within f32 tolerance
        np.testing.assert_allclose(sp[:, :2], sp_o[:, :2], atol=2e-2)
        np.testing.assert_allclose(mp[:, :2], mp_o[:, :2], atol=2e-2)


@pytest.mark.parametrize("kind", ["Squared", "Huber", "Cauchy", "Fair",
                                  "GemanMcClure", "Welsch", "DCS"])
def test_loss_kinds_run(kind):
    import jax.numpy as jnp

    loss = LossFunction(kind, 0.01)
    t = jnp.asarray([0.0, 0.005, 0.01, 0.1, 10.0])
    l_vals = np.asarray(loss.loss(t))
    w = np.asarray(loss.weight(t))
    assert np.all(np.isfinite(l_vals)) and np.all(np.isfinite(w))
    assert l_vals[0] == pytest.approx(0.0, abs=1e-9)
    assert np.all(w <= 1.0 + 1e-6) and np.all(w >= 0)


def test_robust_loss_rejects_outlier_loop():
    """A wrong loop edge should be mostly ignored with DCS, but distort
    the graph with a Squared loss."""
    gt_m, gt_s, init_m, init_s, edges = build_loop_graph(noise=0.005, seed=3)
    map_idx, scan_idx, is_loop, rels, infos = edges
    # Add an outlier loop edge with a wildly wrong relative pose
    map_idx = np.append(map_idx, 2).astype(np.int32)
    scan_idx = np.append(scan_idx, 40).astype(np.int32)
    is_loop = np.append(is_loop, 1).astype(np.int32)
    rels = np.vstack([rels, [4.0, -3.0, 1.5]])
    infos = np.vstack([infos, np.diag([400.0, 400.0, 1600.0])[None]])
    bad_edges = (map_idx, scan_idx, is_loop, rels, infos)

    from my_lidar_graph_slam_v2_tpu.graph.loss import LossFunction as LF

    res = {}
    for kind in ("Squared", "DCS"):
        opt = PoseGraphOptimizer(
            OptimizerConfig(solver="schur", loss=LF(kind, 1.0))
        )
        mp, sp, _ = opt.optimize(init_m, init_s, bad_edges)
        res[kind] = np.linalg.norm(sp[:, :2] - gt_s[:, :2], axis=1).mean()
    assert res["DCS"] < res["Squared"]


def test_lm_rejects_uphill_and_nan_steps():
    """A wildly inconsistent random graph (the dryrun_multichip shapes)
    must stay finite: LM reverts uphill/NaN steps and raises lambda
    instead of poisoning the iterate (regression: NaN at lambda=1e-4)."""
    rng = np.random.default_rng(0)
    M, N = 6, 24
    map_poses = rng.normal(0, 1.0, (M, 3))
    scan_poses = rng.normal(0, 1.0, (N, 3))
    map_idx = np.arange(N, dtype=np.int32) % M
    scan_idx = np.arange(N, dtype=np.int32)
    is_loop = np.zeros(N, np.int32)
    rel = rng.normal(0, 0.1, (N, 3)).astype(np.float32)
    info = np.tile(np.eye(3, dtype=np.float32) * 10.0, (N, 1, 1))
    map_idx = np.append(map_idx, [0, 1]).astype(np.int32)
    scan_idx = np.append(scan_idx, [N - 1, N - 2]).astype(np.int32)
    is_loop = np.append(is_loop, [1, 1]).astype(np.int32)
    rel = np.vstack([rel, rng.normal(0, 0.1, (2, 3)).astype(np.float32)])
    info = np.vstack(
        [info, np.tile(np.eye(3, dtype=np.float32) * 20.0, (2, 1, 1))]
    )
    edges = (map_idx, scan_idx, is_loop, rel, info)
    for solver in ("schur", "dense"):
        opt = PoseGraphOptimizer(OptimizerConfig(solver=solver))
        mp, sp, stats = opt.optimize(map_poses, scan_poses, edges)
        assert np.all(np.isfinite(mp)) and np.all(np.isfinite(sp)), stats
        assert stats["error"] <= stats["initial_error"] + 1e-6
