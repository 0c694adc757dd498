"""Multi-host distributed runtime: real ``jax.distributed`` processes.

Spawns two coordinator-connected processes (2 virtual CPU devices each →
a 4-device global mesh) running the full SLAM pipeline with the
owner-routed multi-host backend (SURVEY section 4d test recipe).  Checks:

* both processes produce the identical trajectory (replicated host state
  stays in lockstep through sharded detection + distributed Schur LM);
* loop closures are found and the ATE bound holds;
* candidate routing actually routed: each process rasterized/uploaded
  only the local maps it owns (id % P == rank).

This process-spawning test lives outside the in-process virtual-mesh
tests (tests/test_parallel.py) because jax.distributed must be
initialized before any backend use.
"""
import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(port, pid, nproc, *, local_devices=2, extra=()):
    env = dict(os.environ)
    # A clean env per process: the worker sets its own XLA device count
    env.pop("XLA_FLAGS", None)
    return subprocess.Popen(
        [
            sys.executable, WORKER,
            "--coordinator", f"localhost:{port}",
            "--num-processes", str(nproc),
            "--process-id", str(pid),
            "--local-devices", str(local_devices),
            "--platform", "cpu",
            *extra,
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        env=env,
        cwd=REPO,
    )


def test_two_process_smoke():
    """Default-tier jax.distributed smoke: 2 procs x 1 device, tiny
    shapes, few keyframes — catches coordinator/mesh/routing regressions
    without waiting for the slow-tier full run (VERDICT r2 ask #9)."""
    port = _free_port()
    procs = [
        _spawn(port, pid, 2, local_devices=1,
               extra=("--smoke", "--laps", "0.5", "--step", "0.45"))
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=120)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        outs.append(json.loads(line))

    r0, r1 = sorted(outs, key=lambda r: r["process_id"])
    assert r0["num_processes"] == r1["num_processes"] == 2
    assert r0["global_devices"] == r1["global_devices"] == 2
    # Lockstep control state across both processes
    assert r0["keyframes"] == r1["keyframes"] > 0
    assert r0["loops"] == r1["loops"] >= 0
    assert r0["trajectory_sum"] == pytest.approx(
        r1["trajectory_sum"], abs=1e-3
    )
    _assert_owner_sharded(r0, r1)


def _assert_owner_sharded(r0, r1):
    """Owner retention (Stage 5b): aged-out heavy state is held by its
    owner only; the union covers every map exactly once."""
    all_maps = set(r0["all_map_ids"])
    held0, held1 = set(r0["rasters_held_ids"]), set(r1["rasters_held_ids"])
    assert held0 | held1 == all_maps
    # Any map held by both must be in the recent keep-window (last 2)
    recent = set(sorted(all_maps)[-2:])
    assert held0 & held1 <= recent
    for r, held in ((r0, held0), (r1, held1)):
        pid = r["process_id"]
        for mid in held - recent:
            assert mid % 2 == pid, (
                f"process {pid} retained non-owned old raster {mid}"
            )
    if len(all_maps) > 4:
        # Enough aged-out maps that each process must have dropped rasters
        for r in (r0, r1):
            assert r["dropped_rasters"] > 0
    if r0["total_scan_nodes"] > 40:
        # Long enough that scans age past the latest-map + seed safety
        # margin (num_scans_for_latest_map + num_overlapped_scans = 20)
        for r in (r0, r1):
            assert r["scan_buffers_held"] < r["total_scan_nodes"]


@pytest.mark.slow
def test_two_process_distributed_slam():
    port = _free_port()
    procs = [_spawn(port, pid, 2, extra=("--laps", "1.25", "--step", "0.3"))
             for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        outs.append(json.loads(line))

    r0, r1 = sorted(outs, key=lambda r: r["process_id"])
    assert r0["num_processes"] == r1["num_processes"] == 2
    assert r0["global_devices"] == r1["global_devices"] == 4

    # Replicated host state: identical results on both processes
    assert r0["keyframes"] == r1["keyframes"]
    assert r0["loops"] == r1["loops"]
    assert r0["ate"] == pytest.approx(r1["ate"], abs=1e-6)
    assert r0["trajectory_sum"] == pytest.approx(
        r1["trajectory_sum"], abs=1e-3
    )

    # Loop closure quality: genuine lap-end closures under the
    # reference's loop gates (>=10 m residual travel, <5 m gap)
    assert r0["loops"] >= 1
    assert r0["ate"] < 0.12

    # Candidate routing: each process only rasterized/uploaded maps it
    # owns (id % P == rank); at least one host received candidates
    assert r0["rasterized_map_ids"] or r1["rasterized_map_ids"]
    for r in (r0, r1):
        pid = r["process_id"]
        for mid in r["rasterized_map_ids"]:
            assert mid % 2 == pid, (
                f"process {pid} rasterized non-owned map {mid}"
            )

    # Owner retention (Stage 5b): per-process heavy state scales ~1/P
    _assert_owner_sharded(r0, r1)
    held_frac = [
        len(r["rasters_held_ids"]) / len(r["all_map_ids"]) for r in (r0, r1)
    ]
    assert max(held_frac) < 0.75, held_frac  # ~1/2 + recent window

    # Sharded-exact global map: both processes computed the identical
    # summed map from owner-partial rasters
    assert r0["global_map_observed_cells"] == r1["global_map_observed_cells"]
    assert r0["global_map_observed_cells"] > 0
