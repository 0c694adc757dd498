#!/usr/bin/env python
"""Benchmark harness: CSM scan-matching throughput, TPU vs CPU baseline.

Headline metric (BASELINE.json): scan matches/sec/chip for the frontend's
local correlative search (0.25 m x 0.25 m x 0.5 rad window at 5 cm
resolution, Intel-like scans) against a 10-scan latest map.  The CPU
baseline is a faithful -O3 C++ implementation of the reference's
coarse-prune + fine-descend algorithm (native/csm_baseline.cpp) run on
this host, standing in for the reference's software matcher.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def build_workload(seed=0, n_maps=4):
    """Latest-map rasters + query scans, Intel-like (5 cm, ~300 beams)."""
    import jax.numpy as jnp

    from my_lidar_graph_slam_v2_tpu.datasets import synthetic
    from my_lidar_graph_slam_v2_tpu.grid.builder import (
        GridMapBuilder,
        GridMapBuilderConfig,
    )
    from my_lidar_graph_slam_v2_tpu.matching.types import MapRaster, ScanArrays
    from my_lidar_graph_slam_v2_tpu.sensor.filters import ScanInterpolator

    world = synthetic.World.office(seed=seed, size=16.0)
    traj = synthetic.loop_trajectory(size=16.0, laps=0.3, step=0.5)
    seq = synthetic.generate(world, traj, n_beams=181, max_range=16.0,
                             range_noise=0.01, seed=seed)
    interp = ScanInterpolator(dist_scans=0.05)
    cfg = GridMapBuilderConfig(latest_map_rows=1024, latest_map_cols=1024)
    builder = GridMapBuilder(cfg)

    cases = []
    for i in range(n_maps):
        base = i * 3
        scans = [interp.interpolate(seq.scans[base + k]) for k in range(3)]
        poses = [seq.ground_truth[base + k] for k in range(3)]
        anchor = poses[0]
        lo, obs, off = builder._new_raster(1024, 1024)
        lo, obs = builder._integrate(
            lo, obs, off, anchor, list(zip(poses, scans))
        )
        from my_lidar_graph_slam_v2_tpu.ops import quant

        # Production form: u8-quantized raster (grid/builder.latest_raster)
        raster = MapRaster(quant.quantize_prob(lo, obs), obs, 0.05, off)
        query = interp.interpolate(seq.scans[base + 1])
        r = np.zeros(512, np.float32)
        a = np.zeros(512, np.float32)
        m = np.zeros(512, bool)
        n = min(query.num_scans, 512)
        idx = np.linspace(0, query.num_scans - 1, n).astype(int)
        r[:n] = query.ranges[idx]
        a[:n] = query.angles[idx]
        m[:n] = True
        arrays = ScanArrays(jnp.asarray(r), jnp.asarray(a), jnp.asarray(m),
                            np.zeros(3), n)
        from my_lidar_graph_slam_v2_tpu.core import pose as P

        local_pose = P.inverse_compound(anchor, poses[1])
        cases.append((raster, arrays, np.asarray(local_pose)))
    return cases


def bench_tpu(cases, iters=20, batch=8, with_stages=True):
    """Device throughput: matches are dispatched as vmapped batches (the
    production sharded path, parallel/loop_sharded.py) with inputs staged
    on device.

    MEASUREMENT HONESTY (round 5): this environment's tunneled TPU
    DEFERS execution — before the first device->host fetch,
    ``block_until_ready`` returns without the work having retired, so
    timings taken in that state are illusions (measured "0.06 ms" for a
    batch whose true cost is 16.5 ms; the deferred backlog is then paid,
    at ~150 ms per queued dispatch, by the first fetch).  The harness
    therefore performs an explicit throwaway fetch FIRST, which flips
    the runtime into the honest synchronous regime, and every number
    reported here is measured there.  Per-dispatch tunnel overhead in
    that regime is ~2.6 ms/batch (measured with a trivial kernel on the
    same inputs) and is included in the reported rate — the on-device
    time is correspondingly lower.

    The per-batch work includes the coarse-map precompute, the coarse +
    fine window sweeps, and cost/covariance at the winner (everything
    ``ScanMatcherCorrelative::OptimizePose`` does per call)."""
    import jax
    import jax.numpy as jnp

    # Enter the honest (post-fetch) regime BEFORE any timing.
    _ = jax.device_get(jnp.zeros(8) + 1)

    from my_lidar_graph_slam_v2_tpu.matching.correlative import (
        CorrelativeConfig,
        _correlative_core,
    )
    from my_lidar_graph_slam_v2_tpu.ops import pool

    # crop 320: the reference FPGA's map-window contract
    # (scan_matcher_correlative_fpga.cpp:484-527 stages <=320^2 BRAM
    # blocks); beams outside the window are dropped from the score same
    # as there.  1.44x fewer patch/hit bytes than the old 384 crop.
    # n_theta_max 176: the static bound on this workload's theta window
    # (max_range 16 m -> step 2*asin(res/2R) = 3.125 mrad -> win_t = 80
    # -> 161 candidate rows; 176 leaves margin).  The window is FULLY
    # covered — this trims only all-masked padding rows from the hit
    # matrix, exactly like sizing the CPU baseline's loops to its window.
    cfg = CorrelativeConfig(n_theta_max=176, crop_rows=320, crop_cols=320)

    def single(prob, observed, ranges, angles, mask, sensor_pose, offset_xy):
        # coarse maps None -> pool-on-crop inside the core (the per-call
        # ComputeCoarserMap analog, restricted to the swept window)
        return _correlative_core(
            cfg, prob, observed, None, None, ranges, angles, mask,
            sensor_pose, offset_xy, jnp.float32(0.0), jnp.float32(0.0),
        )

    batched = jax.jit(jax.vmap(single))

    # Stage a batch on device (cycle the prepared cases)
    import numpy as np

    sel = [cases[i % len(cases)] for i in range(batch)]
    prob = jnp.stack([c[0].prob for c in sel])
    obs = jnp.stack([c[0].observed for c in sel])
    ranges = jnp.stack([c[1].ranges for c in sel])
    angles = jnp.stack([c[1].angles for c in sel])
    mask = jnp.stack([c[1].mask for c in sel])
    poses = jnp.asarray(np.stack([c[2] for c in sel]).astype(np.float32))
    offs = jnp.asarray(
        np.stack([np.asarray(c[0].offset_xy) for c in sel]).astype(np.float32)
    )

    out = batched(prob, obs, ranges, angles, mask, poses, offs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = batched(prob, obs, ranges, angles, mask, poses, offs)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    rate = iters * batch / dt

    stages = (
        bench_stages(
            cfg, prob, obs, ranges, angles, mask, poses, offs, batch, iters
        )
        if with_stages else None
    )
    return rate, stages, out


def _time_jit(fn, iters, *args):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_stages(cfg, prob, obs, ranges, angles, mask, poses, offs,
                 batch, iters):
    """Per-stage device time (ms per batch) via timed jitted prefixes of
    the production (hit-image matmul) matcher pipeline; stage cost =
    difference of adjacent prefixes.  Also emits the HBM roofline for the
    sweeps (BASELINE.json target #1, "speed-of-light HBM bandwidth per
    chip"): the dominant HBM traffic of the patch-matmul formulation is
    the materialized map-patch matrices (one crop-sized row per window
    offset) plus the hit images, so bytes-per-case is computed from
    those and achieved GB/s is reported against the device's peak."""
    import jax
    import jax.numpy as jnp

    from my_lidar_graph_slam_v2_tpu.ops import csm, gauss_newton, pool

    wx, wy = cfg.win_cells
    nbx, nby = cfg.blocks
    nxf, nyf = nbx * cfg.low_resolution, nby * cfg.low_resolution
    T = cfg.n_theta_max
    K = cfg.fine_theta_k if 0 < cfg.fine_theta_k < T else T

    def prefix(depth):
        # Each prefix RETURNS its real intermediate arrays (device-side,
        # not fetched).  Scalar-sum accumulators must not be used here:
        # XLA's algebraic simplifier rewrites sum(dot(A, B)) into
        # dot(sum A, sum B) and similar, silently deleting the very work
        # being timed (burned us in round 4 — probes read 0.03 ms for a
        # 2.6 ms stage).
        def one(p, o, r, a, m, sp, off):
            step_t, t0i, tmask = csm.theta_search_params(
                r, m, cfg.resolution, cfg.range_theta, T)
            hr, hc, valid, r0, c0 = csm.beam_cells(
                r, a, m, sp, t0i, step_t, tmask, cfg.resolution, off,
                n_theta=T, crop_rows=cfg.crop_rows, crop_cols=cfg.crop_cols)
            # int8 hit images + int8 coarse sweep: the production u8-map
            # path (matching/correlative.py use_int8)
            hit = csm.build_hit_images(
                hr, hc, valid, tmask,
                crop_rows=cfg.crop_rows, crop_cols=cfg.crop_cols,
                dtype=jnp.int8)
            if depth == 0:
                return hit
            x0, y0 = jnp.int32(-wx), jnp.int32(-wy)
            # pool-on-crop (production: _correlative_core with
            # coarse_prob=None)
            win = cfg.low_resolution
            in_rows = cfg.crop_rows + (nby - 1) * win
            in_cols = cfg.crop_cols + (nbx - 1) * win
            seg = csm.sweep_input_window(
                p, o, r0, c0, x0, y0,
                in_rows=in_rows + win - 1, in_cols=in_cols + win - 1,
                precision=cfg.precision)
            pooled = pool.sliding_window_max2d(seg, win)
            coarse_inp = pooled[:, :in_rows, :in_cols]
            if depth == 1:
                # return hit too: otherwise DCE deletes the hit build from
                # this prefix and the stage difference goes negative
                return hit, coarse_inp
            row_counts = jnp.sum(
                valid & tmask[:, None], axis=1
            ).astype(jnp.float32)
            cs, ck = csm.sweep_from_hits_int8(
                hit, row_counts, coarse_inp,
                nx=nbx, ny=nby, stride=cfg.low_resolution)
            if depth == 2:
                return cs, ck
            # Mirror the production top-K theta prune (matching/
            # correlative.py): fine-sweep only the K thetas with the
            # largest coarse upper bound.
            if K < T:
                bound = jnp.max(
                    jnp.where(tmask[:, None, None], cs, -jnp.inf),
                    axis=(1, 2),
                )
                _, sel = jax.lax.top_k(bound, K)
                hit_sel = jnp.take(hit, sel, axis=0)
                rc_sel = jnp.take(row_counts, sel, axis=0)
            else:
                hit_sel, rc_sel = hit, row_counts
            # int8 fine sweep (production fine_int8 path)
            fine_inp = csm.sweep_input_window(
                p, o, r0, c0, x0, y0,
                in_rows=cfg.crop_rows + nyf - 1,
                in_cols=cfg.crop_cols + nxf - 1,
                precision=cfg.precision)
            fs, fk = csm.sweep_from_hits_int8(
                hit_sel, rc_sel, fine_inp, nx=nxf, ny=nyf, stride=1)
            if depth == 3:
                return fs, fk, cs, ck
            # Data-dependent winner pose keeps the chain live
            win = sp.at[0].add(0.001 * jnp.max(fs))
            cost = gauss_newton.cost(
                p, o, r, a, m, win, cfg.resolution, off)
            cov = gauss_newton.covariance(
                p, o, r, a, m, win, cfg.resolution, off,
                cfg.covariance_scale)
            return fs, cost, cov

        return jax.jit(jax.vmap(one))

    args = (prob, obs, ranges, angles, mask, poses, offs)
    t = [_time_jit(prefix(d), iters, *args) for d in range(5)]

    def refine(p, o, r, a, m, sp, off):
        return gauss_newton.gn_refine(
            p, o, r, a, m, sp, cfg.resolution, off,
            max_iterations=10, convergence_threshold=1e-4,
            initial_lambda=1e-4)

    t_gn = _time_jit(jax.jit(jax.vmap(refine)), iters, *args)

    ms = lambda x: round(1e3 * x, 3)
    stages = {
        "hit_images": ms(t[0]),
        "coarse_pool_crop": ms(t[1] - t[0]),
        "coarse_sweep": ms(t[2] - t[1]),
        "fine_sweep": ms(t[3] - t[2]),
        "cost_cov": ms(t[4] - t[3]),
        "gn_refine_10it": ms(t_gn),
        "full_core": None,  # filled by caller from the end-to-end rate
    }

    # ---- HBM roofline for the sweeps -----------------------------------
    # Patch-matmul traffic model per case: each window offset
    # materializes a (2, crop^2) map patch (written once, read once by
    # the matmul), the hit images are written once and read once per
    # sweep, and the score grids are tiny.  u8 maps take the exact
    # single-pass bf16 path (patches bf16: 2 bytes/el); f32 "split" takes
    # two bf16 passes.
    kcrop = cfg.crop_rows * cfg.crop_cols
    parts = 1 if prob.dtype == jnp.uint8 else (
        2 if cfg.precision == "split" else 1)
    # u8 maps: int8 hit images (1 B/el, written by the build and read by
    # the int8 coarse matmul); fine patches + selected hit rows in bf16
    esz_hit = 1 if prob.dtype == jnp.uint8 else 2
    patch_bytes = lambda n_off, esz: 2 * n_off * 2 * kcrop * esz * parts
    hit_bytes = 2 * T * kcrop * esz_hit  # write + read
    # u8 maps: BOTH sweeps on the int8 MXU (1 B/el patches + hit rows)
    bytes_fine = (
        patch_bytes(nxf * nyf, esz_hit) + 2 * K * kcrop * esz_hit
    )
    bytes_coarse = patch_bytes(nbx * nby, esz_hit) + hit_bytes
    hbm_bytes = bytes_fine + bytes_coarse
    sweep_time = t[3] - t[1]  # coarse + fine sweep per batch
    achieved_gbps = (
        batch * hbm_bytes / sweep_time / 1e9 if sweep_time > 0 else None
    )
    peak_gbps = _peak_hbm_gbps()
    # Measured ACHIEVABLE ceiling on this very chip: a 256 MB u8 stream
    # (read+write) — through this environment's virtualized TPU the
    # deliverable bandwidth is ~1/7 of the v5e paper spec (117 vs
    # 819 GB/s measured r05), so utilization is reported against BOTH.
    # The same calibration run measures ~9 TFLOP/s bf16 matmul vs the
    # 197 TFLOP/s spec: this chip slice simply does not expose the
    # datasheet machine, and "speed of light" must mean the light that
    # can actually be reached here.
    stream = jnp.zeros((256 * 1024 * 1024,), jnp.uint8)
    t_stream = _time_jit(
        jax.jit(lambda a: a + jnp.uint8(1)), max(3, iters // 2), stream
    )
    measured_gbps = 2 * stream.size / t_stream / 1e9
    roofline = dict(
        hbm_bytes_per_case=hbm_bytes,
        hbm_achieved_gbps=round(achieved_gbps, 1) if achieved_gbps else None,
        hbm_peak_spec_gbps=peak_gbps,
        hbm_measured_stream_gbps=round(measured_gbps, 1),
        utilization_vs_spec=(
            round(achieved_gbps / peak_gbps, 4)
            if (achieved_gbps and peak_gbps) else None
        ),
        utilization_vs_measured=(
            round(achieved_gbps / measured_gbps, 4)
            if (achieved_gbps and measured_gbps) else None
        ),
        note=(
            "bytes = materialized map-patch matrices + hit images of the "
            "two sweeps; to go faster, move FEWER bytes (offset pruning, "
            "narrower patches), not schedule better"
        ),
    )
    return dict(stages_ms_per_batch=stages, batch=batch,
                sweep_roofline=roofline)


def _peak_hbm_gbps():
    """Peak HBM bandwidth of device 0 (public spec numbers, GB/s)."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    table = {
        "tpu v4": 1228.0,
        "tpu v5 lite": 819.0,
        "tpu v5e": 819.0,
        "tpu v5p": 2765.0,
        "tpu v5": 2765.0,
        "tpu v6e": 1640.0,
        "tpu v6 lite": 1640.0,
    }
    for key, v in sorted(table.items(), key=lambda kv: -len(kv[0])):
        if kind.startswith(key):
            return v
    return None


def _peak_bf16_flops():
    """Peak bf16 matmul FLOP/s of device 0 (public spec numbers)."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    table = {
        "tpu v4": 275e12,
        "tpu v5 lite": 197e12,
        "tpu v5e": 197e12,
        "tpu v5p": 459e12,
        "tpu v5": 459e12,
        "tpu v6e": 918e12,
        "tpu v6 lite": 918e12,
    }
    for key, v in sorted(table.items(), key=lambda kv: -len(kv[0])):
        if kind.startswith(key):
            return v
    return None


def bench_cpu(cases, iters=3):
    from my_lidar_graph_slam_v2_tpu.native import (
        cpu_correlative_search,
        cpu_precompute_coarse,
    )

    prepared = []
    for raster, arrays, pose in cases:
        fine = np.asarray(raster.prob).astype(np.float32)
        if raster.prob.dtype == np.uint8 or fine.max() > 1.5:
            fine /= 255.0
        n = arrays.num_valid
        ranges = np.asarray(arrays.ranges)[:n]
        angles = np.asarray(arrays.angles)[:n]
        max_range = ranges.max()
        tt = 0.05 / max_range
        step_theta = float(np.arccos(1.0 - 0.5 * tt * tt))
        win_t = int(np.ceil(0.25 / step_theta))
        prepared.append((fine, ranges, angles, pose, step_theta, win_t,
                         np.asarray(raster.offset_xy)))
    t0 = time.perf_counter()
    count = 0
    for _ in range(iters):
        for fine, ranges, angles, pose, step_theta, win_t, off in prepared:
            # Coarse precompute is part of the reference's per-call work
            # (ComputeCoarserMap, scan_matcher_correlative.cpp:104)
            coarse = cpu_precompute_coarse(fine, 5)
            cpu_correlative_search(
                fine, coarse, ranges, angles, pose, 0.05, off,
                3, 3, win_t, step_theta, 5,
            )
            count += 1
    dt = time.perf_counter() - t0
    return count / dt


def _host_fingerprint():
    import platform

    model = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("model name"):
                    model = line.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    return dict(cpu=model, nproc=os.cpu_count(), machine=platform.machine())


def pinned_cpu_baseline(cpu_rate_live):
    """The committed CPU baseline (BASELINE_CPU.json).  The live rate on
    the shared driver host swings 2x with background load (r01: 31.1,
    r02: 15.2 on identical code), so ``vs_baseline`` is computed against
    the pinned number; the live rate is reported alongside for context."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_CPU.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    pinned = dict(cpu_rate=round(cpu_rate_live, 2), host=_host_fingerprint(),
                  note="csm_scan_matches_per_sec on native/csm_baseline.cpp")
    with open(path, "w") as f:
        json.dump(pinned, f, indent=1)
    return pinned


def main():
    if "--cpu-only" in sys.argv:
        # Child mode (see below): run ONLY the native CPU baseline and
        # print its rate.
        cases = build_workload()
        print(json.dumps({"cpu_rate_live": bench_cpu(cases)}))
        return
    if os.environ.get("BENCH_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    from my_lidar_graph_slam_v2_tpu.utils import jaxcache

    jaxcache.enable()
    # The CPU baseline runs in a SUBPROCESS: preparing its inputs fetches
    # device arrays to the host, and on this environment's tunneled TPU a
    # single device->host fetch permanently drops the process out of the
    # pipelined dispatch regime (every later launch then pays a ~20-150 ms
    # per-dispatch tunnel round trip — measured 0.07 -> 148 ms/batch for
    # the same compiled core).  The headline metric is steady-state device
    # throughput with inputs staged and one result fetch at the end, so
    # the benchmarked process must stay fetch-free until timing is done.
    import subprocess

    child = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--cpu-only"],
        capture_output=True, text=True, timeout=1800,
    )
    cpu_rate_live = json.loads(
        child.stdout.strip().splitlines()[-1]
    )["cpu_rate_live"]
    pinned = pinned_cpu_baseline(cpu_rate_live)
    cases = build_workload()
    tpu_rate, stages, _ = bench_tpu(cases)
    stages["stages_ms_per_batch"]["full_core"] = round(
        1e3 * stages["batch"] / tpu_rate, 3
    )
    # Saturating-batch throughput: per-dispatch tunnel overhead (~2.6 ms
    # on this environment's virtualized chip) amortizes with batch; the
    # headline stays at the series' batch-8 methodology, the saturated
    # rate is reported alongside.
    rate16, _, _ = bench_tpu(cases, iters=12, batch=16, with_stages=False)
    result = {
        "metric": "csm_scan_matches_per_sec_per_chip",
        "value": round(tpu_rate, 2),
        "unit": "matches/s",
        "vs_baseline": round(tpu_rate / pinned["cpu_rate"], 2),
        "cpu_baseline_pinned": pinned["cpu_rate"],
        "cpu_baseline_live": round(cpu_rate_live, 2),
        "platform": __import__("jax").devices()[0].platform,
        "device_kind": __import__("jax").devices()[0].device_kind,
        "value_batch16": round(rate16, 2),
        "vs_baseline_batch16": round(rate16 / pinned["cpu_rate"], 2),
        **stages,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
