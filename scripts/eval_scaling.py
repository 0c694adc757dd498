#!/usr/bin/env python
"""Multi-chip scaling harness (BASELINE: frames/s at 1 / 8 / 16 chips).

Measures the two scalable axes of the engine:

1. loop-candidate CSM fan-out: a fixed batch of candidates sharded over
   1..N devices (parallel/loop_sharded.py) — the generalization of the
   reference's 2-IP-core parallel loop detector;
2. distributed Schur-complement pose-graph LM (parallel/distributed.py).

On real multi-chip hardware this reports scans/s and scaling efficiency;
on a virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=N)
it validates the sharded paths and records the numbers for reference only
(virtual devices share host cores, so efficiency is not meaningful there).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_loop_fanout(n_devices, batch_per_device=2, iters=5):
    import jax
    import jax.numpy as jnp

    from my_lidar_graph_slam_v2_tpu.matching.correlative import CorrelativeConfig
    from my_lidar_graph_slam_v2_tpu.parallel.loop_sharded import (
        make_batched_loop_csm,
    )
    from my_lidar_graph_slam_v2_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    mesh = make_mesh(n_devices)
    cfg = CorrelativeConfig(
        range_x=2.5, range_y=2.5, range_theta=0.5,
        n_theta_max=128, crop_rows=448, crop_cols=448,
    )
    fn = make_batched_loop_csm(mesh, cfg)
    C, H, W, B = batch_per_device * n_devices, 1024, 1024, 512
    prob = jnp.asarray(rng.uniform(0, 1, (C, H, W)).astype(np.float32))
    obs = prob > 0.5
    prob = jnp.where(obs, prob, 0.0)
    ranges = jnp.asarray(rng.uniform(0.5, 8.0, (C, B)).astype(np.float32))
    angles = jnp.asarray(
        np.tile(np.linspace(-np.pi, np.pi, B).astype(np.float32), (C, 1))
    )
    mask = jnp.ones((C, B), bool)
    poses = jnp.asarray(rng.normal(0, 0.1, (C, 3)).astype(np.float32))
    offs = jnp.asarray(np.tile(np.float32([-25.6, -25.6]), (C, 1)))
    call = lambda: fn(prob, obs, ranges, angles, mask, poses, offs,
                      jnp.float32(0.0), jnp.float32(0.0))
    out = call()
    jax.device_get(np.asarray(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = call()
    jax.device_get(np.asarray(jax.tree.leaves(out)[0]))
    dt = time.perf_counter() - t0
    return C * iters / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--devices", type=int, nargs="+", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    n_avail = len(jax.devices())
    device_counts = args.devices or sorted(
        {d for d in (1, 2, 4, 8, 16) if d <= n_avail}
    )
    results = []
    base = None
    for n in device_counts:
        rate = bench_loop_fanout(n)
        if base is None:
            base = rate
        eff = rate / (base * n)
        results.append(
            dict(devices=n, loop_candidates_per_s=round(rate, 2),
                 scaling_efficiency=round(eff, 3))
        )
        print(results[-1], flush=True)
    with open("results_scaling.json", "w") as f:
        json.dump(
            dict(platform=jax.devices()[0].platform, results=results), f,
            indent=1,
        )


if __name__ == "__main__":
    main()
