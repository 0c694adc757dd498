#!/usr/bin/env python
"""TPU micro-profiles for the hot ops (run on the real chip).

Sections (select with --only SECTION, default all):
  rasterize    scan -> map integration (ops/rasterize.py) at S=1 and S=10
  sweep        single CSM window sweep, XLA vs Pallas backend (ops/csm.py)
  correlative  batched full correlative match (coarse+fine), highest vs
               fast (bf16) precision — the headline bench's inner loop

Each prints per-case milliseconds.  Do not run concurrently with any other
process using the TPU (single-chip tunnel; see .claude/skills/verify).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(name, f, n=20, divisor=1):
    import jax

    out = f()
    jax.device_get(np.asarray(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f()
    jax.device_get(np.asarray(jax.tree.leaves(out)[0]))
    ms = (time.perf_counter() - t0) / n * 1000 / divisor
    print(f"{name}: {ms:.3f} ms", flush=True)
    return out


def profile_rasterize():
    import jax.numpy as jnp

    from my_lidar_graph_slam_v2_tpu.grid import values as gv
    from my_lidar_graph_slam_v2_tpu.ops import rasterize

    rng = np.random.default_rng(0)
    H = W = 1024
    lo0 = jnp.zeros((H, W), jnp.float32)
    obs0 = jnp.zeros((H, W), bool)
    lo_hit = float(np.log(gv.prob_to_odds(0.62)))
    lo_miss = float(np.log(gv.prob_to_odds(0.46)))
    off = jnp.asarray(np.float32([-25.6, -25.6]))
    for S in (1, 10):
        sensors = rng.normal(0, 0.5, (S, 2)).astype(np.float32)
        angles = np.tile(np.linspace(-np.pi, np.pi, 512), (S, 1))
        ranges = rng.uniform(1.0, 10.0, (S, 512))
        hx = sensors[:, :1] + ranges * np.cos(angles)
        hy = sensors[:, 1:] + ranges * np.sin(angles)
        hits = jnp.asarray(np.stack([hx, hy], -1), jnp.float32)
        sens = jnp.asarray(sensors)
        msk = jnp.ones((S, 512), bool)
        timeit(
            f"rasterize S={S}",
            lambda hits=hits, sens=sens, msk=msk: rasterize.integrate_scans(
                lo0, obs0, sens, hits, msk, 0.05, off, lo_hit, lo_miss,
            ),
            n=10,
        )


def _sweep_args():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    H = W = 1024
    prob = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
    obs = prob > 0.5
    prob = jnp.where(obs, prob, 0.0)
    B = 512
    ranges = jnp.asarray(rng.uniform(0.5, 8.0, B).astype(np.float32))
    angles = jnp.asarray(np.linspace(-np.pi, np.pi, B).astype(np.float32))
    mask = jnp.ones(B, bool)
    pose = jnp.asarray(np.float32([0, 0, 0.1]))
    off = jnp.asarray(np.float32([-25.6, -25.6]))
    args = (prob, obs, ranges, angles, mask, pose, jnp.int32(-104),
            jnp.float32(0.0025), jnp.ones(208, bool), jnp.int32(-3),
            jnp.int32(-3), 0.05, off)
    kw = dict(n_theta=208, nx=10, ny=10, stride=1, crop_rows=384,
              crop_cols=384)
    return args, kw


def profile_sweep():
    import jax

    from my_lidar_graph_slam_v2_tpu.ops import csm

    args, kw = _sweep_args()
    import functools

    static = tuple(kw) + ("precision", "backend")
    sweep_jit = functools.partial(jax.jit, static_argnames=static)(
        csm.csm_sweep
    )
    s1 = timeit("xla sweep", lambda: sweep_jit(*args, **kw))
    try:
        s2 = timeit(
            "pallas sweep",
            lambda: sweep_jit(*args, backend="pallas", **kw),
        )
        print(
            "pallas agree:",
            np.allclose(np.asarray(s1[0]), np.asarray(s2[0]), atol=0.1),
            flush=True,
        )
    except Exception as e:  # noqa: BLE001 - report and continue profiling
        print(f"pallas FAILED: {type(e).__name__} {str(e)[:200]}", flush=True)


def profile_correlative():
    import jax
    import jax.numpy as jnp

    from my_lidar_graph_slam_v2_tpu.matching.correlative import (
        CorrelativeConfig,
        _correlative_core,
    )
    from my_lidar_graph_slam_v2_tpu.ops import pool

    rng = np.random.default_rng(0)
    BA, H, W, B = 8, 1024, 1024, 512
    prob = jnp.asarray(rng.uniform(0, 1, (BA, H, W)).astype(np.float32))
    obs = jnp.asarray(rng.uniform(0, 1, (BA, H, W)) > 0.5)
    ranges = jnp.asarray(rng.uniform(0.5, 8.0, (BA, B)).astype(np.float32))
    angles = jnp.asarray(
        np.tile(np.linspace(-np.pi, np.pi, B).astype(np.float32), (BA, 1))
    )
    mask = jnp.ones((BA, B), bool)
    pose = jnp.asarray(np.tile(np.float32([0, 0, 0.1]), (BA, 1)))
    off = jnp.asarray(np.tile(np.float32([-25.6, -25.6]), (BA, 1)))

    for prec in ("highest", "split", "fast"):
        cfg = CorrelativeConfig(
            n_theta_max=208, crop_rows=384, crop_cols=384, precision=prec
        )

        def single(p, o, r, a, m, sp, of, cfg=cfg):
            cp = pool.sliding_window_max2d(p, cfg.low_resolution)
            co = pool.sliding_window_max2d(o, cfg.low_resolution)
            return _correlative_core(
                cfg, p, o, cp, co, r, a, m, sp, of,
                jnp.float32(0.0), jnp.float32(0.0),
            )

        vcore = jax.jit(jax.vmap(single))
        timeit(
            f"correlative[{prec}] per match (batch {BA})",
            lambda: vcore(prob, obs, ranges, angles, mask, pose, off),
            divisor=BA,
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=["rasterize", "sweep", "correlative"])
    args = ap.parse_args()
    import jax

    print("devices:", jax.devices(), flush=True)
    if args.only in (None, "rasterize"):
        profile_rasterize()
    if args.only in (None, "sweep"):
        profile_sweep()
    if args.only in (None, "correlative"):
        profile_correlative()


if __name__ == "__main__":
    main()
