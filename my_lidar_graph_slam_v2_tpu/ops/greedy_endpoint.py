"""Greedy-endpoint (GMapping-style) cost function, vectorized.

Port of ``mapping/cost_function_greedy_endpoint.cpp``: for each beam, a
hit point and a pulled-back "missed" point are projected to cells; a
(2K+1)^2 kernel window around them is searched for the offset minimizing a
Gaussian NLL cost, subject to hit-prob >= threshold >= missed-prob gating;
unknown cells are skipped; beams with no admissible offset get the default
(worst) cost.  Covariance is the crude g g^T + 0.1 I of the reference
(lines 138-162).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def make_kernel_tables(kernel_size: int, resolution: float, std_dev: float):
    k = kernel_size
    offs = np.arange(-k, k + 1)
    ox, oy = np.meshgrid(offs, offs, indexing="xy")
    sqd = (resolution * ox) ** 2 + (resolution * oy) ** 2
    var = std_dev * std_dev
    table = -np.exp(-0.5 * sqd / var)
    max_d = (resolution * (k + 1)) ** 2 * 2
    default = -np.exp(-0.5 * max_d / var)
    return (
        jnp.asarray(ox.reshape(-1), jnp.int32),
        jnp.asarray(oy.reshape(-1), jnp.int32),
        jnp.asarray(table.reshape(-1), jnp.float32),
        jnp.float32(default),
    )


def cost(
    prob,
    observed,
    ranges,
    angles,
    mask,
    sensor_pose,
    resolution,
    offset_xy,
    *,
    kernel_ox,
    kernel_oy,
    kernel_cost,
    default_cost,
    hit_and_missed_dist=0.075,
    occupancy_threshold=0.1,
    scaling_factor=1.0,
):
    H, W = prob.shape
    ang = sensor_pose[2] + angles
    ca, sa = jnp.cos(ang), jnp.sin(ang)
    hx = sensor_pose[0] + ranges * ca
    hy = sensor_pose[1] + ranges * sa
    mx = sensor_pose[0] + (ranges - hit_and_missed_dist) * ca
    my = sensor_pose[1] + (ranges - hit_and_missed_dist) * sa

    def cell(px, py):
        c = jnp.floor((px - offset_xy[0]) / resolution).astype(jnp.int32)
        r = jnp.floor((py - offset_xy[1]) / resolution).astype(jnp.int32)
        return r, c

    hr, hc = cell(hx, hy)  # [B]
    mr, mc = cell(mx, my)

    def read(r, c):  # [B, K] -> prob with 0 for unknown/outside
        inside = (r >= 0) & (r < H) & (c >= 0) & (c < W)
        rs = jnp.clip(r, 0, H - 1)
        cs = jnp.clip(c, 0, W - 1)
        p = prob[rs, cs]
        known = observed[rs, cs] & inside
        return jnp.where(known, p, 0.0), known

    hrk = hr[:, None] + kernel_oy[None, :]  # [B, K]
    hck = hc[:, None] + kernel_ox[None, :]
    mrk = mr[:, None] + kernel_oy[None, :]
    mck = mc[:, None] + kernel_ox[None, :]
    hp, hknown = read(hrk, hck)
    mp, mknown = read(mrk, mck)
    admissible = (
        hknown
        & mknown
        & (hp >= occupancy_threshold)
        & (mp <= occupancy_threshold)
    )
    costs = jnp.where(admissible, kernel_cost[None, :], jnp.inf)
    per_beam = jnp.minimum(jnp.min(costs, axis=1), default_cost)
    total = jnp.sum(jnp.where(mask, per_beam, 0.0))
    return total * scaling_factor


def gradient_and_covariance(cost_fn, sensor_pose, resolution):
    """Numeric gradient + g g^T + 0.1 I covariance (reference lines
    105-162)."""
    diff_lin = resolution
    diff_ang = 1e-2
    g = []
    for i, d in enumerate([diff_lin, diff_lin, diff_ang]):
        dp = jnp.zeros(3).at[i].set(d)
        g.append((cost_fn(sensor_pose + dp) - cost_fn(sensor_pose - dp)) / (2 * d))
    g = jnp.stack(g)
    cov = jnp.outer(g, g) + 0.1 * jnp.eye(3)
    return g, cov
