"""Scan -> occupancy-map integration on device.

TPU-native replacement for the reference's per-beam subpixel Bresenham +
sequential odds updates (``grid_map_builder.cpp:390-494``,
``bresenham.cpp:58+``). Design (SURVEY.md section 7, hard part 1):

* Maps are ``[H, W]`` f32 **log-odds** rasters plus a bool observed mask
  (see ``grid/values.py`` for the codec contract).  In log-odds the binary
  Bayes update is additive, so a whole scan becomes ONE ``scatter-add`` of
  per-sample deltas followed by a dense clip — no per-cell read-modify-write
  loop.
* Free-space cells are found by sampling ``K`` points uniformly along each
  beam (fixed shape ``[B, K]``) instead of data-dependent Bresenham walks.
  Consecutive-duplicate samples are masked so each beam contributes at most
  one miss per traversed cell, matching the reference's one-update-per-
  beam-per-cell semantics; the hit cell is excluded from misses and gets
  one hit update (``grid_map_builder.cpp:455-470``).
* Scans in a batch are integrated sequentially (``lax.fori_loop``) with a
  per-scan clip to [logodds(0.001), logodds(0.999)], reproducing the u16
  codec's saturation behaviour.

Sampling density: spacing along a beam is ``range / K``; with the default
``K`` this is below half a cell for all usable ranges, so no traversed cell
is skipped except occasional corner grazes (validated against the NumPy
Bresenham oracle in tests/test_rasterize.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..grid import values as gv

DEFAULT_SAMPLES_PER_BEAM = 768


@functools.partial(jax.jit, static_argnames=("num_samples",))
def integrate_scans(
    logodds: jax.Array,  # [H, W] f32
    observed: jax.Array,  # [H, W] bool
    sensor_xy: jax.Array,  # [S, 2] f32 map-local sensor positions
    hits_xy: jax.Array,  # [S, B, 2] f32 map-local hit points
    hit_mask: jax.Array,  # [S, B] bool (valid beams, already range-filtered)
    resolution: float,
    offset_xy: jax.Array,  # [2] f32 raster offset (map-local)
    logodds_hit: float,
    logodds_miss: float,
    num_samples: int = DEFAULT_SAMPLES_PER_BEAM,
):
    """Integrate S scans (sequentially) into the raster. Returns updated
    (logodds, observed)."""
    if not (
        sensor_xy.shape[0] == hits_xy.shape[0] == hit_mask.shape[0]
        and hits_xy.shape[1] == hit_mask.shape[1]
    ):
        raise ValueError(
            f"inconsistent scan batch: sensor {sensor_xy.shape}, "
            f"hits {hits_xy.shape}, mask {hit_mask.shape}"
        )
    h, w = logodds.shape
    res = jnp.float32(resolution)
    off = offset_xy.astype(jnp.float32)

    def cell_of(p):  # p: [..., 2] -> (row, col) int32
        rc = jnp.floor((p - off) / res).astype(jnp.int32)
        return rc[..., 1], rc[..., 0]

    def one_scan(i, carry):
        lo, obs = carry
        s_xy = sensor_xy[i]  # [2]
        h_xy = hits_xy[i]  # [B, 2]
        mask = hit_mask[i]  # [B]

        d = h_xy - s_xy[None, :]  # [B, 2]
        # Sample positions along each beam, excluding the endpoint region
        t = (jnp.arange(num_samples, dtype=jnp.float32) + 0.5) / num_samples
        pts = s_xy[None, None, :] + d[:, None, :] * t[None, :, None]  # [B,K,2]
        rows, cols = cell_of(pts)  # [B, K]
        hit_r, hit_c = cell_of(h_xy)  # [B]

        # One miss per traversed cell per beam: drop consecutive duplicates
        same_as_prev = jnp.zeros(rows.shape, dtype=bool)
        same_as_prev = same_as_prev.at[:, 1:].set(
            (rows[:, 1:] == rows[:, :-1]) & (cols[:, 1:] == cols[:, :-1])
        )
        is_hit_cell = (rows == hit_r[:, None]) & (cols == hit_c[:, None])
        inside = (rows >= 0) & (rows < h) & (cols >= 0) & (cols < w)
        miss_valid = (
            mask[:, None] & ~same_as_prev & ~is_hit_cell & inside
        )

        delta = jnp.zeros((h, w), dtype=jnp.float32)
        delta = delta.at[rows, cols].add(
            jnp.where(miss_valid, jnp.float32(logodds_miss), 0.0),
            mode="drop",
        )
        hit_inside = (
            mask & (hit_r >= 0) & (hit_r < h) & (hit_c >= 0) & (hit_c < w)
        )
        delta = delta.at[hit_r, hit_c].add(
            jnp.where(hit_inside, jnp.float32(logodds_hit), 0.0),
            mode="drop",
        )

        touched = delta != 0.0
        # Unknown cells act as log-odds 0 (p=0.5) on first observation
        new_lo = jnp.where(obs, lo, 0.0) + delta
        new_lo = jnp.clip(new_lo, gv.LOGODDS_MIN, gv.LOGODDS_MAX)
        lo = jnp.where(touched | obs, jnp.where(touched, new_lo, lo), lo)
        obs = obs | touched
        return lo, obs

    n_scans = sensor_xy.shape[0]
    logodds, observed = jax.lax.fori_loop(
        0, n_scans, one_scan, (logodds, observed)
    )
    return logodds, observed


@jax.jit
def prob_map(logodds: jax.Array, observed: jax.Array) -> jax.Array:
    """Probability raster with 0.0 = unknown (the matching convention of
    ``GridMapInterface::ProbabilityOr``)."""
    return jnp.where(observed, jax.nn.sigmoid(logodds), 0.0)
