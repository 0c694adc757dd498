"""Sliding-window max pooling for coarse-map precompute.

TPU equivalent of the reference's separable monotonic-deque max filter
(``grid_map_builder.cpp:917-1065``, ``util.hpp:370-420``): the coarse map
stores, at each cell, the max over the ``win x win`` window *starting* at
that cell (extending toward higher indices), with shrinking windows at the
high edge.  One ``lax.reduce_window`` call.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("win",))
def sliding_window_max2d(arr: jax.Array, win: int) -> jax.Array:
    """out[i, j] = max(arr[i:i+win, j:j+win]) with -inf (or dtype min)
    padding beyond the high edge."""
    if win == 1:
        return arr
    if arr.dtype == jnp.bool_:
        init = False
        op = jax.lax.max
    else:
        init = -jnp.inf if jnp.issubdtype(arr.dtype, jnp.floating) else jnp.iinfo(arr.dtype).min
        op = jax.lax.max
    return jax.lax.reduce_window(
        arr,
        jnp.asarray(init, arr.dtype),
        op,
        window_dimensions=(win, win),
        window_strides=(1, 1),
        padding=((0, win - 1), (0, win - 1)),
    )


@functools.partial(jax.jit, static_argnames=("max_height",))
def pyramid(arr: jax.Array, max_height: int):
    """Coarse-map pyramid for branch-and-bound: heights 0..max_height with
    window 2^h, all at the original resolution and geometry
    (``PrecomputeGridMaps``, ``grid_map_builder.cpp:986-1012``)."""
    maps = [arr]
    for h in range(1, max_height + 1):
        maps.append(sliding_window_max2d(arr, 1 << h))
    return maps
