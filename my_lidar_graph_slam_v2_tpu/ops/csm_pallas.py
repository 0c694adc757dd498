"""Fused CSM sweep as a Pallas TPU kernel.

The XLA path (ops/csm.py) materializes per-theta hit images in HBM
(``[T, crop, crop]`` — the dominant traffic) before correlating them with
the map window.  This kernel fuses both stages entirely in VMEM:

* grid over theta tiles; per theta, the beam-cell one-hot outer product is
  built in registers and contracted on the MXU into a VMEM hit image
  (bf16 — exact for per-cell counts < 256);
* the (x, y) window sweep contracts the theta-tile's hit images against
  statically shifted views of the (prob, observed) input planes — small
  ``[T_TILE, crop^2] x [crop^2, nx]`` matmuls per (channel, y-offset),
  again on the MXU;
* HBM traffic is just the inputs once (~1-2 MB) and the tiny score
  output, instead of hundreds of MB of hit images.

This is the TPU equivalent of the reference's FPGA CSM core
(``scan_matcher_correlative_fpga.cpp``): beam data and the map crop are
staged into on-chip memory once and the whole pose window is scored from
there.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hit_image_kernel(rows_ref, cols_ref, out_ref, *, crop_rows, crop_cols):
    """One theta per program: hit image = onehot_rows^T @ onehot_cols.

    rows/cols: [1, B] i32 in crop coords, -1 for inactive (matches no
    iota row, so the beam vanishes).  The one-hot operands only ever live
    in VMEM/registers — this removes the [T, B, crop] HBM intermediates
    that dominate the XLA build's runtime (~330 MB per match at T=208).
    """
    B = rows_ref.shape[1]
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (crop_rows, B), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (crop_cols, B), 0)
    onehot_rT = (iota_r == rows_ref[0:1, :]).astype(jnp.bfloat16)  # [CR, B]
    onehot_cT = (iota_c == cols_ref[0:1, :]).astype(jnp.bfloat16)  # [CC, B]
    out_ref[...] = jax.lax.dot_general(
        onehot_rT,
        onehot_cT,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)[None]


@functools.partial(
    jax.jit, static_argnames=("crop_rows", "crop_cols", "interpret")
)
def build_hit_images(
    rows: jax.Array,  # [T, B] i32 crop coords, -1 for inactive
    cols: jax.Array,  # [T, B] i32
    *,
    crop_rows: int,
    crop_cols: int,
    interpret: bool = False,
):
    """Pallas hit-image build: bf16 [T, crop_rows, crop_cols] counts."""
    T, B = rows.shape
    kernel = functools.partial(
        _hit_image_kernel, crop_rows=crop_rows, crop_cols=crop_cols
    )
    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, crop_rows, crop_cols),
            lambda t: (t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((T, crop_rows, crop_cols), jnp.bfloat16),
        interpret=interpret,
    )(rows, cols)


def _sweep_kernel(
    rows_ref,  # [T_TILE, B] i32 (crop coords; -1 = inactive)
    cols_ref,  # [T_TILE, B] i32
    inp_ref,  # [2, in_rows, in_cols] f32
    out_ref,  # [T_TILE, 2, ny, nx] f32
    hit_ref,  # scratch [crop_rows, T_TILE, crop_cols] bf16
    patch_ref,  # scratch [crop_rows, nx, crop_cols] bf16
    *,
    t_tile: int,
    crop_rows: int,
    crop_cols: int,
    nx: int,
    ny: int,
    stride: int,
):
    B = rows_ref.shape[1]
    # Transposed iota/one-hot layouts: everything stays 2-D with the beam
    # axis minor, so only row broadcasts are needed (Mosaic rejects 1-D
    # vectors and lane-collapsing reshapes).
    iota_rT = jax.lax.broadcasted_iota(jnp.int32, (crop_rows, B), 0)
    iota_cT = jax.lax.broadcasted_iota(jnp.int32, (crop_cols, B), 0)

    # Build the theta-tile's hit images on the MXU, keep them in VMEM.
    # Scratch layout [CR, t_tile, CC]: the sweep below batches its matmuls
    # over the row dimension (Mosaic supports only 2-D contractions with
    # leading batch dims).
    for t in range(t_tile):
        r = rows_ref[t : t + 1, :]  # [1, B]
        c = cols_ref[t : t + 1, :]
        onehot_rT = (iota_rT == r).astype(jnp.bfloat16)  # [CR, B]
        onehot_cT = (iota_cT == c).astype(jnp.bfloat16)  # [CC, B]
        hit = jax.lax.dot_general(
            onehot_rT,
            onehot_cT,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [CR, CC]
        hit_ref[:, t, :] = hit.astype(jnp.bfloat16)

    hits = hit_ref[:]  # [CR, t_tile, CC]

    # Window sweep: per (channel, y-offset), a row-batched matmul
    # [CR](batch) x [t_tile, CC] @ [CC, nx], then reduce over rows.
    for ch in range(2):
        for j in range(ny):
            band = inp_ref[ch, j * stride : j * stride + crop_rows, :]
            # Patch layout [CR, nx, CC] staged through a VMEM scratch
            # (stacking lane-offset slices as a vector concat is rejected
            # by Mosaic: "offset mismatch on non-concat dimension"; a
            # store normalizes each slice's layout instead).
            for i in range(nx):
                patch_ref[:, i, :] = band[
                    :, i * stride : i * stride + crop_cols
                ].astype(jnp.bfloat16)
            prod = jax.lax.dot_general(
                hits,
                patch_ref[:],
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [CR, t_tile, nx]
            out_ref[:, ch, j, :] = jnp.sum(prod, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("nx", "ny", "stride", "crop_rows", "crop_cols", "t_tile", "interpret"),
)
def sweep(
    inp: jax.Array,  # [2, in_rows, in_cols] f32 (prob, observed)
    rows: jax.Array,  # [T, B] i32 crop coords, -1 for inactive
    cols: jax.Array,  # [T, B] i32
    *,
    nx: int,
    ny: int,
    stride: int,
    crop_rows: int,
    crop_cols: int,
    t_tile: int = 8,
    interpret: bool = False,
):
    T, B = rows.shape
    n_tiles = (T + t_tile - 1) // t_tile
    Tp = n_tiles * t_tile
    if Tp != T:
        rows = jnp.pad(rows, ((0, Tp - T), (0, 0)), constant_values=-1)
        cols = jnp.pad(cols, ((0, Tp - T), (0, 0)), constant_values=-1)

    kernel = functools.partial(
        _sweep_kernel,
        t_tile=t_tile,
        crop_rows=crop_rows,
        crop_cols=crop_cols,
        nx=nx,
        ny=ny,
        stride=stride,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((t_tile, B), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t_tile, B), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                inp.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (t_tile, 2, ny, nx), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Tp, 2, ny, nx), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((crop_rows, t_tile, crop_cols), jnp.bfloat16),
            pltpu.VMEM((crop_rows, nx, crop_cols), jnp.bfloat16),
        ],
        interpret=interpret,
    )(rows, cols, inp.astype(jnp.float32))
    scores = out[:T, 0]
    known = out[:T, 1]
    return scores, known
