#!/usr/bin/env python
"""A/B microbenchmark of fine-sweep formulations on the real chip.

The fine sweep (ops/csm.py:sweep_from_hits) is the largest stage of the
matcher core.  Candidate formulations, all computing
``score[t, j, i] = sum_{r,c} hit[t,r,c] * inp[ch, r+j, c+i]``:

  patch   current production path: 100 dynamic-slice patches + one matmul
  conv    lax.conv_general_dilated with the hit images as filters
  rowcol  two-level shift: ny row-sliced bands (sublane-aligned) each
          swept by nx column shifts folded into ONE matmul via a
          block-Toeplitz operand built from 10 lane-rolled copies
  (pallas variants are in ops/csm_pallas.py; tested separately)

Run:  python scripts/sweep_variants.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from my_lidar_graph_slam_v2_tpu.ops import csm

    rng = np.random.default_rng(0)
    BATCH, T, B = 8, 32, 512
    crop, nx, ny, stride = 384, 10, 10, 1
    in_rows = crop + (ny - 1) * stride
    in_cols = crop + (nx - 1) * stride

    hit = jnp.asarray(
        (rng.uniform(0, 1, (BATCH, T, crop, crop)) < 0.002)
    ).astype(jnp.bfloat16)
    inp = jnp.asarray(
        rng.uniform(0, 1, (BATCH, 2, in_rows, in_cols)), jnp.bfloat16
    )

    def timeit(name, fn, *args, n=30):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / n * 1e3
        print(f"{name:8s} {ms:7.3f} ms/batch-{BATCH}", flush=True)
        return out

    # ---- A: production patch matmul --------------------------------
    def patch_one(h, x):
        hit_flat = h.reshape(T, -1)
        sl = [
            jax.lax.dynamic_slice(
                x, (0, j * stride, i * stride), (2, crop, crop)
            ).reshape(2, -1)
            for j in range(ny)
            for i in range(nx)
        ]
        patches = jnp.stack(sl, axis=1)
        o = jax.lax.dot_general(
            hit_flat, patches,
            dimension_numbers=(((1,), (2,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return o

    patch = jax.jit(jax.vmap(patch_one))

    # ---- B: conv lowering -------------------------------------------
    def conv_one(h, x):
        return jax.lax.conv_general_dilated(
            x[:, None],            # [2, 1, in_rows, in_cols]
            h[:, None],            # [T, 1, crop, crop]
            window_strides=(stride, stride),
            padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32,
        )

    conv = jax.jit(jax.vmap(conv_one))

    # ---- C: row-band matmuls (no column copies; contract over the
    # full in_cols with a zero-padded hit row) ------------------------
    def rowband_one(h, x):
        # hp[t, r, c] zero-padded to in_cols; for each (j, i):
        # score = sum_rc hp[t,r,c] x[r+j, c+i]  -> roll hp by i is the
        # same as slicing x; instead contract hp against x row-bands and
        # fold the i shift into nx lane-rolled copies of the BAND (built
        # once per j, reused for both channels).
        hp = jnp.pad(h, ((0, 0), (0, 0), (0, in_cols - crop)))
        hit_flat = hp.reshape(T, -1)  # [T, crop*in_cols]
        outs = []
        for j in range(ny):
            band = jax.lax.dynamic_slice(
                x, (0, j * stride, 0), (2, crop, in_cols)
            )  # [2, crop, in_cols]
            shifted = jnp.stack(
                [jnp.roll(band, -i * stride, axis=2) for i in range(nx)],
                axis=1,
            )  # [2, nx, crop, in_cols]
            o = jax.lax.dot_general(
                hit_flat,
                shifted.reshape(2, nx, -1),
                dimension_numbers=(((1,), (2,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [T, 2, nx]
            outs.append(o)
        return jnp.stack(outs, axis=2)  # [T, 2, ny, nx]

    rowband = jax.jit(jax.vmap(rowband_one))

    a = timeit("patch", patch, hit, inp)
    b = timeit("conv", conv, hit, inp)
    c = timeit("rowband", rowband, hit, inp)

    # agreement
    a_ = np.asarray(a).reshape(BATCH, T, 2, ny, nx)
    b_ = np.moveaxis(np.asarray(b), 1, 2).reshape(BATCH, T, 2, ny, nx)
    # rowband rolls wrap garbage into columns >= in_cols - i; but the hit
    # row is zero there only for i=0... check against patch where valid
    c_ = np.asarray(c)
    print("conv vs patch max err:", np.abs(a_ - b_).max())
    print("rowband vs patch max err:", np.abs(a_ - c_).max())


if __name__ == "__main__":
    main()
