#!/usr/bin/env python3
"""Gather cost vs table size + index locality + Pallas VMEM gather probe."""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, n=20):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


def size_sweep():
    key = jax.random.PRNGKey(0)
    n_px = 2_073_600
    print("--- f16 w=16 (32 B/row) gather, 2.07M rows, vs table size ---")
    for mb in [0.125, 0.5, 2, 8, 32, 128]:
        rows = int(mb * 2**20 / 32)
        table = jnp.zeros((rows, 16), jnp.float16)
        idx = jax.random.randint(key, (n_px,), 0, rows, dtype=jnp.int32)

        @jax.jit
        def one(t, i):
            return jnp.sum(t[i].astype(jnp.float32), axis=-1)

        ms = timeit(one, table, idx)
        print(f"table {mb:7.3f} MB ({rows:>8,} rows): {ms:7.2f} ms "
              f"({ms*1e6/n_px:5.2f} ns/row)", flush=True)

    # locality: big table, small index range
    rows = 512 * 2**20 // 32
    table = jnp.zeros((rows, 16), jnp.float16)
    idx_sm = jax.random.randint(key, (n_px,), 0, 4096, dtype=jnp.int32)

    @jax.jit
    def one(t, i):
        return jnp.sum(t[i].astype(jnp.float32), axis=-1)

    print(f"512MB table, idx in first 128KB: {timeit(one, table, idx_sm):7.2f} ms",
          flush=True)

    # wide rows from a small table (the trilerp-row design, atlas ~4 MB)
    for width, mb in [(52, 4), (52, 32)]:
        rows = int(mb * 2**20 / (width * 2))
        table = jnp.zeros((rows, width), jnp.float16)
        idx = jax.random.randint(key, (n_px,), 0, rows, dtype=jnp.int32)
        ms = timeit(one, table, idx)
        print(f"f16 w={width} table {mb} MB: {ms:7.2f} ms ({ms*1e6/n_px:5.2f} ns/row)",
              flush=True)


def pallas_vmem_gather():
    print("--- Pallas in-kernel VMEM gather probe ---")
    n_px = 2_073_600
    rows, width = 4096, 16
    table = jnp.zeros((rows, width), jnp.float32)
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (n_px,), 0, rows, dtype=jnp.int32)

    blk = 4096

    def kernel(tab_ref, idx_ref, out_ref):
        i = idx_ref[:]  # (1, blk) int32
        out_ref[:] = jnp.take(tab_ref[:], i[0], axis=0).sum(axis=-1)[None, :]

    @jax.jit
    def run(tab, i):
        return pl.pallas_call(
            kernel,
            grid=(n_px // blk,),
            in_specs=[
                pl.BlockSpec((rows, width), lambda g: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, blk), lambda g: (0, g), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, blk), lambda g: (0, g), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, n_px), jnp.float32),
        )(tab, i.reshape(1, -1))

    try:
        ms = timeit(run, table, idx)
        print(f"pallas vmem take (4096x16 f32 table): {ms:7.2f} ms "
              f"({ms*1e6/n_px:5.2f} ns/row)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"pallas vmem take FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    size_sweep()
    pallas_vmem_gather()
