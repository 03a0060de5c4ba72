#!/usr/bin/env python3
"""Microbenchmarks that size the round-2 design decisions on the real chip.

1. Gather cost model: ns/row vs row width/dtype/count (texture sampling is
   gather-row bound; the atlas layout trades row width for row count).
2. lax.sort throughput (pair-sort binning feasibility at 4K instancing).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/microbench.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=30):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])  # sync (axon)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


def gather_bench():
    key = jax.random.PRNGKey(0)
    n_px = 2_073_600  # 1080p
    print("--- gather: 2.07M rows (1080p pixels), atlas 512 MB ---")
    for dtype, width in [
        (jnp.float16, 52), (jnp.float16, 16), (jnp.float16, 8),
        (jnp.float16, 4), (jnp.float32, 16), (jnp.float32, 4),
    ]:
        bytes_per = width * np.dtype(dtype).itemsize
        rows = 512 * 2**20 // bytes_per
        table = jnp.zeros((rows, width), dtype)
        idx = jax.random.randint(key, (n_px,), 0, rows, dtype=jnp.int32)
        idx2 = jax.random.randint(jax.random.PRNGKey(1), (n_px,), 0, rows, dtype=jnp.int32)

        @jax.jit
        def one(t, i):
            return jnp.sum(t[i].astype(jnp.float32), axis=-1)

        @jax.jit
        def two(t, i, i2):
            return jnp.sum(t[i].astype(jnp.float32), axis=-1) + jnp.sum(
                t[i2].astype(jnp.float32), axis=-1)

        ms1 = timeit(one, table, idx)
        ms2 = timeit(two, table, idx, idx2)
        print(f"{np.dtype(dtype).name} w={width:2d} ({bytes_per:3d} B/row): "
              f"1x gather {ms1:7.2f} ms ({ms1*1e6/n_px:5.2f} ns/row), "
              f"2x gather {ms2:7.2f} ms", flush=True)

    # sorted (spatially local) indices vs random
    width = 16
    table = jnp.zeros((512 * 2**20 // 32, width), jnp.float16)
    rows = table.shape[0]
    idx_r = jax.random.randint(key, (n_px,), 0, rows, dtype=jnp.int32)
    idx_s = jnp.sort(idx_r)
    idx_l = jnp.clip(
        (jnp.arange(n_px) // 4) + jax.random.randint(key, (n_px,), 0, 64), 0, rows - 1
    ).astype(jnp.int32)

    @jax.jit
    def one(t, i):
        return jnp.sum(t[i].astype(jnp.float32), axis=-1)

    print(f"f16 w=16 sorted idx: {timeit(one, table, idx_s):7.2f} ms | "
          f"local idx: {timeit(one, table, idx_l):7.2f} ms | "
          f"random: {timeit(one, table, idx_r):7.2f} ms", flush=True)

    # small-table gather (one-hot matmul candidate): 64x64 fallback texture
    small = jnp.zeros((4096, 16), jnp.float16)
    idx_sm = jax.random.randint(key, (n_px,), 0, 4096, dtype=jnp.int32)
    print(f"f16 w=16 4K-row table: {timeit(one, small, idx_sm):7.2f} ms", flush=True)


def sort_bench():
    print("--- lax.sort int32 (tile keys) + payload ---")
    key = jax.random.PRNGKey(0)
    for p in [1 << 16, 1 << 18, 1 << 20, 1 << 22]:
        keys = jax.random.randint(key, (p,), 0, 2048, dtype=jnp.int32)
        vals = jnp.arange(p, dtype=jnp.int32)

        @jax.jit
        def two_key(k, v):
            return jax.lax.sort((k, v), num_keys=2)

        ms = timeit(two_key, keys, vals, n=10)
        print(f"P={p:>9,}: {ms:8.2f} ms", flush=True)


def scatter_bench():
    print("--- scatter (pair expansion) ---")
    key = jax.random.PRNGKey(0)
    for f, tpf in [(1 << 21, 8)]:
        cap = f * 2
        dest = jax.random.randint(key, (f, tpf), 0, cap, dtype=jnp.int32)
        src = jnp.broadcast_to(jnp.arange(f, dtype=jnp.int32)[:, None], (f, tpf))

        @jax.jit
        def scat(d, s):
            buf = jnp.zeros(cap + 1, jnp.int32)
            return buf.at[d.reshape(-1)].set(s.reshape(-1), mode="drop")

        ms = timeit(scat, dest, src, n=10)
        print(f"F={f:,} x {tpf} slots -> {cap:,} buf: {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    gather_bench()
    sort_bench()
    scatter_bench()
