#!/usr/bin/env python3
"""Isolate Pallas grid pipeline cost for gbuf-shaped tile blocks.

Measures a trivial kernel (copy one plane) over the same (T,) grid and
(A_OUT, th, tw) blocks the sampler plan/sample kernels use, to separate
block-DMA/pipeline overhead from real compute.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    th, tw = 32, 128
    tiles_x, tiles_y = 15, 34
    a = 24
    h, w = tiles_y * th, tiles_x * tw
    t_total = tiles_x * tiles_y
    gbuf = jnp.asarray(np.random.rand(a, h, w).astype(np.float32))

    def kernel(g_ref, o_ref):
        o_ref[...] = g_ref[16:17] * 2.0

    fn = jax.jit(lambda g: pl.pallas_call(
        kernel,
        grid=(t_total,),
        in_specs=[pl.BlockSpec((a, th, tw),
                               lambda i: (0, i // tiles_x, i % tiles_x),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, th, tw),
                               lambda i: (0, i // tiles_x, i % tiles_x),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, h, w), jnp.float32),
    )(g))

    out = fn(gbuf)
    np.asarray(out.ravel()[0])
    for label, f in [("tile-grid copy", fn)]:
        times = []
        for _ in range(6):
            t0 = time.perf_counter()
            for _ in range(4):
                out = f(gbuf)
            np.asarray(out.ravel()[0])
            times.append((time.perf_counter() - t0) / 4)
        print(json.dumps({label: round(float(np.percentile(np.array(times) * 1e3, 50)), 3)}))

    # same but only ONE input plane (no fat gbuf block)
    def kernel1(g_ref, o_ref):
        o_ref[...] = g_ref[...] * 2.0

    fn1 = jax.jit(lambda g: pl.pallas_call(
        kernel1,
        grid=(t_total,),
        in_specs=[pl.BlockSpec((1, th, tw),
                               lambda i: (0, i // tiles_x, i % tiles_x),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, th, tw),
                               lambda i: (0, i // tiles_x, i % tiles_x),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, h, w), jnp.float32),
    )(g))
    out = fn1(gbuf[16:17])
    np.asarray(out.ravel()[0])
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        for _ in range(4):
            out = fn1(gbuf[16:17])
        np.asarray(out.ravel()[0])
        times.append((time.perf_counter() - t0) / 4)
    print(json.dumps({"one-plane copy": round(float(np.percentile(np.array(times) * 1e3, 50)), 3)}))

    # row-band grid: 34 steps of (a, th, w)
    def kernel2(g_ref, o_ref):
        o_ref[...] = g_ref[16:17] * 2.0

    fn2 = jax.jit(lambda g: pl.pallas_call(
        kernel2,
        grid=(tiles_y,),
        in_specs=[pl.BlockSpec((a, th, w), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, th, w), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, h, w), jnp.float32),
    )(g))
    out = fn2(gbuf)
    np.asarray(out.ravel()[0])
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        for _ in range(4):
            out = fn2(gbuf)
        np.asarray(out.ravel()[0])
        times.append((time.perf_counter() - t0) / 4)
    print(json.dumps({"row-band copy": round(float(np.percentile(np.array(times) * 1e3, 50)), 3)}))


if __name__ == "__main__":
    main()
