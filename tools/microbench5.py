#!/usr/bin/env python3
"""Gather cost surface: ns/row over (table rows x row width).

Determines the texel-block atlas design: if the fast (~3 ns/row) regime
is row-count bound with near-free width, big textures should pack many
texels per row (block rows) to stay under the row-count breakpoint.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=15):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    key = jax.random.PRNGKey(0)
    n_px = 2_073_600

    @jax.jit
    def one(t, i):
        return jnp.sum(t[i].astype(jnp.float32), axis=-1)

    print(f"{'rows':>10} | " + " | ".join(f"w={w:<4}" for w in (16, 52, 164, 328, 656)))
    for rows_exp in (17, 18, 19, 20, 22):
        rows = 1 << rows_exp
        line = [f"{rows:>10,}"]
        for width in (16, 52, 164, 328, 656):
            mb = rows * width * 2 / 2**20
            if mb > 4096:
                line.append("  -  ")
                continue
            table = jnp.zeros((rows, width), jnp.float16)
            idx = jax.random.randint(key, (n_px,), 0, rows, dtype=jnp.int32)
            ms = timeit(one, table, idx)
            line.append(f"{ms*1e6/n_px:5.2f}")
        print(" | ".join(line), flush=True)


if __name__ == "__main__":
    main()
