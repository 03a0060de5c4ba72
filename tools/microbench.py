#!/usr/bin/env python3
"""Device microbenchmarks that size the kernel/layout design decisions.

One parameterized tool (was microbench{,2,3,5}.py scratch copies).
Subcommands:

  gather     ns/row vs row width/dtype + index locality + 2x-gather cost
  tablesize  ns/row vs table footprint (the DRAM-locality cliff that
             motivates hot/cold mip packing and srgb8 atlas storage)
  surface    ns/row over (rows x width) grid (row-count vs width bound)
  sort       lax.sort throughput (pair-sort binning feasibility)
  scatter    scatter-write cost (pair expansion alternative)
  shade      decompose shade_gbuffer: gather vs trilerp vs lighting
  vmemtake   Pallas in-kernel VMEM jnp.take probe

Run: PYTHONPATH=/root/repo python tools/microbench.py <subcommand>
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def timeit(fn, *args, n=20):
    import jax

    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])  # sync (axon)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


N_PX = 2_073_600  # 1080p pixel count: the per-frame gather row count


def cmd_gather(args):
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    print(f"--- gather: {N_PX/1e6:.2f}M rows, atlas {args.mb} MB ---")
    for dtype, width in [
        (jnp.float16, 52), (jnp.float16, 16), (jnp.float16, 8),
        (jnp.float16, 4), (jnp.float32, 16), (jnp.float32, 4),
    ]:
        bytes_per = width * np.dtype(dtype).itemsize
        rows = args.mb * 2**20 // bytes_per
        table = jnp.zeros((rows, width), dtype)
        idx = jax.random.randint(key, (N_PX,), 0, rows, dtype=jnp.int32)
        idx2 = jax.random.randint(jax.random.PRNGKey(1), (N_PX,), 0, rows, dtype=jnp.int32)

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
              f"1x gather {ms1:7.2f} ms ({ms1*1e6/N_PX:5.2f} ns/row), "
              f"2x gather {ms2:7.2f} ms", flush=True)

    width = 16
    table = jnp.zeros((args.mb * 2**20 // 32, width), jnp.float16)
    rows = table.shape[0]
    idx_r = jax.random.randint(key, (N_PX,), 0, rows, dtype=jnp.int32)
    idx_s = jnp.sort(idx_r)
    idx_l = jnp.clip(
        (jnp.arange(N_PX) // 4) + jax.random.randint(key, (N_PX,), 0, 64), 0, rows - 1
    ).astype(jnp.int32)

    @jax.jit
    def one(t, i):
        return jnp.sum(t[i].astype(jnp.float32), axis=-1)

    print(f"f16 w=16 sorted idx: {timeit(one, table, idx_s):7.2f} ms | "
          f"local idx: {timeit(one, table, idx_l):7.2f} ms | "
          f"random: {timeit(one, table, idx_r):7.2f} ms", flush=True)


def cmd_tablesize(args):
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    print("--- f16 w=16 (32 B/row) gather, 2.07M rows, vs table size ---")
    for mb in [0.125, 0.5, 2, 8, 32, 128, 512]:
        rows = int(mb * 2**20 / 32)
        table = jnp.zeros((rows, 16), jnp.float16)
        idx = jax.random.randint(key, (N_PX,), 0, rows, dtype=jnp.int32)

        @jax.jit
        def one(t, i):
            return jnp.sum(t[i].astype(jnp.float32), axis=-1)

        ms = timeit(one, table, idx)
        print(f"table {mb:7.3f} MB ({rows:>9,} rows): {ms:7.2f} ms "
              f"({ms*1e6/N_PX:5.2f} ns/row)", flush=True)

    # locality: big table, small index range
    rows = 512 * 2**20 // 32
    table = jnp.zeros((rows, 16), jnp.float16)
    idx_sm = jax.random.randint(key, (N_PX,), 0, 4096, dtype=jnp.int32)

    @jax.jit
    def one(t, i):
        return jnp.sum(t[i].astype(jnp.float32), axis=-1)

    print(f"512MB table, idx in first 128KB: {timeit(one, table, idx_sm):7.2f} ms",
          flush=True)


def cmd_surface(args):
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)

    @jax.jit
    def one(t, i):
        return jnp.sum(t[i].astype(jnp.float32), axis=-1)

    widths = (16, 52, 164, 328, 656)
    print(f"{'rows':>10} | " + " | ".join(f"w={w:<4}" for w in widths))
    for rows_exp in (17, 18, 19, 20, 22):
        rows = 1 << rows_exp
        line = [f"{rows:>10,}"]
        for width in widths:
            mb = rows * width * 2 / 2**20
            if mb > 4096:
                line.append("  -  ")
                continue
            table = jnp.zeros((rows, width), jnp.float16)
            idx = jax.random.randint(key, (N_PX,), 0, rows, dtype=jnp.int32)
            ms = timeit(one, table, idx, n=15)
            line.append(f"{ms*1e6/N_PX:5.2f}")
        print(" | ".join(line), flush=True)


def cmd_sort(args):
    import jax
    import jax.numpy as jnp

    print("--- lax.sort int32 (tile keys) + payload ---")
    key = jax.random.PRNGKey(0)
    for p in [1 << 16, 1 << 18, 1 << 20, 1 << 22]:
        keys = jax.random.randint(key, (p,), 0, 2048, dtype=jnp.int32)
        vals = jnp.arange(p, dtype=jnp.int32)

        @jax.jit
        def two_key(k, v):
            return jax.lax.sort((k, v), num_keys=2)

        print(f"P={p:>9,}: {timeit(two_key, keys, vals, n=10):8.2f} ms", flush=True)


def cmd_scatter(args):
    import jax
    import jax.numpy as jnp

    print("--- scatter (pair expansion) ---")
    key = jax.random.PRNGKey(0)
    f, tpf = 1 << 21, 8
    cap = f * 2
    dest = jax.random.randint(key, (f, tpf), 0, cap, dtype=jnp.int32)
    src = jnp.broadcast_to(jnp.arange(f, dtype=jnp.int32)[:, None], (f, tpf))

    @jax.jit
    def scat(d, s):
        buf = jnp.zeros(cap + 1, jnp.int32)
        return buf.at[d.reshape(-1)].set(s.reshape(-1), mode="drop")

    print(f"F={f:,} x {tpf} slots -> {cap:,} buf: {timeit(scat, dest, src, n=10):8.2f} ms",
          flush=True)


def cmd_shade(args):
    import jax
    import jax.numpy as jnp

    from tpurast.config import RendererConfig
    from tpurast.device.scene import load_demo_scene
    from tpurast.kernels import shade

    cfg = RendererConfig(width=1920, height=1080)
    scene_host = load_demo_scene(args.data_dir)
    scene = scene_host.device("float16")
    texels = scene["atlas"]["texels"]
    print(f"atlas: {texels.shape} {texels.dtype} = {texels.nbytes/1e6:.1f} MB")

    h, w = 1088, 1920
    key = jax.random.PRNGKey(0)
    gb = jax.random.uniform(key, (24, h, w), jnp.float32)
    gb = gb.at[8].set(0.0)    # off0/256
    gb = gb.at[9].set(512.0)  # tw0
    gb = gb.at[10].set(512.0)
    gb = gb.at[11].set(256.0)
    gb = gb.at[12].set(256.0)
    gb = gb.at[16].set(1.0)   # matched
    cam = jnp.zeros(3, jnp.float32)

    kw = dict(light_direction=cfg.light_direction, light_color=cfg.light_color,
              ambient_amount=cfg.ambient_amount, specular_power=cfg.specular_power,
              clear_color=cfg.clear_color)

    @jax.jit
    def full(gb, tex, cam):
        return shade.shade_gbuffer(gb, tex, cam, **kw)

    @jax.jit
    def gather_only(gb, tex):
        u, v = gb[6], gb[7]
        tw0 = gb[9].astype(jnp.int32)
        th0 = gb[10].astype(jnp.int32)
        off0 = gb[8].astype(jnp.int32) * 256
        x0i = jnp.mod((u * 512 - 0.5).astype(jnp.int32), tw0)
        y0i = jnp.mod((v * 512 - 0.5).astype(jnp.int32), th0)
        r = tex[off0 + y0i * tw0 + x0i].astype(jnp.float32)
        return jnp.sum(r, axis=-1)

    @jax.jit
    def trilerp_only(gb, tex):
        off0 = gb[8].astype(jnp.int32) * 256
        out = shade._trilerp(tex, off0, gb[9].astype(jnp.int32),
                             gb[10].astype(jnp.int32), gb[11].astype(jnp.int32),
                             gb[12].astype(jnp.int32), gb[13], gb[6], gb[7])
        return out[0] + out[1] + out[2] + out[3]

    print(f"full shade_gbuffer: {timeit(full, gb, texels, cam):7.2f} ms")
    print(f"gather-only (1 row/px): {timeit(gather_only, gb, texels):7.2f} ms")
    print(f"trilerp-only: {timeit(trilerp_only, gb, texels):7.2f} ms")


def cmd_vmemtake(args):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("--- Pallas in-kernel VMEM gather probe ---")
    rows, width = 4096, 16
    table = jnp.zeros((rows, width), jnp.float32)
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N_PX,), 0, rows, dtype=jnp.int32)
    blk = 4096

    def kernel(tab_ref, idx_ref, out_ref):
        i = idx_ref[:]
        out_ref[:] = jnp.take(tab_ref[:], i[0], axis=0).sum(axis=-1)[None, :]

    @jax.jit
    def run(tab, i):
        return pl.pallas_call(
            kernel,
            grid=(N_PX // blk,),
            in_specs=[
                pl.BlockSpec((rows, width), lambda g: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, blk), lambda g: (0, g), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, blk), lambda g: (0, g), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, N_PX), jnp.float32),
        )(tab, i.reshape(1, -1))

    try:
        ms = timeit(run, table, idx)
        print(f"pallas vmem take (4096x16 f32 table): {ms:7.2f} ms "
              f"({ms*1e6/N_PX:5.2f} ns/row)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"pallas vmem take FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("gather", "tablesize", "surface", "sort", "scatter", "shade", "vmemtake"):
        p = sub.add_parser(name)
        if name == "gather":
            p.add_argument("--mb", type=int, default=512)
        if name == "shade":
            p.add_argument("--data-dir", default="/root/reference/data")
    args = ap.parse_args()
    globals()[f"cmd_{args.cmd}"](args)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
