#!/usr/bin/env python3
"""Decompose shade_gbuffer cost on the real chip: gather vs math vs aniso."""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from tpurast.config import RendererConfig
from tpurast.device.scene import load_demo_scene
from tpurast.kernels import shade


def timeit(fn, *args, n=20):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    cfg = RendererConfig(width=1920, height=1080)
    scene_host = load_demo_scene("/root/reference/data")
    scene = scene_host.device(cfg.texture_dtype)
    texels = scene["atlas"]["texels"]
    print(f"atlas: {texels.shape} {texels.dtype} = {texels.nbytes/1e6:.1f} MB")

    t_tiles = 30 * 17
    n = 64 * 64
    key = jax.random.PRNGKey(0)
    # synthetic but realistic gbuf: random uv, world, normal; off0 within atlas
    gb = jax.random.uniform(key, (t_tiles, 24, n), jnp.float32)
    rows = texels.shape[0]
    off_rows = jax.random.randint(key, (t_tiles, n), 0, max(rows // 256, 1), jnp.int32)
    gb = gb.at[:, 8, :].set(off_rows.astype(jnp.float32) * 0.0)  # off0/256 = 0 (mip in range)
    gb = gb.at[:, 9, :].set(512.0)
    gb = gb.at[:, 10, :].set(512.0)
    gb = gb.at[:, 12, :].set(256.0)
    gb = gb.at[:, 13, :].set(256.0)
    gb = gb.at[:, 17, :].set(1.0)
    cam = jnp.zeros(3, jnp.float32)

    kw = dict(light_direction=cfg.light_direction, light_color=cfg.light_color,
              ambient_amount=cfg.ambient_amount, specular_power=cfg.specular_power,
              clear_color=cfg.clear_color)

    @jax.jit
    def full(gb, tex, cam):
        return shade.shade_gbuffer(gb, tex, cam, **kw)

    @jax.jit
    def gather_only(gb, tex):
        u, v = gb[:, 6, :], gb[:, 7, :]
        tw0 = gb[:, 9, :].astype(jnp.int32)
        th0 = gb[:, 10, :].astype(jnp.int32)
        off0 = gb[:, 8, :].astype(jnp.int32) * 256
        x0i = jnp.mod((u * 512 - 0.5).astype(jnp.int32), tw0)
        y0i = jnp.mod((v * 512 - 0.5).astype(jnp.int32), th0)
        r = tex[off0 + y0i * tw0 + x0i].astype(jnp.float32)
        return jnp.sum(r, axis=-1)

    @jax.jit
    def lighting_only(gb, cam):
        world = jnp.stack([gb[:, 0], gb[:, 1], gb[:, 2]], axis=-1)
        normal = jnp.stack([gb[:, 3], gb[:, 4], gb[:, 5]], axis=-1)
        albedo = jnp.ones(world.shape[:-1] + (4,), jnp.float32)
        ldir = jnp.asarray(cfg.light_direction, jnp.float32)
        nrm = normal * jax.lax.rsqrt(jnp.maximum(jnp.sum(normal * normal, -1, keepdims=True), 1e-20))
        vdir = cam - world
        vn = vdir * jax.lax.rsqrt(jnp.maximum(jnp.sum(vdir * vdir, -1, keepdims=True), 1e-20))
        ndl = jnp.sum(nrm * ldir, -1, keepdims=True)
        r = 2 * ndl * nrm - ldir
        spec = albedo[..., 3:4] * jnp.power(jnp.maximum(0.0, jnp.sum(vn * r, -1, keepdims=True)), 32.0)
        return (0.1 + jnp.maximum(ndl, 0)) * albedo[..., :3] + spec

    print(f"full shade_gbuffer: {timeit(full, gb, texels, cam):7.2f} ms")
    print(f"gather-only (1 row/px): {timeit(gather_only, gb, texels):7.2f} ms")
    print(f"lighting-only: {timeit(lighting_only, gb, cam):7.2f} ms")

    # trilerp only (gather + blends, no lighting)
    @jax.jit
    def trilerp_only(gb, tex):
        off0 = gb[:, 8, :].astype(jnp.int32) * 256
        tw0 = gb[:, 9, :].astype(jnp.int32)
        th0 = gb[:, 10, :].astype(jnp.int32)
        tw1 = gb[:, 12, :].astype(jnp.int32)
        th1 = gb[:, 13, :].astype(jnp.int32)
        tfrac = gb[:, 14, :][..., None]
        return shade._trilerp(tex, off0, tw0, th0, tw1, th1, tfrac, gb[:, 6, :], gb[:, 7, :]).sum(-1)

    print(f"trilerp-only: {timeit(trilerp_only, gb, texels):7.2f} ms")


if __name__ == "__main__":
    main()
