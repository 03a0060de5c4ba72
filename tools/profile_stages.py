#!/usr/bin/env python3
"""Per-stage device timing for the frame pipeline.

Times jit-compiled prefixes of the pipeline (geometry+bin | +raster |
+shade | full) with the group-sync method from bench.py (tiny fetch to
force completion; axon's block_until_ready does not block). The delta
between successive prefixes approximates each stage's cost, including
what XLA can overlap.

Usage: python tools/profile_stages.py [--scene demo] [--width 1920] ...
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_fn(fn, uniforms, scene, warmup=4, frames=24, group=4):
    out = None
    for u in uniforms[:warmup]:
        out = fn(scene, *u)
    np.asarray(next(iter(out.values())).ravel()[0])
    times = []
    for g in range(0, frames, group):
        t0 = time.perf_counter()
        for u in uniforms[warmup + g : warmup + g + group]:
            out = fn(scene, *u)
        np.asarray(next(iter(out.values())).ravel()[0])
        times.append((time.perf_counter() - t0) / group)
    return float(np.percentile(np.asarray(times) * 1e3, 50))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--scene", default="demo")
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--data-dir", default="/root/reference/data")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpurast.camera import Camera
    from tpurast.config import RendererConfig
    from tpurast.device.scene import (
        load_demo_scene,
        load_instanced_dragons,
        load_porsche_class_scene,
    )
    from tpurast.kernels import geometry, present, raster, shade
    from tpurast.renderer import Renderer

    from tools._scene_cache import load_scene_cached

    if args.scene == "dragons64":
        scene_host = load_scene_cached("dragons64", load_instanced_dragons, args.data_dir, 64)
    elif args.scene == "porsche_class":
        scene_host = load_scene_cached("porsche_class", load_porsche_class_scene, args.data_dir)
    else:
        scene_host = load_scene_cached("demo", load_demo_scene, args.data_dir)
    cfg = RendererConfig(width=args.width, height=args.height)
    r = Renderer(scene_host, cfg)

    cams = []
    for i in range(64):
        ang = 0.4 + 0.01 * i
        pos = np.array([1.2 * np.sin(ang), 0.75, -1.2 * np.cos(ang)], np.float32)
        cams.append(Camera.from_target(pos, [0.0, 0.95, 0.0]))
    uniforms = [r.frame_uniforms(c) for c in cams]

    tiles_x, tiles_y = r.tiles_x, r.tiles_y
    tw, th = cfg.tile_w, cfg.tile_h
    seg_headroom = r.segment_headroom

    def stage_geom(scene, view_proj, cam):
        clip, world, wnormal = geometry.transform_vertices(
            scene["positions"], scene["normals"], scene["vert_prim"],
            scene["models"], scene["normal_mats"], view_proj)
        s = geometry.triangle_setup(clip, scene["faces"], scene["n_faces"],
                                    args.width, args.height)
        return {"x": s["setup"][:, 0] + jnp.sum(s["valid"]) + world[0, 0] + wnormal[0, 0]}

    def stage_bin(scene, view_proj, cam):
        clip, world, wnormal = geometry.transform_vertices(
            scene["positions"], scene["normals"], scene["vert_prim"],
            scene["models"], scene["normal_mats"], view_proj)
        s = geometry.triangle_setup(clip, scene["faces"], scene["n_faces"],
                                    args.width, args.height)
        bins = geometry.bin_triangles(
            s["aabb"], s["valid"], tiles_x, tiles_y, tw, th, r.bin_capacity)
        return {"x": bins["counts"] + bins["pair_faces"][0]}

    def stage_raster(scene, view_proj, cam):
        clip, world, wnormal = geometry.transform_vertices(
            scene["positions"], scene["normals"], scene["vert_prim"],
            scene["models"], scene["normal_mats"], view_proj)
        s = geometry.triangle_setup(clip, scene["faces"], scene["n_faces"],
                                    args.width, args.height)
        bins = geometry.bin_triangles(
            s["aabb"], s["valid"], tiles_x, tiles_y, tw, th, r.bin_capacity)
        depth, fid, dropped = raster.rasterize_visibility(
            bins, s["setup"], tile_h=th, tile_w=tw,
            tiles_x=tiles_x, tiles_y=tiles_y, clear_depth=cfg.clear_depth,
            segment_headroom=seg_headroom)
        return {"x": fid}

    def stage_gather_only(scene, view_proj, cam):
        """Raster + the per-pixel fat gather, no shading math/tex."""
        clip, world, wnormal = geometry.transform_vertices(
            scene["positions"], scene["normals"], scene["vert_prim"],
            scene["models"], scene["normal_mats"], view_proj)
        s = geometry.triangle_setup(clip, scene["faces"], scene["n_faces"],
                                    args.width, args.height)
        bins = geometry.bin_triangles(
            s["aabb"], s["valid"], tiles_x, tiles_y, tw, th, r.bin_capacity)
        depth, fid, dropped = raster.rasterize_visibility(
            bins, s["setup"], tile_h=th, tile_w=tw,
            tiles_x=tiles_x, tiles_y=tiles_y, clear_depth=cfg.clear_depth,
            segment_headroom=seg_headroom)
        faces = scene["faces"]
        rows = shade.pack_shade_rows(
            s["setup"], world[faces], wnormal[faces], scene["uvs"][faces],
            scene["prim_tex"][scene["face_prim"]], scene["atlas"])
        g = rows[jnp.maximum(fid, 0)]
        return {"x": jnp.sum(g, axis=-1)}

    full = r._frame_fn

    from tpurast.kernels import resolve as kresolve

    def _common(scene, view_proj):
        clip, world, wnormal = geometry.transform_vertices(
            scene["positions"], scene["normals"], scene["vert_prim"],
            scene["models"], scene["normal_mats"], view_proj)
        s = geometry.triangle_setup(clip, scene["faces"], scene["n_faces"],
                                    args.width, args.height)
        bins = geometry.bin_triangles(
            s["aabb"], s["valid"], tiles_x, tiles_y, tw, th, r.bin_capacity)
        tile_counts = bins["counts"]
        plan = raster.plan_segments(bins, segment_headroom=seg_headroom)
        vis = raster.rasterize_tiles(tile_counts, s["setup"], plan,
                                     tile_h=th, tile_w=tw, tiles_x=tiles_x,
                                     tiles_y=tiles_y, clear_depth=cfg.clear_depth)
        return s, world, wnormal, tile_counts, plan, vis

    def stage_resolve(scene, view_proj, cam):
        s, world, wnormal, tile_counts, plan, vis = _common(scene, view_proj)
        faces = scene["faces"]
        attrs = kresolve.pack_resolve_attrs(
            s["setup"], world[faces], wnormal[faces], scene["uvs"][faces],
            scene["prim_tex"][scene["face_prim"]], scene["atlas"])
        gbuf = kresolve.resolve_gbuffer(tile_counts, vis, attrs, plan,
                                        tile_h=th, tile_w=tw, tiles_x=tiles_x)
        return {"x": gbuf[16]}

    def stage_shade_tiles(scene, view_proj, cam):
        s, world, wnormal, tile_counts, plan, vis = _common(scene, view_proj)
        faces = scene["faces"]
        attrs = kresolve.pack_resolve_attrs(
            s["setup"], world[faces], wnormal[faces], scene["uvs"][faces],
            scene["prim_tex"][scene["face_prim"]], scene["atlas"])
        gbuf = kresolve.resolve_gbuffer(tile_counts, vis, attrs, plan,
                                        tile_h=th, tile_w=tw, tiles_x=tiles_x)
        fb = shade.shade_gbuffer(gbuf, scene["atlas"]["texels"], cam,
                                 light_direction=cfg.light_direction,
                                 light_color=cfg.light_color,
                                 ambient_amount=cfg.ambient_amount,
                                 specular_power=cfg.specular_power,
                                 clear_color=cfg.clear_color,
                                 max_anisotropy=cfg.max_anisotropy)
        return {"x": fb}

    results = {}
    prev = 0.0
    for name, fn in [
        ("geometry+setup", jax.jit(stage_geom)),
        ("+binning", jax.jit(stage_bin)),
        ("+raster", jax.jit(stage_raster)),
        ("+resolve", jax.jit(stage_resolve)),
        ("+shade_tiles", jax.jit(stage_shade_tiles)),
        ("full(shade+present)", full),
    ]:
        ms = time_fn(fn, uniforms, r.scene, frames=args.frames)
        results[name] = {"cum_ms": round(ms, 2), "delta_ms": round(ms - prev, 2)}
        prev = ms
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
