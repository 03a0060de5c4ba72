#!/usr/bin/env python3
"""Windowed-sampler stage timing: prefix (geom..resolve) | plan | sample | full.

Uses the renderer's own pipeline (output="gbuf" for the prefix, the real
_frame_fn for full) so numbers match production; plan and sample are
timed standalone against a captured G-buffer. Honors --max-anisotropy.

Usage: python tools/profile_sampler.py --scene demo --max-anisotropy 16
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_calls(run, sync, n=32, group=16, warmup=4):
    """run(i) -> device output; one sync per group (axon RTT is large)."""
    out = None
    for i in range(warmup):
        out = run(i)
    sync(out)
    times = []
    for g in range(0, n, group):
        t0 = time.perf_counter()
        for i in range(group):
            out = run(warmup + g + i)
        sync(out)
        times.append((time.perf_counter() - t0) / group)
    return float(np.percentile(np.asarray(times) * 1e3, 50))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--scene", default="demo")
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--max-anisotropy", type=int, default=None)
    ap.add_argument("--data-dir", default="/root/reference/data")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpurast.camera import Camera
    from tpurast.config import RendererConfig
    from tpurast.device.scene_cache import load_named_scene
    from tpurast.kernels import sampler as ksampler
    from tpurast.renderer import Renderer

    scene_host = load_named_scene(args.scene, args.data_dir)
    overrides = {"sampler": "window"}
    if args.max_anisotropy is not None:
        overrides["max_anisotropy"] = args.max_anisotropy
    cfg = RendererConfig(width=args.width, height=args.height, **overrides)
    r = Renderer(scene_host, cfg)
    rg = Renderer(scene_host, cfg, output="gbuf")
    print(json.dumps({"sampler_resolved": r.sampler,
                      "max_anisotropy": cfg.max_anisotropy}))

    cams = []
    for i in range(64):
        ang = 0.4 + 0.01 * i
        pos = np.array([1.2 * np.sin(ang), 0.75, -1.2 * np.cos(ang)], np.float32)
        cams.append(Camera.from_target(pos, [0.0, 0.95, 0.0]))
    uniforms = [r.frame_uniforms(c) for c in cams]

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    out = {}

    def run_prefix(i):
        return rg.render_with_uniforms(*uniforms[i % 32])

    out["prefix(geom..resolve)"] = round(
        time_calls(run_prefix, sync, args.frames), 2)
    print(json.dumps(out), flush=True)

    gbuf = rg.render_with_uniforms(*uniforms[8])["gbuf"]
    gbuf = jax.device_put(gbuf)
    scene = r.scene

    plan_fn = jax.jit(lambda g: ksampler.plan_tiles(
        g, scene["atlas"]["page_origins"], scene["atlas"]["page_sizes"],
        tiles_x=r.tiles_x, tiles_y=r.tiles_y,
        tile_h=cfg.tile_h, tile_w=cfg.tile_w,
        max_anisotropy=cfg.max_anisotropy))
    plan = jax.block_until_ready(plan_fn(gbuf))

    def run_plan(i):
        return plan_fn(gbuf)

    out["plan"] = round(time_calls(run_plan, sync, args.frames), 2)
    print(json.dumps({"plan": out["plan"]}), flush=True)

    cam = jnp.asarray(uniforms[8][1])
    # page rides as an ARGUMENT: capturing it would inline a multi-GB
    # constant into the program (the axon remote compiler rejects it).
    sample_fn = jax.jit(lambda g, p, page: ksampler.sample_tiles(
        g, page, p, cam,
        tiles_x=r.tiles_x, tiles_y=r.tiles_y,
        tile_h=cfg.tile_h, tile_w=cfg.tile_w,
        max_anisotropy=cfg.max_anisotropy,
        light_direction=cfg.light_direction,
        light_color=cfg.light_color,
        ambient_amount=cfg.ambient_amount,
        specular_power=cfg.specular_power,
        clear_color=cfg.clear_color,
        blend=cfg.blend))

    def run_sample(i):
        return sample_fn(gbuf, plan, scene["atlas"]["page"])

    out["sample"] = round(time_calls(run_sample, sync, args.frames), 2)
    print(json.dumps({"sample": out["sample"]}), flush=True)

    # plan diagnostics: slot/probe distribution
    n_used = np.asarray(plan["n_used"])
    cls = np.asarray(plan["cls"])
    npb = np.asarray(plan["nprobe"])
    win = cls == ksampler.CLS_WINDOWED
    out["tiles"] = {
        "windowed": int(win.sum()),
        "residual": int((cls == ksampler.CLS_RESIDUAL).sum()),
        "empty": int((cls == ksampler.CLS_EMPTY).sum()),
        "n_used_mean": round(float(n_used[win].mean()), 2) if win.any() else 0,
        "n_used_p95": int(np.percentile(n_used[win], 95)) if win.any() else 0,
        "nprobe_mean": round(float(npb[win].mean()), 2) if win.any() else 0,
        "nprobe_p95": int(np.percentile(npb[win], 95)) if win.any() else 0,
        "second_wave_tiles": int((n_used[win] > ksampler.K).sum()) if win.any() else 0,
    }

    def run_full(i):
        return r.render_with_uniforms(*uniforms[i % 32])

    out["full"] = round(time_calls(run_full, sync, args.frames), 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
