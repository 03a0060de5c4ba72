"""Analyze the windowed sampler's tile plan + stage timings on a scene.

Prints per-class tile counts, residual pixel share, and device timings
for the full frame under each sampling engine, so regressions in the
window-fit rate are visible as numbers, not as a mysterious frame-time
jump.

Usage: python tools/sampler_plan_stats.py [--scene demo|porsche_class]
       [--width 1920] [--height 1080] [--aniso 1] [--angle 0.4]
"""

from __future__ import annotations

import argparse
import collections
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="demo")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--aniso", type=int, default=1)
    ap.add_argument("--angle", type=float, default=0.4)
    args = ap.parse_args()

    import jax
    import numpy as np

    from tpurast.camera import Camera
    from tpurast.config import RendererConfig
    from tpurast.device.scene import load_demo_scene, load_porsche_class_scene
    from tpurast.kernels import sampler as ksampler
    from tpurast.renderer import Renderer

    from tools._scene_cache import load_scene_cached

    data = os.environ.get("TPURAST_DATA", "/root/reference/data")
    scene = load_scene_cached(
        args.scene,
        load_demo_scene if args.scene == "demo" else load_porsche_class_scene,
        data,
    )
    a = args.angle
    cam = Camera.from_target(
        np.array([1.2 * np.sin(a), 0.75, -1.2 * np.cos(a)], np.float32),
        [0.0, 0.95, 0.0],
    )

    def sync(out):
        # The axon tunnel's block_until_ready does not block; a tiny
        # fetch forces completion without measuring tunnel bandwidth
        # (same convention as tpurast/cli.py).
        np.asarray(out["color"][0, 0, 0])

    def timed(r, cam, n=16):
        vp, cp = r.frame_uniforms(cam)
        out = r.render_with_uniforms(vp, cp)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = r.render_with_uniforms(vp, cp)
        sync(out)
        return (time.perf_counter() - t0) / n * 1e3, out

    renderers = {}
    for samp in ("window", "gather"):
        cfg = RendererConfig(
            width=args.width,
            height=args.height,
            max_anisotropy=args.aniso,
            sampler=samp,
        )
        r = renderers[samp] = Renderer(scene, cfg)
        ms, out = timed(r, cam)
        miss = int(out["window_miss_px"])
        print(f"{samp}: {ms:.2f} ms/frame  miss_px={miss}")

    r = renderers["window"]
    gbuf = r.debug_gbuf(cam)
    plan = ksampler.plan_tiles(
        gbuf,
        r.scene["atlas"]["page_origins"],
        r.scene["atlas"]["page_sizes"],
        tiles_x=r.tiles_x,
        tiles_y=r.tiles_y,
        tile_h=r.config.tile_h,
        tile_w=r.config.tile_w,
        max_anisotropy=args.aniso,
    )
    cls = np.asarray(plan["cls"])
    names = {0: "A(wide)", 1: "B(tall)", 2: "empty", 3: "RESIDUAL"}
    counts = collections.Counter(cls.tolist())
    for k in sorted(names):
        print(f"class {names[k]}: {counts.get(k, 0)} / {cls.size}")
    print("residual_px:", int(plan["residual_px"]))
    print("nprobe histogram:", dict(collections.Counter(np.asarray(plan["nprobe"]).tolist())))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
