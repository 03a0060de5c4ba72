"""A/B check: windowed sampler (kernels/sampler.py) vs gather path.

Renders the demo scene at a configurable resolution with both sampling
engines and reports max |diff| per channel plus the windowed path's
residual-pixel count. Budget: <=1 u8 LSB (bf16 pages vs f16/f32 atlas
rows round differently).

Usage: python tools/check_sampler.py [--width 256] [--height 128]
       [--scene demo|porsche_class] [--aniso N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--scene", default="demo")
    ap.add_argument("--aniso", type=int, default=1)
    ap.add_argument("--frames", type=int, default=4)
    args = ap.parse_args()

    import numpy as np

    from tpurast.camera import Camera
    from tpurast.config import RendererConfig
    from tpurast.device.scene import load_demo_scene, load_porsche_class_scene
    from tpurast.renderer import Renderer

    data = os.environ.get("TPURAST_DATA", "/root/reference/data")
    if args.scene == "demo":
        scene = load_demo_scene(data)
    else:
        scene = load_porsche_class_scene(data)

    cams = [
        Camera.from_target(
            np.array(
                [1.4 * np.sin(a), 0.8 + 0.1 * np.sin(2 * a), -1.4 * np.cos(a)],
                np.float32,
            ),
            [0.0, 0.9, 0.0],
        )
        for a in np.linspace(0.2, 1.1, args.frames)
    ]

    worst = 0
    for which in range(args.frames):
        out = {}
        for samp in ("window", "gather"):
            cfg = RendererConfig(
                width=args.width,
                height=args.height,
                sampler=samp,
                max_anisotropy=args.aniso,
                segment_headroom=256,
            )
            r = Renderer(scene, cfg)
            t0 = time.perf_counter()
            res = r.render(cams[which])
            frame = np.asarray(res["color"])
            dt = time.perf_counter() - t0
            miss = int(res["window_miss_px"])
            out[samp] = (frame, miss, dt)
        dmax = int(
            np.abs(
                out["window"][0].astype(np.int32) - out["gather"][0].astype(np.int32)
            ).max()
        )
        worst = max(worst, dmax)
        print(
            f"frame {which}: max_lsb={dmax} window_miss_px={out['window'][1]}"
            f" (window {out['window'][2]*1e3:.0f} ms, gather {out['gather'][2]*1e3:.0f} ms)"
        )
    print(f"WORST max_lsb={worst} budget=1 -> {'OK' if worst <= 1 else 'FAIL'}")
    return 0 if worst <= 1 else 1


if __name__ == "__main__":
    raise SystemExit(main())
