#!/usr/bin/env python3
"""Fast sampler-iteration probe: p50 cum ms of the plan and sample
prefixes only (see tpurast.profiling). Run with
JAX_COMPILATION_CACHE_DIR set to make unchanged-prefix reruns instant.

Usage: python tools/sample_stage_probe.py [--scene demo]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--scene", default="demo")
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--data-dir", default="/root/reference/data")
    ap.add_argument(
        "--stages", default="plan,sample",
        help="comma-separated stage names ('frame' = full)",
    )
    args = ap.parse_args()

    import jax

    from tpurast.camera import Camera
    from tpurast.config import RendererConfig
    from tpurast.device.scene_cache import load_named_scene
    from tpurast.profiling import time_grouped
    from tpurast.renderer import Renderer, render_frame

    scene = load_named_scene(args.scene, args.data_dir)
    cfg = RendererConfig(width=args.width, height=args.height)
    r = Renderer(scene, cfg)
    cams = []
    for i in range(64):
        ang = 0.4 + 0.01 * i
        pos = np.array(
            [1.2 * np.sin(ang), 0.75, -1.2 * np.cos(ang)], np.float32
        )
        cams.append(Camera.from_target(pos, [0.0, 0.95, 0.0]))
    uniforms = [r.frame_uniforms(c) for c in cams]
    out = {}
    for s in args.stages.split(","):
        fn = jax.jit(
            functools.partial(
                render_frame,
                **r._frame_kwargs,
                stage=None if s == "frame" else s,
            )
        )
        out[s] = round(
            time_grouped(fn, r.scene, uniforms, frames=args.frames), 3
        )
        print(json.dumps({s: out[s]}), flush=True)
    print(json.dumps({"cum_ms": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
