#!/usr/bin/env python3
"""Benchmark: demo scene at 1920x1080 on the default JAX platform (TPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
auxiliary fields. The baseline is the reference's only published number:
1.33230 ms frametime (~750.6 FPS) on the full demo scene at ~1282x720
(docs/media/2024-09-16_complex_textured_models.jpg overlay; BASELINE.md).
porche.glb is stripped from the reference mount, so both this bench and
any rerun of the reference on this mount render arena+dragon+crate; we
render at 1080p (the BASELINE.json target resolution), which is 2.2x the
baseline's pixel count — the comparison is conservative in our favor's
opposite direction.

Usage: python bench.py [--width W] [--height H] [--frames N] [--scene demo]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--warmup", type=int, default=8)
    ap.add_argument("--data-dir", default="/root/reference/data")
    ap.add_argument("--texture-dtype", default=None)
    ap.add_argument("--tile-h", type=int, default=None)
    ap.add_argument("--tile-w", type=int, default=None)
    ap.add_argument(
        "--scene",
        default="demo",
        choices=["demo", "dragons64", "hdr", "porsche_class"],
        help="demo = reference Engine.init scene; dragons64 = BASELINE config #4",
    )
    ap.add_argument("--save", default=None, help="save last frame PNG here")
    args = ap.parse_args()

    import jax

    from tpurast.camera import Camera
    from tpurast.config import RendererConfig
    from tpurast.device.scene import load_demo_scene
    from tpurast.present import Presenter
    from tpurast.renderer import Renderer

    if args.scene == "dragons64":
        from tpurast.device.scene import load_instanced_dragons

        scene = load_instanced_dragons(args.data_dir, 64)
    elif args.scene == "hdr":
        from tpurast.device.scene import load_hdr_scene

        scene = load_hdr_scene(args.data_dir)
    elif args.scene == "porsche_class":
        from tpurast.device.scene import load_porsche_class_scene

        scene = load_porsche_class_scene(args.data_dir)
    else:
        scene = load_demo_scene(args.data_dir)
    overrides = {}
    if args.texture_dtype:
        overrides["texture_dtype"] = args.texture_dtype
    if args.tile_h:
        overrides["tile_h"] = args.tile_h
    if args.tile_w:
        overrides["tile_w"] = args.tile_w
    cfg = RendererConfig(width=args.width, height=args.height, **overrides)
    renderer = Renderer(scene, cfg)

    # Flythrough cameras (precomputed uniforms so the loop measures only
    # render + readback): slow orbit near the crate/dragon like the
    # reference screenshots.
    cams = []
    for i in range(args.frames + args.warmup):
        ang = 0.4 + 0.01 * i
        pos = np.array([1.2 * np.sin(ang), 0.75, -1.2 * np.cos(ang)], dtype=np.float32)
        cams.append(Camera.from_target(pos, [0.0, 0.95, 0.0]))
    uniforms = [renderer.frame_uniforms(c) for c in cams]

    def sync(frame):
        # Force completion with a tiny fetch (the axon tunnel's
        # block_until_ready does not block; full-frame fetches measure
        # tunnel bandwidth, not the device — the reference's 1.33 ms
        # baseline is likewise device-side frame time with on-GPU present).
        np.asarray(frame["color"][0, 0, 0])

    # Warmup / compile.
    for u in uniforms[: args.warmup]:
        sync(renderer._frame_fn(renderer.scene, *u))

    # Device frame time, measured in windows of `group` frames bracketed
    # by one sync each (amortizes the ~30 ms tunnel roundtrip to ~2 ms
    # per frame at 16; the reference's 1.33 ms overlay number is likewise
    # pure device-side frame time).
    group = 16
    t0 = time.perf_counter()
    times = []
    frame = None
    it = iter(uniforms[args.warmup :])
    batch = list(it)
    for g in range(0, len(batch), group):
        prev = time.perf_counter()
        for u in batch[g : g + group]:
            frame = renderer._frame_fn(renderer.scene, *u)
        sync(frame)
        now = time.perf_counter()
        times.extend([(now - prev) / len(batch[g : g + group])] * len(batch[g : g + group]))
    wall = time.perf_counter() - t0

    # Exercise the double-buffered present path separately (full-frame
    # device->host readback overlap) so the contract stays covered.
    presenter = Presenter()
    last_host = None
    for u in uniforms[args.warmup : args.warmup + 3]:
        img = presenter.present(renderer._frame_fn(renderer.scene, *u)["color"])
        if img is not None:
            last_host = img
    tail = presenter.flush()
    if tail is not None:
        last_host = tail

    times_ms = np.asarray(times) * 1e3
    p50 = float(np.percentile(times_ms, 50))
    fps = 1000.0 / p50
    tris = scene.n_faces
    mtris_per_s = tris * fps / 1e6

    if args.save and last_host is not None:
        from PIL import Image

        Image.fromarray(last_host[..., :3]).save(args.save)

    baseline_fps = 1000.0 / 1.33230  # reference overlay frametime
    result = {
        "metric": f"fps_{args.width}x{args.height}_{args.scene}_scene",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / baseline_fps, 4),
        "p50_frame_ms": round(p50, 4),
        "mean_frame_ms": round(float(times_ms.mean()), 4),
        "mtris_per_sec": round(mtris_per_s, 2),
        "triangles": tris,
        "frames": args.frames,
        "wall_s": round(wall, 2),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "note": "baseline=1.3323ms @~720p (reference overlay); porsche stripped from mount on both sides",
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
