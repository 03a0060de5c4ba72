"""tpurast-bench CLI: the benchmark entry point (see repo bench.py).

Prints ONE JSON line with fps/p50/Mtris plus the honest present-loop
(host-visible) frame rate and the dropped-pair counter. `--stages` adds
a per-stage device-time decomposition (stage_ms) to the line; `--all`
runs every BASELINE benchmark config and prints one line each (see
BASELINE.md):

  #1/#5 demo @1080p (+ flythrough present loop, part of every run)
  #2     porsche_class @1080p (12x 2048^2 BC7 multi-material stand-in)
  #3     hdr @1080p (BC6H + BC4u trilinear)
  #4     dragons64 @4K (64x instanced tiled binning)
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

import numpy as np

#: BASELINE benchmark configs for --all: (extra argv, config label).
ALL_CONFIGS = [
    (["--scene", "demo", "--width", "1920", "--height", "1080"], "demo_1080p"),
    (
        ["--scene", "porsche_class", "--width", "1920", "--height", "1080"],
        "porsche_class_1080p",
    ),
    (["--scene", "hdr", "--width", "1920", "--height", "1080"], "hdr_1080p"),
    (
        ["--scene", "dragons64", "--width", "3840", "--height", "2160"],
        "dragons64_4k",
    ),
]


def _build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--warmup", type=int, default=8)
    ap.add_argument("--data-dir", default="/root/reference/data")
    ap.add_argument("--texture-dtype", default=None)
    ap.add_argument("--tile-h", type=int, default=None)
    ap.add_argument("--tile-w", type=int, default=None)
    # Runtime toggles, the analog of the reference's ImGui settings
    # (VSync checkbox src/Renderer.zig:970-973) plus every pipeline mode.
    ap.add_argument("--max-anisotropy", type=int, default=None)
    ap.add_argument(
        "--vsync", action="store_true",
        help="cap the present loop at 60 Hz (Engine.vsync analog)"
    )
    ap.add_argument("--shading", default=None, choices=["forward", "deferred"])
    ap.add_argument("--binning", default=None, choices=["auto", "pairs", "scan"])
    ap.add_argument("--sampler", default=None, choices=["auto", "window", "gather"])
    ap.add_argument(
        "--scene",
        default="demo",
        choices=["demo", "dragons64", "hdr", "porsche_class"],
        help="demo = reference Engine.init scene; dragons64 = BASELINE config #4",
    )
    ap.add_argument("--save", default=None, help="save last frame PNG here")
    ap.add_argument(
        "--skip-parity-gate", action="store_true",
        help="skip the compiled-vs-interpret TPU parity check",
    )
    ap.add_argument(
        "--stages", action="store_true",
        help="add per-stage device timing (stage_ms) to the JSON line",
    )
    ap.add_argument(
        "--all", action="store_true",
        help="run every BASELINE benchmark config (one JSON line each)",
    )
    return ap


def _run_all(argv_rest: list[str]) -> int:
    """Run each BASELINE config in its own subprocess (fresh device
    memory per scene — the 4K instanced and porsche-class scenes
    each want the whole chip) and forward the JSON lines."""
    rc_all = 0
    for extra, label in ALL_CONFIGS:
        cmd = [sys.executable, "-m", "tpurast.cli", *extra, *argv_rest]
        print(f"# config {label}: {' '.join(cmd[2:])}", file=sys.stderr)
        rc = subprocess.call(cmd)
        rc_all = rc_all or rc
    return rc_all


def main() -> int:
    ap = _build_parser()
    args = ap.parse_args()
    if args.all:
        rest = [a for a in sys.argv[1:] if a != "--all"]
        drop_next = False
        filtered = []
        for a in rest:
            if drop_next:
                drop_next = False
                continue
            if a in ("--scene", "--width", "--height"):
                drop_next = True
                continue
            if a.startswith(("--scene=", "--width=", "--height=")):
                continue
            filtered.append(a)
        return _run_all(filtered)

    import jax

    from tpurast.camera import Camera
    from tpurast.config import RendererConfig
    from tpurast.device.scene_cache import load_named_scene
    from tpurast.present import Presenter
    from tpurast.renderer import Renderer

    scene = load_named_scene(args.scene, args.data_dir)
    overrides = {}
    if args.texture_dtype:
        overrides["texture_dtype"] = args.texture_dtype
    if args.tile_h:
        overrides["tile_h"] = args.tile_h
    if args.tile_w:
        overrides["tile_w"] = args.tile_w
    if args.max_anisotropy is not None:
        overrides["max_anisotropy"] = args.max_anisotropy
    if args.shading:
        overrides["shading"] = args.shading
    if args.binning:
        overrides["binning"] = args.binning
    if args.sampler:
        overrides["sampler"] = args.sampler
    cfg = RendererConfig(width=args.width, height=args.height, **overrides)
    renderer = Renderer(scene, cfg)

    # TPU correctness gate (validation-layer analog, src/Renderer.zig:
    # 1229-1247): render one small frame with the compiled Pallas kernels
    # and once more with the kernels in interpret mode (plain XLA ops on
    # the SAME device); any >1-LSB pixel means a Pallas-only semantics
    # bug (CPU CI provably masks these — round 2's stale-VMEM revisit
    # bug was this class). The bench REFUSES to print a perf number on
    # failure.
    parity_max_lsb = None
    if jax.default_backend() == "tpu" and not args.skip_parity_gate:
        from tpurast.kernels import force_interpret
        from tpurast.present import interleave

        gate_cam = Camera.from_target(
            np.array([1.2 * np.sin(0.4), 0.75, -1.2 * np.cos(0.4)], np.float32),
            [0.0, 0.95, 0.0],
        )
        gate_cfg = RendererConfig(width=256, height=128, **overrides)
        ra = Renderer(scene, gate_cfg)
        fa = ra.render_to_host(gate_cam).astype(np.int32)
        with force_interpret():
            rb = Renderer(scene, gate_cfg)
            fb = rb.render_to_host(gate_cam).astype(np.int32)
        parity_max_lsb = int(np.abs(fa - fb).max())
        if parity_max_lsb > 1:
            bad = int((np.abs(fa - fb) > 1).sum())
            print(
                json.dumps(
                    {
                        "metric": "parity_gate_failed",
                        "value": parity_max_lsb,
                        "unit": "max_lsb_diff",
                        "bad_channels": bad,
                        "note": "compiled vs interpret-mode render diverged"
                        " on TPU; perf numbers withheld",
                    }
                )
            )
            return 1

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
        sync(renderer.render_with_uniforms(*u))

    # Device frame time, measured in windows of `group` frames bracketed
    # by one sync each (amortizes the ~30 ms tunnel roundtrip to ~2 ms
    # per frame at 16; the reference's 1.33 ms overlay number is likewise
    # pure device-side frame time).
    group = 16
    t0 = time.perf_counter()
    times = []
    dropped_total = 0
    window_miss_total = 0
    frame = None
    it = iter(uniforms[args.warmup :])
    batch = list(it)
    for g in range(0, len(batch), group):
        prev = time.perf_counter()
        for u in batch[g : g + group]:
            frame = renderer.render_with_uniforms(*u)
        sync(frame)
        now = time.perf_counter()
        times.extend([(now - prev) / len(batch[g : g + group])] * len(batch[g : g + group]))
        # Honest-overflow accounting: an undersized bin capacity would
        # silently drop triangles AND flatter the benchmark — fetch the
        # counter per group (frame already synced; this is a scalar).
        dropped_total += int(np.asarray(frame["bin_overflow"]))
        # Same honesty for the windowed sampler: pixels that fell off
        # the planned-window path onto the per-pixel gather fallback.
        window_miss_total += int(np.asarray(frame["window_miss_px"]))
    wall = time.perf_counter() - t0

    # Config #5 (60 Hz flythrough with device->host readback), measured
    # HONESTLY: the timed loop includes the double-buffered full-frame
    # readback, so present_fps is the host-visible frame rate.
    presenter = Presenter()
    last_host = None
    n_present = min(len(batch), 48)
    tp0 = time.perf_counter()
    for u in batch[:n_present]:
        t_frame = time.perf_counter()
        img = presenter.present(renderer.render_with_uniforms(*u)["color"])
        if args.vsync:  # Engine.vsync analog: 60 Hz frame cap
            time.sleep(max(0.0, 1.0 / 60.0 - (time.perf_counter() - t_frame)))
        if img is not None:
            last_host = img
    tail = presenter.flush()
    present_wall = time.perf_counter() - tp0
    present_ms = present_wall / max(n_present, 1) * 1e3
    if tail is not None:
        last_host = tail

    stage_ms = None
    if args.stages:
        from tpurast.profiling import stage_sweep

        _, stage_ms = stage_sweep(renderer, uniforms, frames=32, group=16)

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
        "dropped_pairs": dropped_total,
        "window_miss_px": window_miss_total,
        "parity_max_lsb": parity_max_lsb,
        "stage_ms": stage_ms,
        "present_ms_per_frame": round(present_ms, 4),
        "present_fps": round(1000.0 / present_ms, 2) if present_ms > 0 else None,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "note": (
            "baseline=1.3323ms @~720p (reference overlay); porsche stripped "
            "from mount on both sides. present_fps includes the full-frame "
            "device->host readback: through this environment's remote-TPU "
            "tunnel that link runs at ~14 MB/s (hundreds of ms/frame), vs "
            "~GB/s PCIe on a directly-attached chip where the same "
            "double-buffered readback overlaps compute (<3 ms)."
        ),
    }
    print(json.dumps(result))
    return 0




if __name__ == "__main__":
    import sys

    sys.exit(main())
