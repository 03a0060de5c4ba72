"""Per-stage device timing for the production frame pipeline.

The reference's only profiling mechanism is the per-frame wall-clock
overlay (src/Engine.zig:190-195, src/Renderer.zig:1182-1207); a tiled
software rasterizer needs more: stage_sweep() times jit-compiled
PREFIXES of render_frame via its `stage=` parameter, so the deltas
between successive prefixes are per-stage device costs on the exact
production path (including whatever XLA overlaps across stage
boundaries). Used by `tpurast-bench --stages` (stage_ms in the bench
JSON) and tools/profile_stages.py.
"""

from __future__ import annotations

import functools
import time

import numpy as np

#: Prefix order; None = the full frame (shade + sRGB encode).
STAGES = [
    "geometry",
    "binning",
    "segments",
    "raster",
    "resolve",
    "plan",
    "sample",
    None,
]


def time_grouped(fn, scene, uniforms, warmup=4, frames=32, group=16):
    """p50 per-frame ms of fn(scene, *u), synced once per `group` frames
    with a tiny fetch (the axon tunnel's block_until_ready does not
    block; a full-frame fetch would measure tunnel bandwidth)."""
    out = None
    for u in uniforms[:warmup]:
        out = fn(scene, *u)
    np.asarray(next(iter(out.values())).ravel()[0])
    times = []
    for g in range(0, frames, group):
        batch = uniforms[warmup + g : warmup + g + group]
        if not batch:
            break
        t0 = time.perf_counter()
        for u in batch:
            out = fn(scene, *u)
        np.asarray(next(iter(out.values())).ravel()[0])
        times.append((time.perf_counter() - t0) / len(batch))
    return float(np.percentile(np.asarray(times) * 1e3, 50))


def stage_sweep(renderer, uniforms, frames=32, group=16):
    """p50 device ms for each pipeline prefix of `renderer`'s config.

    Returns (cum, delta): cumulative ms per prefix and per-stage deltas
    keyed by stage name ("frame" = the full pipeline). Stages that don't
    exist under the renderer's config (plan/sample on the gather path)
    are skipped.
    """
    import jax

    from tpurast.renderer import render_frame

    stages = [
        s
        for s in STAGES
        if renderer.sampler == "window" or s not in ("plan", "sample")
    ]
    cum = {}
    delta = {}
    prev = 0.0
    for s in stages:
        fn = jax.jit(
            functools.partial(render_frame, **renderer._frame_kwargs, stage=s)
        )
        ms = time_grouped(
            fn, renderer.scene, uniforms, frames=frames, group=group
        )
        name = s or "frame"
        cum[name] = round(ms, 3)
        delta[name] = round(ms - prev, 3)
        prev = ms
    return cum, delta
