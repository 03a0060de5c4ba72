#!/usr/bin/env python3
"""Classify per-pixel anisotropic footprints from a rendered G-buffer.

For the separable-footprint sampler design: a pixel whose footprint
line has cross-axis texel extent <= tau can be filtered with an
axis-aligned trapezoid (unit-spaced tent train) in ONE MXU contraction
instead of a probe loop. This tool reports, per scene/camera, how many
matched pixels are isotropic / x-separable / y-separable / diagonal,
and the probe-count distribution of the diagonal remainder — the data
that decides whether the separable path pays.

Usage: python tools/aniso_mode_stats.py --scene demo --width 1920 --height 1080
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="demo")
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--max-anisotropy", type=int, default=16)
    p.add_argument("--tau", type=float, default=1.0)
    args = p.parse_args()

    import jax.numpy as jnp

    from tpurast.camera import Camera
    from tpurast.config import RendererConfig
    from tpurast.device.scene_cache import load_named_scene
    from tpurast.kernels import shade
    from tpurast.renderer import Renderer
    from tpurast import math3d

    scene = load_named_scene(args.scene, "/root/reference/data")
    cfg = RendererConfig(
        width=args.width, height=args.height,
        max_anisotropy=args.max_anisotropy,
    )
    r = Renderer(scene, cfg)
    fwd = math3d.WORLD_SPACE.forward.vector()
    cam = Camera.from_target(fwd * -2.5, fwd)
    g = np.asarray(r.debug_gbuf(cam), np.float32)

    matched = g[16] > 0.0
    span = g[17]
    n_px = np.asarray(
        shade.probe_count(
            jnp.asarray(span),
            jnp.asarray(g[14]),
            jnp.asarray(g[15]),
            jnp.asarray(g[9]),
            jnp.asarray(g[10]),
            args.max_anisotropy,
        ),
        np.float32,
    )
    stats = {"matched": int(matched.sum())}
    for lvl, (wi, hi) in {"own": (9, 10), "parent": (11, 12)}.items():
        ex = np.abs(g[14]) * span * g[wi]
        ey = np.abs(g[15]) * span * g[hi]
        iso = matched & (n_px <= 1)
        aniso = matched & (n_px > 1)
        xsep = aniso & (ey <= args.tau)
        ysep = aniso & (ex <= args.tau) & ~xsep
        diag = aniso & ~xsep & ~ysep
        stats[lvl] = {
            "iso": int(iso.sum()),
            "xsep": int(xsep.sum()),
            "ysep": int(ysep.sum()),
            "diag": int(diag.sum()),
            "diag_np_hist": np.bincount(
                n_px[diag].astype(np.int64), minlength=17
            )[1:].tolist(),
            "xsep_n_hist": np.bincount(
                np.ceil(np.clip(ex[xsep], 1, 16)).astype(np.int64),
                minlength=17,
            )[1:].tolist(),
        }
    import json

    print(json.dumps(stats, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
