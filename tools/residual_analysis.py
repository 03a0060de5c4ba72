"""Why do tiles miss the windowed sampler? Per-tile footprint analysis.

Renders one G-buffer frame, computes per-face UV charts on the host
(device/charts.py), and reports — per framebuffer tile — how many
distinct (chart, mip) sampling jobs the tile needs and how big each
job's texel bounding box is. This is the data that sizes the windowed
sampler's slot count and window shapes (kernels/sampler.py): if the
per-(chart, mip) distribution is tight where the per-(texture, mip)
one explodes (fragmented UV atlases), chart-keyed planning wins.

Usage: python tools/residual_analysis.py [--scene porsche_class] ...
"""

from __future__ import annotations

import argparse
import collections
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="porsche_class")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--angle", type=float, default=0.4)
    args = ap.parse_args()

    from tpurast.camera import Camera
    from tpurast.config import RendererConfig
    from tpurast.device.charts import face_charts
    from tpurast.device.scene import (
        load_demo_scene,
        load_instanced_dragons,
        load_porsche_class_scene,
    )
    from tpurast.renderer import Renderer

    from tools._scene_cache import load_scene_cached

    data = os.environ.get("TPURAST_DATA", "/root/reference/data")
    loader = {
        "demo": load_demo_scene,
        "porsche_class": load_porsche_class_scene,
        "dragons64": load_instanced_dragons,
    }[args.scene]
    cache_dir = os.environ.get("TPURAST_SCENE_CACHE", "/root/repo/.scene_cache")
    gkey = os.path.join(
        cache_dir,
        f"gbuf_{args.scene}_{args.width}x{args.height}_{args.angle}.npz",
    )
    scene = load_scene_cached(args.scene, loader, data)
    if os.path.exists(gkey):
        d = np.load(gkey)
        gbuf, fid = d["gbuf"], d["fid"]
        print(f"loaded cached gbuf {gkey}")
    else:
        a = args.angle
        cam = Camera.from_target(
            np.array([1.2 * np.sin(a), 0.75, -1.2 * np.cos(a)], np.float32),
            [0.0, 0.95, 0.0],
        )
        r = Renderer(scene, RendererConfig(width=args.width, height=args.height))
        gbuf, fid = r.debug_gbuf(cam, with_fid=True)
        gbuf = np.asarray(gbuf)
        fid = np.asarray(fid)
        np.savez_compressed(gkey, gbuf=gbuf, fid=fid)

    charts = face_charts(scene.faces, scene.n_faces, scene.positions.shape[0])
    n_charts = int(charts.max()) + 1
    print(f"{args.scene}: {scene.n_faces} faces, {n_charts} charts")
    # Chart sizes (faces per chart)
    sizes = np.bincount(charts[: scene.n_faces])
    print(
        "chart sizes: p50=%d p90=%d max=%d" % tuple(
            int(np.percentile(sizes, p)) if p < 100 else int(sizes.max())
            for p in (50, 90, 100)
        )
    )

    th, tw = r.config.tile_h, r.config.tile_w
    tiles_y, tiles_x = r.tiles_y, r.tiles_x
    matched = gbuf[16] > 0
    u, v = gbuf[6], gbuf[7]
    tw0, th0 = gbuf[9], gbuf[10]
    tw1, th1 = gbuf[11], gbuf[12]
    l0 = gbuf[19].astype(np.int64)
    l1 = np.where((tw1 == tw0) & (th1 == th0), l0, l0 + 1)
    texid = gbuf[18].astype(np.int64)
    pix_chart = np.where(fid >= 0, charts[np.maximum(fid, 0)], -1).astype(np.int64)

    def bbox_need(uu, vv, ww, hh, m):
        """Wrapped bilinear anchor bbox (texels incl. +1 ghost) of the
        masked pixels; returns (x_need, y_need)."""
        if not m.any():
            return 0, 0
        x0 = np.mod(np.floor(uu[m] * ww[m] - 0.5), np.maximum(ww[m], 1.0))
        y0 = np.mod(np.floor(vv[m] * hh[m] - 0.5), np.maximum(hh[m], 1.0))
        return (
            int(x0.max() - x0.min()) + 2,
            int(y0.max() - y0.min()) + 2,
        )

    key_counts_tex = []
    key_counts_chart = []
    chart_needs = []  # (x_need, y_need, level, whole_w, whole_h)
    tex_needs = []
    residual_reason = collections.Counter()
    for ty in range(tiles_y):
        for tx in range(tiles_x):
            sl = np.s_[ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw]
            m = matched[sl]
            if not m.any():
                continue
            ch = pix_chart[sl]
            lv0, lv1 = l0[sl], l1[sl]
            txd = texid[sl]
            # own + parent jobs
            keys_c = set(zip(ch[m].tolist(), lv0[m].tolist())) | set(
                zip(ch[m].tolist(), lv1[m].tolist())
            )
            keys_t = set(zip(txd[m].tolist(), lv0[m].tolist())) | set(
                zip(txd[m].tolist(), lv1[m].tolist())
            )
            key_counts_chart.append(len(keys_c))
            key_counts_tex.append(len(keys_t))
            uu, vv = u[sl], v[sl]
            for ck, lk in keys_c:
                own = m & (ch == ck) & (lv0 == lk)
                par = m & (ch == ck) & (lv1 == lk)
                ww = np.where(own, tw0[sl], tw1[sl])
                hh = np.where(own, th0[sl], th1[sl])
                xn, yn = bbox_need(uu, vv, ww, hh, own | par)
                any_m = own | par
                whole_w = int(ww[any_m].max()) + 2
                whole_h = int(hh[any_m].max()) + 2
                chart_needs.append((xn, yn, lk, whole_w, whole_h))
            for tk, lk in keys_t:
                own = m & (txd == tk) & (lv0 == lk)
                par = m & (txd == tk) & (lv1 == lk)
                ww = np.where(own, tw0[sl], tw1[sl])
                hh = np.where(own, th0[sl], th1[sl])
                xn, yn = bbox_need(uu, vv, ww, hh, own | par)
                tex_needs.append((xn, yn, lk))

    def hist(xs, name):
        c = collections.Counter(xs)
        print(name, dict(sorted(c.items())))

    hist(key_counts_tex, "per-tile distinct (tex,mip) jobs:")
    hist(key_counts_chart, "per-tile distinct (chart,mip) jobs:")

    cn = np.array([(x, y) for x, y, *_ in chart_needs])
    tn = np.array([(x, y) for x, y, _ in tex_needs])
    whole = np.array([(w, h) for _, _, _, w, h in chart_needs])
    eff = np.minimum(cn, whole)  # whole-rect window is an alternative
    for nm, arr in (("(tex,mip) bbox", tn), ("(chart,mip) bbox", cn), ("chart min(bbox,rect)", eff)):
        q = lambda a, p: int(np.percentile(a, p))
        print(
            f"{nm} need: x p50={q(arr[:,0],50)} p90={q(arr[:,0],90)} p99={q(arr[:,0],99)} max={arr[:,0].max()}"
            f" | y p50={q(arr[:,1],50)} p90={q(arr[:,1],90)} p99={q(arr[:,1],99)} max={arr[:,1].max()}"
        )
    # How many tiles fit entirely with candidate shapes (chart-keyed,
    # N_SLOTS budget, alignment slack included)?
    for n_slots, wy, wx in ((6, 48, 384), (8, 48, 384), (8, 64, 384), (12, 64, 384)):
        fit_tiles = 0
        tot = 0
        i = 0
        for cnt in key_counts_chart:
            jobs = chart_needs[i : i + cnt]
            i += cnt
            tot += 1
            if cnt > n_slots:
                continue
            ok = all(
                (x + 127 <= wx and y + 15 <= wy) or (ww <= wx and hh <= wy)
                for x, y, _, ww, hh in jobs
            )
            fit_tiles += ok
        print(
            f"slots={n_slots} window=({wy},{wx}): {fit_tiles}/{tot} covered tiles fit"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
