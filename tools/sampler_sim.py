"""Simulate windowed-sampler plan v3 on a cached G-buffer dump.

Plan v3 (kernels/sampler.py): slots are (texture, mip, texel-rect)
windows placed by GREEDY BANDED COVERING — no chart identity in the
key. Each round seeds at the top-left-most uncovered anchor of the
lowest uncovered (tex, mip), opens a window band there, and absorbs
every pixel whose whole anchor range fits the window. Small mips whose
rect fits one window are covered whole. This absorbs any number of
atlas-local UV islands into one window and splits tall/rotated
footprints across bands naturally.

Reports, per candidate (WH, WW, K): tiles fitting, residual px, slot
histograms. Run tools/residual_analysis.py first to cache the gbuf.
"""

from __future__ import annotations

import argparse
import collections
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALIGN_Y = 8
ALIGN_X = 128


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="porsche_class")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--angle", type=float, default=0.4)
    ap.add_argument("--tile-h", type=int, default=32)
    ap.add_argument("--tile-w", type=int, default=128)
    args = ap.parse_args()

    cache_dir = os.environ.get("TPURAST_SCENE_CACHE", "/root/repo/.scene_cache")
    gkey = os.path.join(
        cache_dir,
        f"gbuf_{args.scene}_{args.width}x{args.height}_{args.angle}.npz",
    )
    d = np.load(gkey)
    gbuf = d["gbuf"]

    th, tw = args.tile_h, args.tile_w
    H, W = gbuf.shape[1], gbuf.shape[2]
    tiles_y, tiles_x = H // th, W // tw
    matched = gbuf[16] > 0
    u, v = gbuf[6], gbuf[7]
    tw0, th0 = gbuf[9], gbuf[10]
    tw1, th1 = gbuf[11], gbuf[12]
    l0 = gbuf[19].astype(np.int64)
    l1 = np.where((tw1 == tw0) & (th1 == th0), l0, l0 + 1)
    texid = gbuf[18].astype(np.int64)

    def anchors(uu, vv, ww, hh):
        x0 = np.mod(np.floor(uu * ww - 0.5), np.maximum(ww, 1.0))
        y0 = np.mod(np.floor(vv * hh - 0.5), np.maximum(hh, 1.0))
        return x0, y0

    x0o, y0o = anchors(u, v, tw0, th0)
    x0p, y0p = anchors(u, v, tw1, th1)
    key_o = texid * 32 + l0
    key_p = texid * 32 + l1

    for WH, WW, K in (
        (96, 384, 8),
        (96, 384, 12),
        (96, 256, 12),
        (64, 384, 12),
        (128, 512, 8),
    ):
        cov_y = WH - ALIGN_Y
        cov_x = WW - ALIGN_X
        small_o = (tw0 <= cov_x - 2) & (th0 <= cov_y - 2)
        small_p = (tw1 <= cov_x - 2) & (th1 <= cov_y - 2)

        slot_hist = []
        resid_tiles = 0
        resid_px = 0
        covered_tiles = 0
        for ty in range(tiles_y):
            for tx in range(tiles_x):
                sl = np.s_[ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw]
                m = matched[sl].ravel()
                if not m.any():
                    continue
                covered_tiles += 1
                keys = np.concatenate([key_o[sl].ravel()[m], key_p[sl].ravel()[m]])
                xs = np.concatenate([x0o[sl].ravel()[m], x0p[sl].ravel()[m]])
                ys = np.concatenate([y0o[sl].ravel()[m], y0p[sl].ravel()[m]])
                small = np.concatenate(
                    [small_o[sl].ravel()[m], small_p[sl].ravel()[m]]
                )
                todo = np.ones(keys.shape[0], bool)
                nslots = 0
                while todo.any() and nslots <= 40:
                    nslots += 1
                    k = keys[todo].min()
                    mk = todo & (keys == k)
                    if small[mk].any():
                        todo &= ~mk
                        continue
                    ymin = ys[mk].min()
                    band = mk & (ys < ymin + cov_y - 1)  # whole range fits
                    xmin = xs[band].min()
                    win = band & (xs < xmin + cov_x - 1)
                    todo &= ~win
                slot_hist.append(nslots)
                if nslots > K:
                    resid_tiles += 1
                    resid_px += int(m.sum())
        sh = np.array(slot_hist)
        hist = dict(sorted(collections.Counter(sh.tolist()).items()))
        tot_px = int(matched.sum())
        print(
            f"WH={WH} WW={WW} K={K}: fit {covered_tiles - resid_tiles}/{covered_tiles}"
            f" tiles, residual {resid_tiles} tiles / {resid_px}px"
            f" ({100*resid_px/tot_px:.2f}%), slots p50={int(np.percentile(sh,50))}"
            f" p90={int(np.percentile(sh,90))} max={sh.max()}, mean={sh.mean():.2f}"
        )
        print("  slots hist:", {k: v for k, v in hist.items() if k <= 24})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
