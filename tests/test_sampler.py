"""Windowed texture sampler (kernels/sampler.py + device/pages.py).

The windowed engine replaces per-pixel HBM gathers with per-tile VMEM
texel windows + MXU one-hot selection. Its contract versus the gather
engine:
  * trilinear (max_anisotropy=1): same formulas, same lerp order — any
    difference is bf16 page rounding, budget <= 1 u8 LSB/channel
    (BASELINE.md budget);
  * anisotropic: a per-tile dynamic probe count (ceil of the tile's
    worst anisotropy ratio) versus the gather path's fixed
    max_anisotropy probes — a different (valid) quadrature of the same
    footprint, so the gate is a small LSB budget, not equality.

Page layout invariants (device/pages.py) are unit-tested directly:
wrapped ghost borders, alignment of rect origins to the window DMA
grid, and mip-chain clamping.
"""

import numpy as np
import pytest

from tpurast.camera import Camera
from tpurast.config import RendererConfig
from tpurast.device import pages as pages_mod
from tpurast.device.scene import load_demo_scene
from tpurast.kernels import sampler as ksampler
from tpurast.renderer import Renderer


@pytest.fixture(scope="module")
def demo_scene(data_dir):
    return load_demo_scene(str(data_dir))


def _render_pair(scene, cam, **cfg_kw):
    frames = {}
    for samp in ("window", "gather"):
        r = Renderer(scene, RendererConfig(sampler=samp, **cfg_kw))
        res = r.render(cam)
        frames[samp] = (
            np.asarray(res["color"]).astype(np.int32),
            int(res["window_miss_px"]),
        )
    return frames


def test_windowed_matches_gather_trilinear(demo_scene):
    cam = Camera.from_target(
        np.array([1.2 * np.sin(0.4), 0.75, -1.2 * np.cos(0.4)], np.float32),
        [0.0, 0.95, 0.0],
    )
    frames = _render_pair(
        demo_scene, cam, width=256, height=128, segment_headroom=256
    )
    win, miss = frames["window"]
    gat, _ = frames["gather"]
    assert np.abs(win - gat).max() <= 1, "windowed trilinear outside 1-LSB budget"
    # The check must not be vacuous: some tiles must actually take the
    # windowed path (residual tiles reproduce the gather bit-exactly).
    assert miss < 256 * 128, "every pixel fell back to the gather path"


def test_windowed_matches_gather_anisotropic(demo_scene):
    cam = Camera.from_target([0.0, 1.3, -1.5], [0.0, 1.6, 1.0])  # grazing floor
    frames = _render_pair(
        demo_scene,
        cam,
        width=128,
        height=96,
        segment_headroom=192,
        max_anisotropy=4,
    )
    win, miss = frames["window"]
    gat, _ = frames["gather"]
    assert np.abs(win - gat).max() <= 2, "windowed aniso outside budget"
    assert miss < 128 * 96


def _toy_pages():
    rng = np.random.default_rng(7)
    mips = [
        rng.uniform(0, 1, (8, 16, 4)).astype(np.float32),
        rng.uniform(0, 1, (4, 8, 4)).astype(np.float32),
        rng.uniform(0, 1, (2, 4, 4)).astype(np.float32),
    ]
    small = [rng.uniform(0, 1, (4, 4, 4)).astype(np.float32)]
    return [mips, small], pages_mod.build_pages([mips, small])


def test_pages_ghost_border_wraps():
    textures, pages = _toy_pages()
    for ti, mips in enumerate(textures):
        for mi, m in enumerate(mips):
            oy, ox = pages.origins[ti, mi]
            w, h = pages.sizes[ti, mi]
            assert (h, w) == m.shape[:2]
            rect = np.moveaxis(pages.planes[:, oy : oy + h + 2, ox : ox + w + 2], 0, -1)
            np.testing.assert_array_equal(rect[1:-1, 1:-1], m)
            # Repeat-wrap ghost border: row -1 is the last texel row etc.
            np.testing.assert_array_equal(rect[0, 1:-1], m[-1])
            np.testing.assert_array_equal(rect[-1, 1:-1], m[0])
            np.testing.assert_array_equal(rect[1:-1, 0], m[:, -1])
            np.testing.assert_array_equal(rect[1:-1, -1], m[:, 0])


def test_pages_tail_packed_and_clamped():
    textures, pages = _toy_pages()
    # Small "tail" mips pack densely into a TAIL_W-wide strip at the
    # page top (window origins align themselves; rect origins need no
    # DMA-grid alignment), so one sampler window can cover many of them.
    for ti, mips in enumerate(textures):
        for mi, m in enumerate(mips):
            h, w = m.shape[:2]
            if h + 2 <= pages_mod.TAIL_H and w + 2 <= pages_mod.TAIL_W:
                oy, ox = pages.origins[ti, mi]
                assert ox + w + 2 <= pages_mod.TAIL_W
    # Beyond the chain, origins/sizes clamp to the last real mip.
    assert pages.n_mips[0] == 3
    np.testing.assert_array_equal(pages.origins[0, 3], pages.origins[0, 2])
    np.testing.assert_array_equal(pages.sizes[0, 3], pages.sizes[0, 2])


def test_rects_do_not_overlap():
    textures, pages = _toy_pages()
    mask = np.zeros(pages.planes.shape[1:], dtype=bool)
    for ti, mips in enumerate(textures):
        for mi, m in enumerate(mips):
            oy, ox = pages.origins[ti, mi]
            h, w = m.shape[:2]
            region = mask[oy : oy + h + 2, ox : ox + w + 2]
            assert not region.any(), f"rect ({ti},{mi}) overlaps a prior rect"
            region[:] = True
