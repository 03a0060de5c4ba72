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


@pytest.mark.slow
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


def test_pages_wrap_ghost_border_big_mip():
    """Mips wider/taller than one window (kernels/sampler.py wrap limits)
    carry WRAP_GHOST wrapped texels per side on the big axes, so a
    seam-crossing footprint anchored at its wrapped lo texel can read
    its tail past the mip edge from contiguous ghost copies."""
    from tpurast.kernels.sampler import WRAP_GHOST, X_WRAP_LIM, Y_WRAP_LIM

    rng = np.random.default_rng(3)
    big = rng.uniform(0, 1, (128, 512, 4)).astype(np.float32)
    assert big.shape[1] > X_WRAP_LIM and big.shape[0] > Y_WRAP_LIM
    pages = pages_mod.build_pages([[big]])
    oy, ox = pages.origins[0, 0]  # convention: ghost texel (-1, -1)
    h, w = big.shape[:2]
    g = WRAP_GHOST
    # Interior matches; origin points one texel into the ghost border.
    rect = np.moveaxis(
        pages.planes[:, oy - g + 1 : oy + h + g + 1, ox - g + 1 : ox + w + g + 1],
        0,
        -1,
    )
    np.testing.assert_array_equal(rect[g : g + h, g : g + w], big)
    # Right/bottom ghost columns are wrapped copies of the left/top edge.
    np.testing.assert_array_equal(rect[g : g + h, g + w : g + w + g], big[:, :g])
    np.testing.assert_array_equal(rect[g : g + h, :g], big[:, -g:])
    np.testing.assert_array_equal(rect[g + h :, g : g + w], big[:g, :])
    np.testing.assert_array_equal(rect[:g, g : g + w], big[-g:, :])


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


def _checker_scene():
    """Synthetic checkered floor plane (generated BC4u, full mip chain)."""
    from tpurast.assets.gltf import GltfModel
    from tpurast.assets.ktx2_write import make_bc4_ktx2
    from tpurast.device.scene import _quad_draw, build_scene

    y, x = np.mgrid[0:256, 0:256]
    checker = ((((x // 16) + (y // 16)) % 2) * 195 + 30).astype(np.uint8)
    blob = make_bc4_ktx2(checker)
    floor = GltfModel(
        draws=[_quad_draw((0.0, 0.0), 16.0, 16.0, 0.0, 16.0, "mem://checker.ktx2")],
        image_uris=["mem://checker.ktx2"],
    )
    return build_scene([floor], memory_assets={"mem://checker.ktx2": blob})


@pytest.mark.slow
def test_aniso16_matches_supersampled_oracle():
    """Anisotropy-16 oracle (the reference sampler's default state,
    src/Renderer.zig:515): a checkered plane at a grazing angle, rendered
    with max_anisotropy=16, must sit much closer to a supersampled
    reference than the trilinear render does — on the pixels where
    trilinear actually over-blurs. Trilinear picks the LOD from the
    MAJOR footprint axis, blurring the minor axis by the anisotropy
    ratio; the probe loop recovers that detail.

    Oracle: 8x8 supersampling (trilinear at 8x resolution shrinks every
    footprint 8x per axis) box-filtered in linear space. The comparison
    runs over the DISCRIMINATION BAND — pixels where trilinear deviates
    from the oracle by > 0.02 — because a frame-wide mean dilutes the
    grazing band with background and near-field pixels both filters get
    right (measured on TPU: band ratio 0.42, frame-wide 0.85).
    """
    scene = _checker_scene()
    # Just above the floor (world up = -Y), looking along it.
    cam = Camera.from_target([0.0, -0.12, -6.0], [0.0, -0.02, 2.0])

    def render(w, h, n):
        r = Renderer(
            scene,
            RendererConfig(width=w, height=h, max_anisotropy=n,
                           segment_headroom=64),
            output="linear",
        )
        res = r.render(cam)
        return np.asarray(res["color"])[:3].astype(np.float64)

    side = 32
    tri = render(side, side, 1)
    aniso = render(side, side, 16)
    hi = render(8 * side, 8 * side, 1)
    oracle = hi.reshape(3, side, 8, side, 8).mean(axis=(2, 4))

    d_tri = np.abs(tri - oracle).mean(axis=0)  # (H, W)
    d_aniso = np.abs(aniso - oracle).mean(axis=0)
    band = d_tri > 0.02
    # The checker must actually alias under trilinear at this angle —
    # otherwise the comparison is vacuous (TPU measurement: 200 px).
    assert band.sum() >= 100, f"oracle scene not grazing enough ({band.sum()} band px)"
    err_tri = d_tri[band].mean()
    err_aniso = d_aniso[band].mean()
    assert err_aniso < 0.65 * err_tri, (
        f"aniso-16 gained too little over trilinear in the grazing band: "
        f"err_aniso={err_aniso:.4f} vs err_tri={err_tri:.4f}"
    )
