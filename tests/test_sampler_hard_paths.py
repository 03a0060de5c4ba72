"""Windowed-sampler hard paths (kernels/sampler.py + renderer.py).

The plan kernel classifies each tile WINDOWED / EMPTY / RESIDUAL and the
renderer overlays residual tiles with the gather engine (compact
pseudo-frame up to renderer.RT_CAP tiles, full-frame beyond). The demo
scene plans 1-3 windows per tile, so these paths never run in the other
tests; here synthetic many-texture scenes force each class:

  * second kernel wave — a tile referencing > K (16) windows runs slots
    [K, n) in a second VMEM residency wave (sampler._sampler_kernel);
  * compact residual fallback — a tile needing > K2 (32) windows is
    unwindowable: the covering leaves pixels todo, the tile goes
    CLS_RESIDUAL, and the compact gather overlay must reproduce the
    gather engine on it;
  * full-frame fallback — more than RT_CAP residual tiles falls back to
    one full-frame gather (forced here by shrinking renderer.RT_CAP and
    marking every tile residual, so the test doesn't need 65 genuinely
    unwindowable tiles).

Window-distinctness construction: each quad binds its OWN 256-px-wide
texture and samples a small patch at the texture center. 256-wide mip-0
rects carry WRAP_GHOST borders (device/pages.py), making them > 254 px
wide, so the shelf packer places ONE per shelf — any two mip-0 patches
are >= 304 page rows apart and no 96-row window can cover two. Window
count therefore grows one-per-quad (parent mip-1 windows add ~n/2).
"""

import numpy as np
import pytest

from tpurast import math3d
from tpurast.assets.gltf import GltfModel, PrimitiveDraw
from tpurast.assets.ktx2_write import make_bc4_ktx2
from tpurast.camera import Camera
from tpurast.config import RendererConfig
from tpurast.device.scene import build_scene
from tpurast.kernels import sampler as ksampler
from tpurast.renderer import Renderer

# Long CPU-interpret renders: excluded from the fast subset
# (`pytest -m 'not slow'`, see README testing section).
pytestmark = pytest.mark.slow


def _patch_quad(center_xz, size, uri, u0=0.45, du=0.04):
    """Floor quad showing the [u0, u0+du]^2 patch of its texture."""
    hx = size / 2.0
    cx, cz = center_xz
    positions = np.array(
        [
            [cx - hx, 0.0, cz - hx],
            [cx + hx, 0.0, cz - hx],
            [cx + hx, 0.0, cz + hx],
            [cx - hx, 0.0, cz + hx],
        ],
        np.float32,
    )
    n = np.array([0.0, -1.0, 0.0], np.float32)  # toward the camera (-Y up)
    uvs = np.array(
        [[u0, u0], [u0 + du, u0], [u0 + du, u0 + du], [u0, u0 + du]],
        np.float32,
    )
    return PrimitiveDraw(
        positions=positions,
        normals=np.broadcast_to(n, (4, 3)).copy(),
        uvs=uvs,
        indices=np.array([0, 1, 2, 0, 2, 3], np.uint32),
        model_matrix=math3d.mat4_identity(),
        normal_matrix=np.eye(3, dtype=np.float32),
        image_uri=uri,
        material_name="hardpath",
        node_name="patch",
    )


def _many_texture_scene(n: int, cols: int, rows: int):
    """n quads in a cols x rows grid on the y=0 floor, each with its own
    256^2 BC4 texture, sized for ~0.9 texel/px at the test camera."""
    rng = np.random.default_rng(11)
    assets, draws = {}, []
    # Camera at distance 1.0, vfov 80 deg: visible height 2*tan(40deg).
    vis_h = 2.0 * np.tan(np.radians(40.0))
    px_per_wu = 32.0 / vis_h
    vis_w = vis_h * 4.0  # the 128x32 target is 4:1
    cell_w, cell_h = vis_w / cols, vis_h / rows
    size = 0.82 * min(cell_w, cell_h)
    du = size * px_per_wu * 0.9 / 256.0  # ~0.9 texel/px -> lod clamps to 0
    for i in range(n):
        uri = f"mem://hard_{i}.ktx2"
        img = rng.integers(0, 256, (256, 256), dtype=np.uint8)
        assets[uri] = make_bc4_ktx2(img)
        cx = (i % cols - (cols - 1) / 2.0) * cell_w
        cz = (i // cols - (rows - 1) / 2.0) * cell_h
        draws.append(_patch_quad((cx, cz), size, uri, du=du))
    model = GltfModel(draws=draws, image_uris=list(assets))
    return build_scene([model], memory_assets=assets)


_CAM = Camera.from_target(
    np.array([0.0, -1.0, -0.05], np.float32), np.array([0.0, 0.0, 0.0], np.float32)
)


def _render_pair(scene, width, height, **cfg_kw):
    out = {}
    for samp in ("window", "gather"):
        r = Renderer(
            scene,
            RendererConfig(
                width=width,
                height=height,
                sampler=samp,
                segment_headroom=128,
                **cfg_kw,
            ),
        )
        res = r.render(_CAM)
        out[samp] = (
            np.asarray(res["color"]).astype(np.int32),
            int(res["window_miss_px"]),
        )
    return out


def _plan_for(scene, width, height):
    r = Renderer(
        scene,
        RendererConfig(
            width=width, height=height, sampler="window", segment_headroom=128
        ),
    )
    g = r.debug_gbuf(_CAM)
    plan = ksampler.plan_tiles(
        g,
        None,
        None,
        tiles_x=r.tiles_x,
        tiles_y=r.tiles_y,
        tile_h=r.config.tile_h,
        tile_w=r.config.tile_w,
        max_anisotropy=r.config.max_anisotropy,
    )
    return {k: np.asarray(v) for k, v in plan.items()}


def test_second_wave_tile():
    """18 one-per-shelf textures in one tile: > K windows, <= K2 — the
    tile must stay WINDOWED (second wave), match gather, and miss 0 px."""
    scene = _many_texture_scene(18, cols=9, rows=2)
    plan = _plan_for(scene, 128, 32)
    assert plan["cls"].shape == (1,)
    assert plan["cls"][0] == ksampler.CLS_WINDOWED, plan
    assert plan["n_used"][0] > ksampler.K, (
        f"expected a second-wave plan (> {ksampler.K} windows), "
        f"got n_used={plan['n_used'][0]}"
    )
    frames = _render_pair(scene, 128, 32)
    win, miss = frames["window"]
    gat, _ = frames["gather"]
    assert miss == 0
    assert np.abs(win - gat).max() <= 1


def test_residual_tile_compact_fallback():
    """40 one-per-shelf textures in one tile: > K2 windows — the covering
    must leave the tile RESIDUAL and the compact gather overlay must
    reproduce the gather engine (window_miss_px > 0 surfaces it)."""
    scene = _many_texture_scene(40, cols=10, rows=4)
    plan = _plan_for(scene, 128, 32)
    assert plan["cls"][0] == ksampler.CLS_RESIDUAL, plan["n_used"]
    frames = _render_pair(scene, 128, 32)
    win, miss = frames["window"]
    gat, _ = frames["gather"]
    assert miss > 0, "residual tile must surface window_miss_px"
    assert np.abs(win - gat).max() <= 1


def _grid_scene(n_textures: int, cols: int, rows: int,
                width: int, height: int):
    """cols x rows grid of floor quads covering the whole viewport,
    textures cycling by COLUMN mod n_textures — every 128-px tile sees
    (cols * 128 / width) distinct one-per-shelf textures, so sizing that
    above K2 makes every covered tile genuinely unwindowable. Cell-sized
    quads (one per tile row) keep triangle tile spans far below the
    pair binner's TILES_PER_FACE cap (full-height strips would all go
    down the bounded "huge face" path and get dropped). ~0.9 texel/px
    keeps every quad at mip 0 (256-wide rects pack one-per-shelf,
    >= 304 page rows apart — see module docstring)."""
    rng = np.random.default_rng(13)
    assets = {}
    for i in range(n_textures):
        img = rng.integers(0, 256, (256, 256), dtype=np.uint8)
        assets[f"mem://grid_{i}.ktx2"] = make_bc4_ktx2(img)
    vis_h = 2.0 * np.tan(np.radians(40.0))  # camera distance 1.0, vfov 80
    px_per_wu = height / vis_h
    vis_w = vis_h * (width / height)
    cell_w, cell_h = vis_w / cols, vis_h / rows
    size_x, size_z = 0.92 * cell_w, 0.92 * cell_h
    du = size_x * px_per_wu * 0.9 / 256.0
    dv = size_z * px_per_wu * 0.9 / 256.0
    n = np.array([0.0, -1.0, 0.0], np.float32)
    u0, v0 = 0.45, 0.35
    uvs = np.array(
        [[u0, v0], [u0 + du, v0], [u0 + du, v0 + dv], [u0, v0 + dv]],
        np.float32,
    )
    draws = []
    for r in range(rows):
        cz = (r - (rows - 1) / 2.0) * cell_h
        for c in range(cols):
            cx = (c - (cols - 1) / 2.0) * cell_w
            hx, hz = size_x / 2.0, size_z / 2.0
            positions = np.array(
                [
                    [cx - hx, 0.0, cz - hz],
                    [cx + hx, 0.0, cz - hz],
                    [cx + hx, 0.0, cz + hz],
                    [cx - hx, 0.0, cz + hz],
                ],
                np.float32,
            )
            draws.append(
                PrimitiveDraw(
                    positions=positions,
                    normals=np.broadcast_to(n, (4, 3)).copy(),
                    uvs=uvs.copy(),
                    indices=np.array([0, 1, 2, 0, 2, 3], np.uint32),
                    model_matrix=math3d.mat4_identity(),
                    normal_matrix=np.eye(3, dtype=np.float32),
                    image_uri=f"mem://grid_{c % n_textures}.ktx2",
                    material_name="hardpath",
                    node_name="cell",
                )
            )
    model = GltfModel(draws=draws, image_uris=list(assets))
    return build_scene([model], memory_assets=assets)


def test_fullframe_fallback_genuine():
    """> RT_CAP tiles that each GENUINELY need > K2 windows: the plan
    must classify them all residual end-to-end (no monkeypatching) and
    the full-frame gather fallback must reproduce the gather engine.
    256x264 @ 8x128 tiles = 66 tiles > RT_CAP (64)."""
    from tpurast.renderer import RT_CAP

    width, height, tile_h = 256, 264, 8
    scene = _grid_scene(
        n_textures=36, cols=72, rows=33, width=width, height=height
    )
    r = Renderer(
        scene,
        RendererConfig(
            width=width, height=height, tile_h=tile_h,
            sampler="window", segment_headroom=128,
        ),
    )
    g = r.debug_gbuf(_CAM)
    plan = ksampler.plan_tiles(
        g, None, None,
        tiles_x=r.tiles_x, tiles_y=r.tiles_y,
        tile_h=tile_h, tile_w=r.config.tile_w,
        max_anisotropy=r.config.max_anisotropy,
    )
    n_resid = int(np.asarray(plan["residual_tile"]).sum())
    assert n_resid > RT_CAP, (
        f"construction must yield > RT_CAP={RT_CAP} genuinely "
        f"unwindowable tiles, got {n_resid}"
    )
    frames = _render_pair(scene, width, height, tile_h=tile_h)
    win, miss = frames["window"]
    gat, _ = frames["gather"]
    assert miss > 0
    assert np.abs(win - gat).max() <= 1, (
        "full-frame gather fallback must reproduce the gather engine"
    )


def test_fullframe_fallback(monkeypatch, data_dir):
    """> RT_CAP residual tiles falls back to ONE full-frame gather that
    must reproduce the gather engine. Forced: every tile is marked
    residual and RT_CAP is shrunk to 1 (the dispatch in
    renderer._shade_windowed only compares counts, so the forced plan
    exercises the same code path as 65 genuinely unwindowable tiles)."""
    from tpurast import renderer as renderer_mod
    from tpurast.device.scene import load_demo_scene

    scene = load_demo_scene(str(data_dir))
    orig = ksampler.plan_tiles

    def all_residual(gbuf, *a, **k):
        plan = dict(orig(gbuf, *a, **k))
        cls = plan["cls"]
        forced = np.int32(ksampler.CLS_RESIDUAL)
        import jax.numpy as jnp

        plan["cls"] = jnp.where(cls == ksampler.CLS_EMPTY, cls, forced)
        plan["residual_tile"] = plan["cls"] == ksampler.CLS_RESIDUAL
        # residual_px only feeds the window_miss_px counter; recompute
        # loosely (every matched pixel) to keep it consistent.
        plan["residual_px"] = jnp.sum((gbuf[16] > 0.0).astype(jnp.int32))
        return plan

    monkeypatch.setattr(renderer_mod, "RT_CAP", 1)
    monkeypatch.setattr(ksampler, "plan_tiles", all_residual)
    frames = _render_pair(scene, 256, 64)
    win, miss = frames["window"]
    gat, _ = frames["gather"]
    assert miss > 0
    assert np.abs(win - gat).max() <= 1, (
        "full-frame gather fallback must reproduce the gather engine"
    )
