"""Asset-layer tests: GLB parsing, KTX2 container, BC decode.

Fixture data: the reference's tiny probe assets (SURVEY.md §4) plus fuzzing
against Pillow's independent BC decoder.
"""

import numpy as np
import pytest
from PIL import Image

from tpurast import math3d
from tpurast.assets import bcdec, gltf, ktx2


# ---------------------------------------------------------------------------
# glTF
# ---------------------------------------------------------------------------


def test_dragon_counts(data_dir):
    # SURVEY §6: dragon = 19,332 tris / 11,319 verts, one draw.
    model = gltf.load_glb(data_dir / "meshes/stanford_dragon.glb")
    assert model.triangle_count == 19332
    assert model.vertex_count == 11319
    assert len(model.draws) == 1
    d = model.draws[0]
    assert d.indices.dtype == np.uint32  # u16 widened (src/Renderer.zig:902-912)
    assert d.image_uri == "textures/stanford_dragon/stanford_dragon_diffuse_specular_bc7.ktx2"


def test_triangle_arena_crate_counts(data_dir):
    assert gltf.load_glb(data_dir / "meshes/triangle.glb").triangle_count == 1
    assert gltf.load_glb(data_dir / "meshes/arena.glb").triangle_count == 10
    crate = gltf.load_glb(data_dir / "meshes/crate.glb")
    assert crate.triangle_count == 12
    assert crate.draws[0].image_uri == "textures/crate/crate_diffuse_specular_bc7.ktx2"


def test_model_matrix_includes_basis_change(data_dir):
    # Node transforms get glTF->world (diag(-1,-1,1)) then post_transform
    # applied (src/Renderer.zig:797-799).
    post = math3d.translation([0.0, 1.0, 0.0])
    model = gltf.load_glb(data_dir / "meshes/triangle.glb", post_transform=post)
    m = model.draws[0].model_matrix
    # glTF-space +X ends up at world -X, then translated.
    np.testing.assert_allclose(
        math3d.transform_point(m, [1, 0, 0]), [-1, 1, 0], atol=1e-6
    )


def test_vertex_bounds_sane(data_dir):
    d = gltf.load_glb(data_dir / "meshes/stanford_dragon.glb").draws[0]
    assert np.isfinite(d.positions).all()
    assert np.abs(d.positions).max() < 100.0
    norms = np.linalg.norm(d.normals, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-2)


# ---------------------------------------------------------------------------
# KTX2
# ---------------------------------------------------------------------------


def test_crate_ktx2_header(data_dir):
    t = ktx2.load_ktx2(data_dir / "textures/crate/crate_diffuse_specular_bc7.ktx2")
    assert t.vk_format == ktx2.VK_FORMAT_BC7_SRGB_BLOCK
    assert t.is_srgb
    assert (t.width, t.height) == (512, 512)
    assert t.level_count == 10  # full chain 512 -> 1
    assert t.supercompression == ktx2.SUPERCOMPRESSION_ZSTD
    # Level sizes: ceil(w/4)*ceil(h/4)*16 bytes.
    for lvl in t.levels:
        assert len(lvl.data) == lvl.blocks_x * lvl.blocks_y * 16
        assert lvl.width == max(1, 512 >> lvl.level)


def test_hdr_bc6u_header(data_dir):
    t = ktx2.load_ktx2(data_dir / "textures/hdr_bc6u.ktx2")
    assert t.vk_format == ktx2.VK_FORMAT_BC6H_UFLOAT_BLOCK
    assert (t.width, t.height) == (512, 512)
    assert t.level_count == 1  # documented libktx workaround (SURVEY §2.4.7)


def test_missing_bc6u_mips(data_dir):
    t = ktx2.load_ktx2(data_dir / "textures/missing_bc6u.ktx2")
    assert t.vk_format == ktx2.VK_FORMAT_BC6H_UFLOAT_BLOCK
    assert (t.width, t.height) == (128, 128)
    assert t.level_count == 8


def test_porsche_textures_parse(data_dir):
    n = 0
    for p in sorted((data_dir / "textures/porche").glob("*.ktx2")):
        t = ktx2.load_ktx2(p)
        assert t.vk_format == ktx2.VK_FORMAT_BC7_SRGB_BLOCK
        n += 1
    assert n == 11  # 13 on disk minus 2 stripped large blobs


# ---------------------------------------------------------------------------
# BC decode (vs Pillow oracle)
# ---------------------------------------------------------------------------


def _bc7_mode_blocks(rng, mode: int, count: int) -> np.ndarray:
    """Random blocks forced to a specific BC7 mode."""
    blocks = rng.integers(0, 256, size=(count, 16), dtype=np.uint8)
    blocks[:, 0] = (blocks[:, 0] | (1 << mode)) & ~np.uint8((1 << mode) - 1)
    return blocks


@pytest.mark.parametrize("mode", range(8))
def test_bc7_fuzz_all_modes_vs_pillow(mode):
    rng = np.random.default_rng(42 + mode)
    blocks = _bc7_mode_blocks(rng, mode, 512)
    mine = bcdec.decode_bc7(blocks)
    for i in range(len(blocks)):
        ref = np.asarray(Image.frombytes("RGBA", (4, 4), blocks[i].tobytes(), "bcn", (7, "")))
        np.testing.assert_array_equal(mine[i], ref, err_msg=f"mode {mode} block {i}")


def test_bc7_invalid_block_transparent_black():
    # Reserved mode (no set bit in low byte) -> (0,0,0,0) per Khronos DFS.
    blk = np.zeros((1, 16), dtype=np.uint8)
    blk[0, 1] = 0xFF
    assert (bcdec.decode_bc7(blk) == 0).all()


def test_bc4_fuzz_vs_pillow():
    rng = np.random.default_rng(7)
    blocks = rng.integers(0, 256, size=(2048, 8), dtype=np.uint8)
    mine = bcdec.decode_bc4(blocks)
    for i in range(0, len(blocks), 1):
        ref = np.asarray(Image.frombytes("L", (4, 4), blocks[i].tobytes(), "bcn", (4, "")))
        np.testing.assert_array_equal(mine[i], ref)


def test_decode_crate_texture_statistics(data_dir):
    t = ktx2.load_ktx2(data_dir / "textures/crate/crate_diffuse_specular_bc7.ktx2")
    img = bcdec.decode_level(t.levels[0].data, t.format_name, t.width, t.height)
    assert img.shape == (512, 512, 4)
    # Woody crate: warm colors, R > G > B on average; alpha = specular mask.
    mean = img.reshape(-1, 4).mean(axis=0)
    assert mean[0] > mean[1] > mean[2]
    # Mip level consistency: level 1 mean close to level 0 mean.
    img1 = bcdec.decode_level(t.levels[1].data, t.format_name, 256, 256)
    np.testing.assert_allclose(
        img1.reshape(-1, 4).mean(axis=0), mean, atol=6.0
    )


def test_assemble_blocks_crop():
    # Non-multiple-of-4 sizes crop the padded block grid.
    decoded = np.arange(2 * 16 * 4, dtype=np.uint8).reshape(2, 4, 4, 4)
    img = bcdec.assemble_blocks(decoded, blocks_x=2, blocks_y=1, width=6, height=3)
    assert img.shape == (3, 6, 4)
    np.testing.assert_array_equal(img[0, 0], decoded[0, 0, 0])
    np.testing.assert_array_equal(img[0, 4], decoded[1, 0, 0])


def test_srgb_roundtrip():
    v = np.linspace(0, 1, 64, dtype=np.float32)
    np.testing.assert_allclose(bcdec.linear_to_srgb(bcdec.srgb_to_linear((v * 255).astype(np.uint8))), v, atol=1 / 255)


# ---------------------------------------------------------------------------
# BC6H (HDR half-float)
# ---------------------------------------------------------------------------


def test_bc6h_shipped_assets_exact(data_dir):
    # Both shipped BC6H assets decode identically to Pillow's decoder
    # (after its [0,1]->u8 mapping).
    from tpurast.assets.bc6h import decode_bc6h

    for name in ("hdr_bc6u.ktx2", "missing_bc6u.ktx2"):
        t = ktx2.load_ktx2(data_dir / "textures" / name)
        lvl = t.levels[0]
        blocks = np.frombuffer(lvl.data, dtype=np.uint8).reshape(-1, 16)
        mine = bcdec.assemble_blocks(
            decode_bc6h(blocks), lvl.blocks_x, lvl.blocks_y, lvl.width, lvl.height
        )
        ref = np.asarray(
            Image.frombytes("RGB", (lvl.width, lvl.height), lvl.data, "bcn", (6, ""))
        )
        got = np.clip(np.round(mine * 255), 0, 255).astype(np.uint8)
        np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("mode", sorted([0, 1, 2, 3, 6, 7, 10, 11, 14, 15, 18, 22, 26, 30]))
def test_bc6h_fuzz_all_modes_vs_pillow(mode):
    from tpurast.assets.bc6h import decode_bc6h

    rng = np.random.default_rng(100 + mode)
    blocks = rng.integers(0, 256, size=(128, 16), dtype=np.uint8)
    if mode < 2:
        blocks[:, 0] = (blocks[:, 0] & ~np.uint8(3)) | mode
    else:
        blocks[:, 0] = (blocks[:, 0] & ~np.uint8(31)) | mode
    mine = decode_bc6h(blocks)
    assert np.isfinite(mine).all()
    for i in range(len(blocks)):
        ref = np.asarray(Image.frombytes("RGB", (4, 4), blocks[i].tobytes(), "bcn", (6, "")))
        got = np.clip(np.round(mine[i] * 255), 0, 255).astype(int)
        # <=1 LSB: Pillow's half->u8 rounding differs, never the decode.
        assert np.abs(got - ref.astype(int)).max() <= 1, f"mode {mode} block {i}"


def _make_bc6h_block(mode, fieldvals, idx_bits):
    """Pack a BC6H block from named field values via the mode layout
    table — lets the SF16 fuzz constrain endpoint magnitudes so decoded
    values land in [0, 1] (the only range Pillow's u8 output resolves)."""
    from tpurast.assets import bc6h as B
    from tpurast.assets._bc7_tables import ANCHOR_SECOND_2

    spec = B._MODES[mode]
    bits = np.zeros(128, np.uint8)
    nh = 2 if mode in (0, 1) else 5
    for k in range(nh):
        bits[k] = (mode >> k) & 1
    pos = nh
    for name, hi, lo in spec["layout"]:
        if hi >= lo:
            nb = hi - lo + 1
            v = (fieldvals.get(name, 0) >> lo) & ((1 << nb) - 1)
            for k in range(nb):
                bits[pos] = (v >> k) & 1
                pos += 1
        else:
            nb = lo - hi + 1
            for k in range(nb):
                bits[pos] = (fieldvals.get(name, 0) >> (lo - k)) & 1
                pos += 1
    two = mode in B.TWO_REGION_MODES
    ib = 3 if two else 4
    anchor2 = int(ANCHOR_SECOND_2[fieldvals.get("d", 0) & 31]) if two else -1
    for i in range(16):
        nb = ib - 1 if (i == 0 or i == anchor2) else ib
        v = idx_bits[i] & ((1 << nb) - 1)
        for k in range(nb):
            bits[pos] = (v >> k) & 1
            pos += 1
    return np.packbits(bits, bitorder="little")


@pytest.mark.parametrize("mode", sorted([0, 1, 2, 3, 6, 7, 10, 11, 14, 15, 18, 22, 26, 30]))
def test_bc6h_signed_fuzz_vs_pillow(mode):
    # SF16 (vkFormat 144, src/wgpu.zig:138): Pillow's BC6HS u8 output is
    # only meaningful for decoded values in [0, 1] (negatives come back
    # mangled by its half->u8 conversion), so endpoint magnitudes are
    # constrained to keep results in range and negative pixels are
    # excluded from the comparison.
    from tpurast.assets import bc6h as B

    spec = B._MODES[mode]
    rng = np.random.default_rng(500 + mode)
    epb = spec["epb"]
    blocks = []
    for _ in range(96):
        fv = {"d": int(rng.integers(0, 32))}
        base_mag = 1 << max(epb - 3, 1)
        for ch in "rgb":
            fv[ch + "w"] = int(rng.integers(0, base_mag))
        if spec["delta"] is not None:
            db = dict(zip("rgb", spec["delta"]))
            for ch in "rgb":
                for epn in "xyz":
                    fv[ch + epn] = int(rng.integers(0, 1 << max(db[ch] - 2, 1)))
        else:
            for ch in "rgb":
                for epn in "xyz":
                    fv[ch + epn] = int(rng.integers(0, base_mag))
        blocks.append(_make_bc6h_block(mode, fv, list(rng.integers(0, 16, 16))))
    blocks = np.stack(blocks)
    mine = B.decode_bc6h(blocks, signed=True)
    ref = np.stack(
        [
            np.asarray(Image.frombytes("RGB", (4, 4), b.tobytes(), "bcn", (6, "BC6HS")))
            for b in blocks
        ]
    ).astype(int)
    got = np.clip(np.round(mine * 255), 0, 255).astype(int)
    nonneg = mine >= 0
    assert np.where(nonneg, np.abs(got - ref), 0).max() <= 1


def test_bc6h_signed_negative_halves():
    # Negative endpoints decode to sign-magnitude half bits; basic sanity
    # on the signed-only path (Pillow can't check this range).
    from tpurast.assets.bc6h import decode_bc6h

    # Mode 0x03 (non-delta, epb 10): endpoint 0x3FF sign-extends to -1.
    fv = dict(rw=0x3FF, gw=0x3FF, bw=0x3FF, rx=0x3FF, gx=0x3FF, bx=0x3FF)
    blk = _make_bc6h_block(0x03, fv, [0] * 16)
    out = decode_bc6h(blk[None], signed=True)[0]
    assert (out < 0).all() and np.isfinite(out).all()


def test_bc6h_decode_level_sf16():
    # decode_level routes bc6h_sf without raising and matches the
    # direct decoder (both native and numpy paths).
    from tpurast.assets import bc6h as B

    rng = np.random.default_rng(9)
    blocks = rng.integers(0, 256, (4, 16), dtype=np.uint8)
    img = bcdec.decode_level(blocks.tobytes(), "bc6h_sf", 8, 8)
    direct = bcdec.assemble_blocks(B.decode_bc6h(blocks, signed=True), 2, 2, 8, 8)
    np.testing.assert_array_equal(img, direct)


def test_bc6h_decode_level_roundtrip(data_dir):
    t = ktx2.load_ktx2(data_dir / "textures/missing_bc6u.ktx2")
    img = bcdec.decode_level(t.levels[0].data, t.format_name, t.width, t.height)
    assert img.shape == (128, 128, 3) and img.dtype == np.float32
    # magenta/black checker at half intensity (mean ~0.61/0/0.54).
    mean = img.reshape(-1, 3).mean(axis=0)
    assert mean[0] > 0.5 and mean[1] < 0.01 and mean[2] > 0.4


# ---------------------------------------------------------------------------
# Native (C++) decoder parity
# ---------------------------------------------------------------------------


def test_native_decoders_match_numpy():
    from tpurast.assets import native
    from tpurast.assets.bc6h import decode_bc6h as np_bc6h

    if not native.available():
        pytest.skip("no C++ toolchain in this environment")
    rng = np.random.default_rng(11)
    b7 = rng.integers(0, 256, (4096, 16), dtype=np.uint8)
    np.testing.assert_array_equal(native.decode_bc7(b7), bcdec.decode_bc7(b7))
    b4 = rng.integers(0, 256, (4096, 8), dtype=np.uint8)
    np.testing.assert_array_equal(native.decode_bc4(b4), bcdec.decode_bc4(b4))
    b6 = rng.integers(0, 256, (4096, 16), dtype=np.uint8)
    np.testing.assert_array_equal(native.decode_bc6h(b6), np_bc6h(b6))
    np.testing.assert_array_equal(
        native.decode_bc6h(b6, signed=True), np_bc6h(b6, signed=True)
    )


def test_decode_level_native_fallback_equivalence(data_dir, monkeypatch):
    # decode_level must produce identical output with the native path
    # disabled (TPURAST_NATIVE=0 -> numpy decoders).
    from tpurast.assets import native

    t = ktx2.load_ktx2(data_dir / "textures/crate/crate_diffuse_specular_bc7.ktx2")
    a = bcdec.decode_level(t.levels[2].data, t.format_name, 128, 128)
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    b = bcdec.decode_level(t.levels[2].data, t.format_name, 128, 128)
    np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------------
# KTX2 writer + BC4 encoder (generated assets)
# ---------------------------------------------------------------------------


def test_ktx2_write_bc4_roundtrip():
    from tpurast.assets.ktx2_write import make_bc4_ktx2

    y, x = np.mgrid[0:64, 0:64]
    checker = (((x // 4 + y // 4) % 2) * 255).astype(np.uint8)
    blob = make_bc4_ktx2(checker)
    t = ktx2.parse_ktx2(blob)
    assert t.vk_format == ktx2.VK_FORMAT_BC4_UNORM_BLOCK
    assert t.level_count == 7 and t.supercompression == ktx2.SUPERCOMPRESSION_ZSTD
    dec = bcdec.decode_level(t.levels[0].data, t.format_name, 64, 64)
    np.testing.assert_array_equal(dec, checker)  # 2-level content is exact


def test_bc4_encode_matches_pillow_decode():
    from tpurast.assets.ktx2_write import encode_bc4

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    blocks = encode_bc4(img)
    ref = np.asarray(Image.frombytes("L", (32, 32), blocks, "bcn", (4, "")))
    assert np.abs(ref.astype(int) - img.astype(int)).max() <= 24  # BC4 quantization


# ---------------------------------------------------------------------------
# Embedded fallback texture (resources/textures/missing_diffuse_specular_
# bc7.ktx2, bound at src/Renderer.zig:551-566)
# ---------------------------------------------------------------------------


def test_fallback_texture_decodes_real_asset(data_dir):
    """The fallback bound to texture id 0 must be the reference's real
    embedded BC7 asset, decoded by our own decoder: a 64x64 black/magenta
    2x2-cell checkerboard with BLACK at the origin, alpha 128, 7 mips
    (mips 0-1 keep the checker; 2+ are uniform 188 sRGB)."""
    from tpurast.device.textures import fallback_texture

    res = data_dir.parent / "resources/textures/missing_diffuse_specular_bc7.ktx2"
    if not res.exists():
        import pytest

        pytest.skip("resources tree not mounted")
    mips = fallback_texture(str(data_dir))
    assert len(mips) == 7 and mips[0].shape == (64, 64, 4)
    # Reconstruct sRGB u8 from the linear atlas staging and compare.
    lin = mips[0]
    srgb = np.where(
        lin <= 0.0031308, lin * 12.92, 1.055 * np.power(lin, 1 / 2.4) - 0.055
    )
    u8 = np.round(srgb[..., :3] * 255).astype(np.uint8)
    y, x = np.mgrid[0:64, 0:64]
    checker = (((x // 2 + y // 2) % 2) == 1).astype(np.uint8) * 255
    np.testing.assert_array_equal(u8[..., 0], checker)  # R
    np.testing.assert_array_equal(u8[..., 1], 0 * checker)  # G
    np.testing.assert_array_equal(u8[..., 2], checker)  # B
    np.testing.assert_array_equal(
        np.round(lin[..., 3] * 255).astype(np.uint8), 128
    )  # linear alpha = specular mask
    # Coarse mips are uniform magenta-gray 188 sRGB (the linear average
    # of the checker as the asset's own mipgen left it; G is 0 or 1
    # depending on each block's BC7 endpoint quantization).
    for m in mips[2:]:
        s = np.where(m <= 0.0031308, m * 12.92, 1.055 * np.power(m, 1 / 2.4) - 0.055)
        u = np.round(s[..., :3] * 255).astype(np.uint8)
        np.testing.assert_array_equal(u[..., 0], 188)
        np.testing.assert_array_equal(u[..., 2], 188)
        assert u[..., 1].max() <= 1
