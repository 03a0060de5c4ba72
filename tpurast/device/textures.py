"""Texture mip atlas: HBM layout + host-side build.

All scene textures (decoded from KTX2/BC on host, see tpurast.assets) are
packed into one flat (N, 4) float32 array of linear-color texels. Small
side tables give per-(texture, mip) offsets and sizes. The sampling kernel
(kernels/shade.py) computes flat indices and gathers — the replacement for
the GPU's fixed-function sampler with the reference's sampler state:
repeat addressing, trilinear min/mag/mip filtering (src/Renderer.zig:
506-527; anisotropy 16 is requested there but configs only exercise
trilinear — tracked as a config flag).

sRGB handling matches GPU samplers: BC7_SRGB texels are EOTF-decoded to
linear *before* filtering; alpha (the specular mask, SURVEY §2.4.4) is
linear and untouched.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from tpurast.assets import bcdec, ktx2

MAX_MIPS = 16


@dataclasses.dataclass
class TextureAtlas:
    """Host-side staging of the atlas; `.device()` uploads via jnp.

    Texels are stored as "quad rows": entry (x, y) of a mip holds the
    whole 2x2 bilinear footprint [(x,y), (x+1,y), (x,y+1), (x+1,y+1)]
    (neighbors wrapped for repeat addressing), 16 floats per row. One
    gather per bilinear tap instead of four — XLA:TPU gather cost is per
    row, so this quarters sampling cost for a 4x memory trade.
    """

    texels: np.ndarray  # (N, 16) f32 linear RGBA 2x2 quads
    offsets: np.ndarray  # (T, MAX_MIPS) i32 flat quad-row offset per mip
    sizes: np.ndarray  # (T, MAX_MIPS, 2) i32 (width, height) per mip
    n_mips: np.ndarray  # (T,) i32

    def device(self, dtype: str = "float32"):
        """Upload; dtype="bfloat16" halves HBM (and upload time — the
        cast happens host-side) at ~3 bits of texel precision (below
        u8-source noise for most content; float32 preserves exactness).
        Measured slower per-tap on v5e (gathers are op-rate bound), so
        bfloat16 is a memory knob, not a speed knob."""
        import jax.numpy as jnp
        import ml_dtypes

        host = self.texels
        if dtype != "float32":
            host = host.astype(ml_dtypes.bfloat16 if dtype == "bfloat16" else dtype)
        return {
            "texels": jnp.asarray(host),
            "offsets": jnp.asarray(self.offsets),
            "sizes": jnp.asarray(self.sizes),
            "n_mips": jnp.asarray(self.n_mips),
        }


def _to_linear_rgba(img: np.ndarray, srgb: bool) -> np.ndarray:
    """uint8/float image (H, W, C in {1,3,4}) -> (H, W, 4) f32 linear."""
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    out = np.empty((h, w, 4), dtype=np.float32)
    if img.dtype == np.uint8:
        if srgb:
            out[..., :3] = bcdec.srgb_to_linear(img[..., : min(c, 3)])
        else:
            out[..., :3] = img[..., : min(c, 3)].astype(np.float32) / 255.0
        if c == 1:
            out[..., 1] = out[..., 2] = out[..., 0]
        out[..., 3] = img[..., 3].astype(np.float32) / 255.0 if c == 4 else 1.0
    else:
        out[..., :3] = img[..., : min(c, 3)].astype(np.float32)
        if c == 1:
            out[..., 1] = out[..., 2] = out[..., 0]
        out[..., 3] = img[..., 3].astype(np.float32) if c == 4 else 1.0
    return out


def mip_chain(base: np.ndarray) -> list[np.ndarray]:
    """Box-filter mip chain for procedurally generated textures.
    (KTX2 assets ship their own mips; this is for fallback/synthetic.)"""
    mips = [base]
    m = base
    while m.shape[0] > 1 or m.shape[1] > 1:
        h = max(1, m.shape[0] // 2)
        w = max(1, m.shape[1] // 2)
        m2 = m[: h * 2, : w * 2].reshape(h, 2, w, 2, -1).mean(axis=(1, 3))
        mips.append(m2.astype(np.float32))
        m = m2
    return mips


def fallback_texture() -> list[np.ndarray]:
    """64x64 magenta/black checkerboard (2x2-texel cells), alpha 128 —
    matches the decoded content of the reference's embedded
    missing_diffuse_specular_bc7.ktx2 (resources/textures.zig:1, bound at
    src/Renderer.zig:551-566), generated procedurally."""
    y, x = np.mgrid[0:64, 0:64]
    checker = ((x // 2 + y // 2) % 2 == 0).astype(np.float32)
    base = np.zeros((64, 64, 4), dtype=np.float32)
    base[..., 0] = checker  # magenta squares (sRGB 255 -> linear 1.0)
    base[..., 2] = checker
    base[..., 3] = 128.0 / 255.0  # uniform half-specular mask
    return mip_chain(base)


def decode_ktx2_texture(tex: ktx2.Ktx2Texture) -> list[np.ndarray]:
    """Decode every mip level of a KTX2 texture to linear f32 RGBA."""
    mips = []
    for lvl in tex.levels:
        img = bcdec.decode_level(lvl.data, tex.format_name, lvl.width, lvl.height)
        mips.append(_to_linear_rgba(img, tex.is_srgb))
    return mips


def _quad_rows(m: np.ndarray) -> np.ndarray:
    """(H, W, 4) -> (H*W, 16) rows of 2x2 wrapped bilinear footprints."""
    right = np.roll(m, -1, axis=1)
    down = np.roll(m, -1, axis=0)
    diag = np.roll(right, -1, axis=0)
    return np.concatenate([m, right, down, diag], axis=-1).reshape(-1, 16).astype(np.float32)


def build_atlas(textures: list[list[np.ndarray]]) -> TextureAtlas:
    """Pack per-texture mip pyramids ((H, W, 4) f32 linear each) into the
    flat quad-row atlas. Texture order defines texture ids."""
    n_tex = len(textures)
    offsets = np.zeros((n_tex, MAX_MIPS), dtype=np.int32)
    sizes = np.ones((n_tex, MAX_MIPS, 2), dtype=np.int32)
    n_mips = np.zeros(n_tex, dtype=np.int32)
    chunks = []
    cursor = 0
    for ti, mips in enumerate(textures):
        assert len(mips) <= MAX_MIPS
        n_mips[ti] = len(mips)
        for mi, m in enumerate(mips):
            h, w = m.shape[:2]
            offsets[ti, mi] = cursor
            sizes[ti, mi] = (w, h)
            chunks.append(_quad_rows(m))
            cursor += h * w
        # Clamp lod beyond the chain to the last mip.
        for mi in range(len(mips), MAX_MIPS):
            offsets[ti, mi] = offsets[ti, len(mips) - 1]
            sizes[ti, mi] = sizes[ti, len(mips) - 1]
    texels = (
        np.concatenate(chunks, axis=0)
        if chunks
        else np.zeros((1, 16), dtype=np.float32)
    )
    return TextureAtlas(texels=texels, offsets=offsets, sizes=sizes, n_mips=n_mips)
