"""Present stage: format conversion + device->host readback.

Replaces the swapchain/present path (src/Renderer.zig:1080,
surfaceGetNextTextureView src/wgpu.zig:291-328): the linear-color
framebuffer is encoded to the surface format (sRGB u8, matching the
reference's preferred *Srgb surface formats, src/Renderer.zig:359-370)
on-device, then read back. Double buffering lives in tpurast.present
(host side): frame N computes while frame N-1 transfers.
"""

from __future__ import annotations

import jax.numpy as jnp


def linear_to_srgb(c):
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(c <= 0.0031308, c * 12.92, 1.055 * jnp.power(c, 1.0 / 2.4) - 0.055)


def encode_srgb_u8(framebuffer, width: int, height: int):
    """(Hp, Wp, 4) linear f32 -> (height, width, 4) sRGB-encoded u8,
    cropping tile padding. Alpha is linear (pass-through)."""
    fb = framebuffer[:height, :width]
    rgb = linear_to_srgb(fb[..., :3])
    a = jnp.clip(fb[..., 3:4], 0.0, 1.0)
    out = jnp.concatenate([rgb, a], axis=-1)
    return jnp.round(out * 255.0).astype(jnp.uint8)


def crop_linear(framebuffer, width: int, height: int):
    """(Hp, Wp, C) -> (height, width, C) linear f32 (RGBA16Float-surface
    analog: the reference's top surface-format preference is RGBA16Float,
    src/Renderer.zig:359-363)."""
    return framebuffer[:height, :width]
