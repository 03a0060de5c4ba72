"""The wgpu-native replacement: TPU compute kernels (XLA + Pallas).

Pipeline stages (one jit-compiled frame function, see tpurast.renderer):

  geometry.py — vertex transform (MXU matmuls), clipless 2D-homogeneous
                triangle setup, back-face cull, tiled binning
  raster.py   — Pallas visibility kernel: per-tile edge tests + reversed-Z
                GreaterEqual depth over (tile_h, tile_w) framebuffer tiles
  shade.py    — deferred shading: perspective-correct attribute
                interpolation + textured Lambert/Phong (basic.frag port
                at the semantic level)
  present.py  — linear -> sRGB encode, host readback helpers

Design notes: rasterization uses homogeneous edge functions (adjugate of
the clip-space vertex matrix), so no polygon clipping is ever needed —
triangles crossing w=0 are handled by sign-region tests. This replaces the
wgpu fixed-function rasterizer state at src/Renderer.zig:396-462 (CCW
front, back cull, Depth32Float GreaterEqual, no MSAA).
"""

import jax


def interpret_mode() -> bool:
    """Pallas kernels run compiled on TPU, interpreted elsewhere (CI)."""
    return jax.default_backend() != "tpu"
