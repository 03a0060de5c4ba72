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

import contextlib

import jax

_force_interpret = False


def interpret_mode() -> bool:
    """Pallas kernels run compiled on TPU, interpreted elsewhere (CI)."""
    return _force_interpret or jax.default_backend() != "tpu"


@contextlib.contextmanager
def force_interpret():
    """Force Pallas interpret mode for kernels TRACED inside the context
    (the flag is read at trace time, so build + first-call the render
    function within). This is the validation-layer analog of the wgpu
    uncaptured-error callback (src/Renderer.zig:1229-1247): interpret
    mode executes the kernel body as plain XLA ops on the SAME device,
    so diffing compiled-vs-interpreted output catches Pallas-only
    semantics bugs (e.g. stale-VMEM output-block revisits) that CPU CI
    cannot see. Used by the bench parity gate (tpurast/cli.py)."""
    global _force_interpret
    prev = _force_interpret
    _force_interpret = True
    try:
        yield
    finally:
        _force_interpret = prev
