"""Deferred shading: perspective-correct interpolation + lighting + texture.

Consumes the visibility buffer (per-pixel winning face id) and shades each
covered pixel exactly once:

  1. ONE fat-row gather per pixel fetches everything about the winning
     triangle: edge setup, per-vertex world position / normal / UV, and
     texture id, packed into a 48-float row (XLA:TPU gather cost is per
     ROW, nearly independent of row width — four narrow gathers cost 4x
     one fat gather on v5e).
  2. Homogeneous edge functions are re-evaluated at the pixel; weights
     u_i = e_i / sum(e) are the perspective-correct barycentrics (see
     kernels/geometry.py).
  3. Mip level comes from analytic UV screen derivatives (closed-form
     gradients of the rational interpolant — no quad neighborhoods on
     TPU, SURVEY §7 hard-part #4); per-level atlas offset/size are
     lane-selected from a second fat row (masked reduction, not a
     minor-dim gather).
  4. Trilinear = ONE row gather (own-mip quad + parent-mip window
     packed per row, device/textures.py) + in-register blends.
  5. Lighting: ambient + Lambert diffuse + Phong specular with the
     specular mask in albedo alpha — basic.frag:15-38, same constants.

Everything is jnp over the full framebuffer: gathers + fused elementwise
math, HBM-bandwidth bound.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Fat-row layout for the per-face shading table (see pack_shade_rows):
# [setup(24) | world(9) | normal(9) | uv(6) | tex-info(49, int32 bitcast)]
# The texture info (per-mip atlas offset/width/height + mip count) is
# joined per FACE at pack time — one per-pixel gather fetches everything.
from tpurast.kernels.geometry import SETUP_WIDTH as _SETUP_WIDTH

ROW_WORLD = _SETUP_WIDTH            # 24..32
ROW_NORMAL = _SETUP_WIDTH + 9       # 33..41
ROW_UV = _SETUP_WIDTH + 18          # 42..47
ROW_TEXINFO = _SETUP_WIDTH + 24     # 48..96
SHADE_ROW_WIDTH = 104

# Texture-info row layout (int32): per-mip offset/width/height + mip count.
TEX_ROW_WIDTH = 49  # [offsets(16) | widths(16) | heights(16) | n_mips]


def pack_tex_table(atlas):
    """(TEX, 49) int32: per-texture mip offsets/sizes + mip count."""
    offsets = atlas["offsets"]  # (TEX, 16)
    sizes = atlas["sizes"]  # (TEX, 16, 2)
    n_mips = atlas["n_mips"]  # (TEX,)
    return jnp.concatenate(
        [
            offsets.astype(jnp.int32),
            sizes[..., 0].astype(jnp.int32),
            sizes[..., 1].astype(jnp.int32),
            n_mips.astype(jnp.int32)[:, None],
        ],
        axis=1,
    )


def pack_shade_rows(setup, face_world, face_normal, face_uv, face_tex, atlas):
    """Build the (F, 96) fat shading table (per frame, F-sized: cheap).

    Int32 texture info is bitcast into the f32 row (values survive the
    round trip exactly; atlas offsets exceed f32's 2^24 integer range so
    they cannot be stored as floats).
    """
    f = setup.shape[0]
    tex_rows = pack_tex_table(atlas)[face_tex]  # (F, 49) i32
    return jnp.concatenate(
        [
            setup,
            face_world.reshape(f, 9),
            face_normal.reshape(f, 9),
            face_uv.reshape(f, 6),
            jax.lax.bitcast_convert_type(tex_rows, jnp.float32),
            jnp.zeros((f, SHADE_ROW_WIDTH - ROW_TEXINFO - TEX_ROW_WIDTH), dtype=jnp.float32),
        ],
        axis=1,
    )


def _safe_div(a, b, eps=1e-30):
    return a / jnp.where(jnp.abs(b) < eps, jnp.where(b < 0, -eps, eps), b)


def _rnorm(vec):
    """1/||vec|| with zero-safe clamp, keepdims."""
    return jax.lax.rsqrt(jnp.maximum(jnp.sum(vec * vec, axis=-1, keepdims=True), 1e-20))


def _lane_select(rows, lane):
    """rows (..., 16) selected at per-element lane index (masked reduce —
    avoids XLA's slow minor-dim gather path)."""
    iota = jnp.arange(16, dtype=lane.dtype)
    return jnp.sum(jnp.where(lane[..., None] == iota, rows, 0), axis=-1)


def _lerp_quad(quad, fx, fy):
    """Bilinear blend of a 16-float [TL, TR, BL, BR] channel-block quad."""
    top = quad[..., 0:4] * (1 - fx) + quad[..., 4:8] * fx
    bot = quad[..., 8:12] * (1 - fx) + quad[..., 12:16] * fx
    return top * (1 - fy) + bot * fy


def _trilerp(texels, off0, tw0, th0, tw1, th1, tfrac, u, v):
    """Trilinear sample with repeat addressing: ONE row gather.

    Atlas rows (device/textures.py) carry the own-mip 2x2 quad plus the
    parent-mip 3x3 window anchored at ((x0-1)//2, (y0-1)//2); the parent
    bilinear footprint starts at offset dx, dy in {0, 1} inside the
    window, computed exactly below. Gather row count (not width) is the
    v5e sampling wall, so folding both mip taps into one row halves the
    texture-unit cost.
    """
    wf = tw0.astype(jnp.float32)
    hf = th0.astype(jnp.float32)
    x = u * wf - 0.5
    y = v * hf - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), tw0)
    y0i = jnp.mod(y0.astype(jnp.int32), th0)
    row = texels[off0 + y0i * tw0 + x0i].astype(jnp.float32)  # (..., 52)
    c0 = _lerp_quad(row[..., 0:16], fx, fy)

    # Parent-mip footprint: same sample point in mip l+1 coordinates.
    wf1 = tw1.astype(jnp.float32)
    hf1 = th1.astype(jnp.float32)
    x1f = u * wf1 - 0.5
    y1f = v * hf1 - 0.5
    x1 = jnp.floor(x1f)
    y1 = jnp.floor(y1f)
    fx1 = (x1f - x1)[..., None]
    fy1 = (y1f - y1)[..., None]
    # Window anchor in unwrapped coords; dx, dy in {0, 1} by construction
    # for power-of-two mips (w1 == w0/2). The clip is exact where it can
    # bind: a dimension-1 mip (w1 == w0 == 1) has a uniform window, so
    # any in-range offset reads the same texel.
    dx = jnp.clip(x1 - jnp.floor((x0 - 1.0) * 0.5), 0.0, 1.0)
    dy = jnp.clip(y1 - jnp.floor((y0 - 1.0) * 0.5), 0.0, 1.0)

    # Parent blend as a direct weighted sum over the 3x3 window: per-axis
    # weights put (1-f, f) at offset (dx, dx+1) — algebraically the same
    # bilinear, but it reads the gathered row once per texel slice with
    # no materialized quad intermediates (XLA fuses it into the gather
    # consumers; the select-then-lerp form cost ~6 ms/frame in HBM
    # round-trips at 1080p).
    one = jnp.float32(1.0)
    wx1 = [(one - dx) * (one - fx1[..., 0]), (one - dx) * fx1[..., 0] + dx * (one - fx1[..., 0]), dx * fx1[..., 0]]
    wy1 = [(one - dy) * (one - fy1[..., 0]), (one - dy) * fy1[..., 0] + dy * (one - fy1[..., 0]), dy * fy1[..., 0]]
    c1 = jnp.zeros_like(c0)
    for r in range(3):
        for c in range(3):
            s = 16 + (r * 3 + c) * 4
            c1 = c1 + (wy1[r] * wx1[c])[..., None] * row[..., s : s + 4]
    return c0 * (1 - tfrac) + c1 * tfrac


def shade_deferred(
    fid,  # (H, W) int32 face id, -1 background
    shade_rows,  # (F, 96) f32 packed per-face table (incl. tex info)
    texels,  # (N, 16) f32 linear quad-row atlas
    camera_position,  # (3,) f32
    *,
    light_direction,
    light_color,
    ambient_amount: float,
    specular_power: float,
    clear_color,
    max_anisotropy: int = 1,
):
    """Returns (H, W, 4) f32 linear-color framebuffer."""
    h, w = fid.shape
    mask = fid >= 0
    f = jnp.maximum(fid, 0)

    rows = shade_rows[f]  # (H, W, SHADE_ROW_WIDTH) — THE gather
    px = jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5 - rows[..., 16]  # anchored
    py = jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5 - rows[..., 17]
    e0 = rows[..., 0] * px + rows[..., 1] * py + rows[..., 2]
    e1 = rows[..., 3] * px + rows[..., 4] * py + rows[..., 5]
    e2 = rows[..., 6] * px + rows[..., 7] * py + rows[..., 8]
    esum = e0 + e1 + e2
    inv_esum = _safe_div(jnp.float32(1.0), esum)
    u0 = e0 * inv_esum
    u1 = e1 * inv_esum
    u2 = e2 * inv_esum

    def interp3(base):  # vec3 attribute at slots [base, base+9)
        return jnp.stack(
            [
                u0 * rows[..., base + 0] + u1 * rows[..., base + 3] + u2 * rows[..., base + 6],
                u0 * rows[..., base + 1] + u1 * rows[..., base + 4] + u2 * rows[..., base + 7],
                u0 * rows[..., base + 2] + u1 * rows[..., base + 5] + u2 * rows[..., base + 8],
            ],
            axis=-1,
        )

    world = interp3(ROW_WORLD)
    normal = interp3(ROW_NORMAL)
    uv_u = u0 * rows[..., ROW_UV] + u1 * rows[..., ROW_UV + 2] + u2 * rows[..., ROW_UV + 4]
    uv_v = u0 * rows[..., ROW_UV + 1] + u1 * rows[..., ROW_UV + 3] + u2 * rows[..., ROW_UV + 5]

    # Analytic UV screen derivatives: uv = N(p)/D(p), N and D linear in p.
    a0, a1, a2 = rows[..., 0], rows[..., 3], rows[..., 6]
    b0, b1, b2 = rows[..., 1], rows[..., 4], rows[..., 7]
    d_x = a0 + a1 + a2
    d_y = b0 + b1 + b2
    inv2 = inv_esum * inv_esum

    def duv(c0, c1, c2):
        n = e0 * c0 + e1 * c1 + e2 * c2
        nx = a0 * c0 + a1 * c1 + a2 * c2
        ny = b0 * c0 + b1 * c1 + b2 * c2
        return (nx * esum - n * d_x) * inv2, (ny * esum - n * d_y) * inv2

    du_dx, du_dy = duv(rows[..., ROW_UV], rows[..., ROW_UV + 2], rows[..., ROW_UV + 4])
    dv_dx, dv_dy = duv(rows[..., ROW_UV + 1], rows[..., ROW_UV + 3], rows[..., ROW_UV + 5])

    # --- texture sampling -------------------------------------------------
    trow = jax.lax.bitcast_convert_type(
        rows[..., ROW_TEXINFO : ROW_TEXINFO + TEX_ROW_WIDTH], jnp.int32
    )  # (H, W, 49)
    w0 = trow[..., 16].astype(jnp.float32)
    h0 = trow[..., 32].astype(jnp.float32)
    n_mips = trow[..., 48]

    rho2_x = (du_dx * w0) ** 2 + (dv_dx * h0) ** 2
    rho2_y = (du_dy * w0) ** 2 + (dv_dy * h0) ** 2
    rho2_max = jnp.maximum(rho2_x, rho2_y)

    def level_fields(lvl):
        off = _lane_select(trow[..., 0:16], lvl)
        tw = _lane_select(trow[..., 16:32], lvl)
        th = _lane_select(trow[..., 32:48], lvl)
        return off, tw, th

    def trilinear(u, v, rho2):
        lod = 0.5 * jnp.log2(jnp.maximum(rho2, 1e-24))
        lod = jnp.clip(lod, 0.0, (n_mips - 1).astype(jnp.float32))
        l0 = jnp.floor(lod).astype(jnp.int32)
        l1 = jnp.minimum(l0 + 1, n_mips - 1)
        tfrac = (lod - l0.astype(jnp.float32))[..., None]
        off0, tw0, th0 = level_fields(l0)
        _, tw1, th1 = level_fields(l1)
        return _trilerp(texels, off0, tw0, th0, tw1, th1, tfrac, u, v)

    if max_anisotropy <= 1:
        albedo = trilinear(uv_u, uv_v, rho2_max)
    else:
        # Anisotropic filtering (the reference's sampler requests
        # maxAnisotropy 16, src/Renderer.zig:515): N trilinear probes
        # spaced along the major-axis gradient, each at the minor-axis
        # footprint's lod — footprint-weighted like hardware aniso, with
        # a static probe count (N = max_anisotropy).
        n = int(max_anisotropy)
        major_is_x = rho2_x >= rho2_y
        maj_du = jnp.where(major_is_x, du_dx, du_dy)
        maj_dv = jnp.where(major_is_x, dv_dx, dv_dy)
        rho2_min = jnp.minimum(rho2_x, rho2_y)
        # Limit the sampled footprint to n probes' worth of the minor lod.
        acc = 0.0
        for i in range(n):
            f = (i + 0.5) / n - 0.5
            acc = acc + trilinear(uv_u + maj_du * f, uv_v + maj_dv * f, rho2_min)
        albedo = acc / n

    # --- basic.frag lighting ---------------------------------------------
    ldir = jnp.asarray(light_direction, dtype=jnp.float32)
    lcol = jnp.asarray(light_color, dtype=jnp.float32)
    n = normal * _rnorm(normal)
    view_dir = camera_position[None, None, :] - world
    v = view_dir * _rnorm(view_dir)

    n_dot_l = jnp.sum(n * ldir, axis=-1, keepdims=True)
    diffuse_amount = jnp.maximum(0.0, n_dot_l)
    r = 2.0 * n_dot_l * n - ldir  # reflect(-l, n)
    spec_amount = albedo[..., 3:4] * jnp.power(
        jnp.maximum(0.0, jnp.sum(v * r, axis=-1, keepdims=True)), specular_power
    )
    color = (ambient_amount + diffuse_amount) * lcol * albedo[..., :3] + spec_amount * lcol

    out = jnp.concatenate([color, jnp.ones_like(color[..., :1])], axis=-1)
    clear = jnp.asarray(clear_color, dtype=jnp.float32)
    return jnp.where(mask[..., None], out, clear[None, None, :])


def shade_gbuffer(
    gbuf,  # (T, A_OUT, N) f32 from kernels/resolve.py
    texels,  # (N, 16) linear quad-row atlas
    camera_position,  # (3,) f32
    *,
    light_direction,
    light_color,
    ambient_amount: float,
    specular_power: float,
    clear_color,
    max_anisotropy: int = 1,
):
    """Forward-path shading tail: the resolve kernel already interpolated
    everything per pixel, so this is just texture taps (the only remaining
    gathers: 2 quad rows per pixel for trilinear) + the basic.frag
    lighting — same formulas and op order as shade_deferred so the two
    paths match bit-for-bit. Operates in tile layout (T, N); detiling to
    (H, W) happens at present time.

    Returns (T, N, 4) f32 linear-color tiles.
    """

    def g(i):
        return gbuf[:, i, :]  # (T, N)

    mask = g(17) > 0.0
    world = jnp.stack([g(0), g(1), g(2)], axis=-1)  # (T, N, 3)
    normal = jnp.stack([g(3), g(4), g(5)], axis=-1)
    uv_u, uv_v = g(6), g(7)
    # Offsets rode through f32 as offset/256 (exact); widths/heights are
    # small integers in f32.
    off0 = g(8).astype(jnp.int32) * 256
    tw0 = g(9).astype(jnp.int32)
    th0 = g(10).astype(jnp.int32)
    tw1 = g(12).astype(jnp.int32)
    th1 = g(13).astype(jnp.int32)
    tfrac = g(14)[..., None]
    maj_du, maj_dv = g(15), g(16)

    def trilinear_at(u, v):
        return _trilerp(texels, off0, tw0, th0, tw1, th1, tfrac, u, v)

    if max_anisotropy <= 1:
        albedo = trilinear_at(uv_u, uv_v)
    else:
        n_probes = int(max_anisotropy)
        acc = 0.0
        for i in range(n_probes):
            f = (i + 0.5) / n_probes - 0.5
            acc = acc + trilinear_at(uv_u + maj_du * f, uv_v + maj_dv * f)
        albedo = acc / n_probes

    # --- basic.frag lighting (identical to shade_deferred) ----------------
    ldir = jnp.asarray(light_direction, dtype=jnp.float32)
    lcol = jnp.asarray(light_color, dtype=jnp.float32)
    n = normal * _rnorm(normal)
    view_dir = camera_position[None, None, :] - world
    v = view_dir * _rnorm(view_dir)

    n_dot_l = jnp.sum(n * ldir, axis=-1, keepdims=True)
    diffuse_amount = jnp.maximum(0.0, n_dot_l)
    r = 2.0 * n_dot_l * n - ldir  # reflect(-l, n)
    spec_amount = albedo[..., 3:4] * jnp.power(
        jnp.maximum(0.0, jnp.sum(v * r, axis=-1, keepdims=True)), specular_power
    )
    color = (ambient_amount + diffuse_amount) * lcol * albedo[..., :3] + spec_amount * lcol

    out = jnp.concatenate([color, jnp.ones_like(color[..., :1])], axis=-1)
    clear = jnp.asarray(clear_color, dtype=jnp.float32)
    return jnp.where(mask[..., None], out, clear[None, None, :])
