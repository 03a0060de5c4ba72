"""Windowed texture sampling: the TPU-native texture unit.

The gather path (kernels/shade.py) fetches one 52-float atlas row per
trilinear sample through XLA's dynamic-gather — ~7-76 ns per row
depending on table footprint. At 1080p that is 2M rows/frame, and on
scenes with multi-GB texture residency (the porsche class) the frame is
texture-gather bound at >100 ms. A GPU hides the same access pattern
behind its texture caches; the TPU equivalent built here makes the
cache EXPLICIT:

  1. PLAN (XLA, plan_tiles): per framebuffer tile, reduce the G-buffer
     (kernels/resolve.py planes) to up to N_SLOTS sampling jobs — each
     a (texture, mip level) pair with the texel bounding box of every
     pixel using it (bilinear + anisotropy probe extents included).
     Mip LOD selection guarantees ~1 texel per pixel, so a tile's
     footprint at its own mip is tile-sized: the bbox almost always
     fits a small static window. Each slot window is either the bbox
     (large mips, local footprint) or the WHOLE mip rect (small mips —
     covers fragmented UV islands and repeat-wrap seams outright).
     Tiles pick the cheap wide window class or the tall one; tiles
     fitting neither fall back to the gather path (counted).
  2. SAMPLE (Pallas, sample_tiles): per tile, DMA the slot windows
     from the texture page (device/pages.py) into VMEM, then select +
     bilinear-filter texels with tent-weight one-hot MXU contractions:

       weights C[r, i, c] = max(0, 1 - |i - x(r, c)|)   (rows, WW, tw)

     nonzero exactly at the two bilinear x-neighbors with exactly the
     bilinear weights, so one batched matmul  B = T . C  x-filters
     every pixel row against the window; a tent over WH rows
     y-filters on the VPU. Per-pixel HBM gathers are gone: texel
     traffic is the window DMA (O(tile footprint), contiguous), and
     selection runs at MXU rate.
  3. The basic.frag lighting + blend (kernels/shade.py formulas) run
     in-kernel on the G-buffer planes, so the kernel emits final
     linear framebuffer tiles and the XLA shading tail disappears.

Anisotropy (the reference sampler's maxAnisotropy 16,
src/Renderer.zig:515) loops trilinear probes along the major-gradient
axis INSIDE the kernel with a per-tile dynamic trip count = the tile's
worst ceil(anisotropy ratio): isotropic tiles pay one probe, grazing
tiles pay up to maxAnisotropy — data-dependent work with static
shapes, where the gather path pays max_anisotropy probes per pixel.

Numerics: pages store linear texels bf16 (2^-9 relative, under half a
u8 LSB through the shading chain; BASELINE budget is 1 LSB/channel);
tent weights ride the matmul in bf16 too. fx/fy/lod/tfrac come from
the same G-buffer planes as the gather path, and filtering uses the
same lerp op order as shade._trilerp.

Known limitation (tracked): tiles over dense small-triangle meshes
with fragmented UV atlases (e.g. the dragon mesh bound to a 2048^2
texture) have tile-wide UV bboxes at large mips — those need
per-raster-segment windows (triangle chunks are UV-local after a UV
sort), the planned phase-2 extension; they currently fall back.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpurast import kernels as _k
from tpurast.kernels import shade as _shade
from tpurast.kernels.resolve import A_OUT

# Window DMA origins must land on the page memref's tile grid (Mosaic
# slice constraint): origins round DOWN to ALIGN_* and the plan's fit
# test pays the exact per-tile remainder. The page packer
# (device/pages.py) aligns rect origins to this grid so whole-rect
# windows have zero slack.
ALIGN_Y = 16
ALIGN_X = 128

# Per-class, per-slot (rows, cols) of the VMEM texel windows.
# Class A (wide) fits near-axis-aligned mappings of a 32x128-px tile;
# class B (tall) fits y-major mappings and whole rects of <=126^2 mips.
N_SLOTS = 4
SHAPES_A = ((64, 384), (32, 256), (32, 256), (32, 256))
SHAPES_B = ((128, 256), (64, 256), (32, 256), (32, 256))

CLS_A = 0
CLS_B = 1
CLS_EMPTY = 2
CLS_RESIDUAL = 3


def plan_tiles(
    gbuf,  # (A_OUT, H, W) from resolve_gbuffer
    page_origins,  # (TEX, 16, 2) i32 rect (oy, ox) of texel (-1, -1)
    page_sizes,  # (TEX, 16, 2) i32 (w, h) per mip
    *,
    tiles_x: int,
    tiles_y: int,
    tile_h: int,
    tile_w: int,
    max_anisotropy: int = 1,
):
    """Per-tile slot plan (pure XLA reshape/reduce — no gathers).

    Slot assignment: single-texture tiles get slots = mip levels
    lmin..lmin+3 (covers lod spread <= 2 plus the parent level);
    two-texture tiles get two slots per texture (own+parent), which
    requires each texture's pixels to sit on one level. Anything else
    is residual.

    Returns per-tile arrays: cls, nprobe, slot tables (T*N_SLOTS):
    level, tex, window page origin + texel origin per class, and the
    residual accounting.
    """
    t_total = tiles_x * tiles_y
    big = jnp.float32(3.4e38)

    def tiled(plane):  # (H, W) -> (ty, th, tx, tw)
        return plane.reshape(tiles_y, tile_h, tiles_x, tile_w)

    def tmin(v, m):
        return jnp.min(jnp.where(m, v, big), axis=(1, 3)).reshape(-1)

    def tmax(v, m):
        return jnp.max(jnp.where(m, v, -big), axis=(1, 3)).reshape(-1)

    matched = tiled(gbuf[16] > 0.0)
    texid = tiled(gbuf[18])
    l0 = tiled(gbuf[19])
    u = tiled(gbuf[6])
    v = tiled(gbuf[7])
    tw0 = tiled(gbuf[9])
    th0 = tiled(gbuf[10])
    tw1 = tiled(gbuf[11])
    th1 = tiled(gbuf[12])
    span = tiled(gbuf[17])
    maj_du = tiled(gbuf[14])
    maj_dv = tiled(gbuf[15])

    covered = jnp.any(matched, axis=(1, 3)).reshape(-1)  # (T,)
    tex_lo = tmin(texid, matched)
    tex_hi = tmax(texid, matched)
    single_tex = tex_lo == tex_hi
    # Exactly-two-texture tiles: every pixel is lo or hi.
    mid_tex = matched & (texid != tex_lo.reshape(tiles_y, 1, tiles_x, 1)) & (
        texid != tex_hi.reshape(tiles_y, 1, tiles_x, 1)
    )
    two_tex = (~single_tex) & ~jnp.any(mid_tex, axis=(1, 3)).reshape(-1)

    # Per-tile probe count: worst ceil(anisotropy ratio) in the tile
    # (ratio = 1/(1-span), shade.aniso_footprint). Kernel and plan use
    # the SAME count for probe offsets.
    if max_anisotropy > 1:
        span_max = jnp.clip(tmax(span, matched), 0.0, 1.0 - 1e-6)
        ratio = 1.0 / (1.0 - span_max)
        nprobe = jnp.clip(
            jnp.ceil(ratio - 1e-4), 1, max_anisotropy
        ).astype(jnp.int32)
    else:
        nprobe = jnp.ones((t_total,), jnp.int32)
    npf = nprobe.astype(jnp.float32).reshape(tiles_y, 1, tiles_x, 1)

    # Probe extreme offsets in UV (same formula as the sampling loop):
    # fo = ((i+0.5)/n - 0.5) * span, extremes at i = 0, n-1.
    fo_ext = (0.5 - 0.5 / npf) * span
    du_ext = jnp.abs(maj_du) * fo_ext
    dv_ext = jnp.abs(maj_dv) * fo_ext

    # Integer texel coords (wrapped) of the bilinear anchor, per level
    # role. x0w in [0, w); the +1 bilinear neighbor rides the rect's
    # ghost border, so windows never need negative coords.
    def anchor(uu, ww, dd):
        lo = jnp.mod(jnp.floor((uu - dd) * ww - 0.5), jnp.maximum(ww, 1.0))
        hi = jnp.mod(jnp.floor((uu + dd) * ww - 0.5), jnp.maximum(ww, 1.0))
        return jnp.minimum(lo, hi), jnp.maximum(lo, hi)

    x0_lo, x0_hi = anchor(u, tw0, du_ext)
    y0_lo, y0_hi = anchor(v, th0, dv_ext)
    x1_lo, x1_hi = anchor(u, tw1, du_ext)
    y1_lo, y1_hi = anchor(v, th1, dv_ext)

    # Parent level per pixel: l1 = l0 + 1 except at the chain clamp
    # (resolve computes l1 = min(l0+1, n_mips-1)), where BOTH parent
    # dims equal the own dims (non-square chains can clamp one axis to
    # 1 while the other still halves).
    l1 = jnp.where((tw1 == tw0) & (th1 == th0), l0, l0 + 1.0)

    # Per-texture level ranges.
    tex_lo_b = tex_lo.reshape(tiles_y, 1, tiles_x, 1)
    tex_hi_b = tex_hi.reshape(tiles_y, 1, tiles_x, 1)
    ma = matched & (texid == tex_lo_b)
    mb = matched & (texid == tex_hi_b)
    la0, la1 = tmin(l0, ma), tmax(l0, ma)
    lb0, lb1 = tmin(l0, mb), tmax(l0, mb)

    single_ok = single_tex & (la1 - la0 <= 2.0)
    dual_ok = two_tex & (la1 == la0) & (lb1 == lb0)
    shape_ok = covered & (single_ok | dual_ok)

    # Slot tables: (T, N_SLOTS) level + texture id.
    def bcast(x):
        return x[:, None]

    slot_ids = jnp.arange(N_SLOTS, dtype=jnp.float32)[None, :]
    lvl_single = bcast(la0) + slot_ids
    tex_single = jnp.broadcast_to(bcast(tex_lo), (t_total, N_SLOTS))
    lvl_dual = jnp.concatenate(
        [bcast(la0), bcast(la0) + 1, bcast(lb0), bcast(lb0) + 1], axis=1
    )
    tex_dual = jnp.concatenate(
        [bcast(tex_lo), bcast(tex_lo), bcast(tex_hi), bcast(tex_hi)], axis=1
    )
    use_dual = bcast(dual_ok)
    slot_lvl = jnp.where(use_dual, lvl_dual, lvl_single)  # (T, S) f32
    slot_tex = jnp.where(use_dual, tex_dual, tex_single)

    tex_idx = jnp.clip(slot_tex, 0, page_origins.shape[0] - 1).astype(jnp.int32)
    n_page_mips = page_origins.shape[1]
    lvl_idx = jnp.clip(slot_lvl, 0, n_page_mips - 1).astype(jnp.int32)
    rect = page_origins[tex_idx, lvl_idx]  # (T, S, 2) = (oy, ox)
    rect_wh = page_sizes[tex_idx, lvl_idx]  # (T, S, 2) = (w, h)

    # Per-slot pixel bbox (own-level pixels at the slot's level union
    # parent-role pixels), in that level's texel coords.
    slot_xmin = jnp.zeros((t_total, N_SLOTS), jnp.float32)
    slot_xmax = jnp.zeros((t_total, N_SLOTS), jnp.float32)
    slot_ymin = jnp.zeros((t_total, N_SLOTS), jnp.float32)
    slot_ymax = jnp.zeros((t_total, N_SLOTS), jnp.float32)
    for j in range(N_SLOTS):
        lv = slot_lvl[:, j].reshape(tiles_y, 1, tiles_x, 1)
        tx = slot_tex[:, j].reshape(tiles_y, 1, tiles_x, 1)
        own = matched & (l0 == lv) & (texid == tx)
        par = matched & (l1 == lv) & (texid == tx)
        xmin = jnp.minimum(tmin(x0_lo, own), tmin(x1_lo, par))
        xmax = jnp.maximum(tmax(x0_hi, own), tmax(x1_hi, par))
        ymin = jnp.minimum(tmin(y0_lo, own), tmin(y1_lo, par))
        ymax = jnp.maximum(tmax(y0_hi, own), tmax(y1_hi, par))
        slot_xmin = slot_xmin.at[:, j].set(xmin)
        slot_xmax = slot_xmax.at[:, j].set(xmax)
        slot_ymin = slot_ymin.at[:, j].set(ymin)
        slot_ymax = slot_ymax.at[:, j].set(ymax)

    used = (slot_xmin <= slot_xmax) & (slot_ymin <= slot_ymax)
    tx0 = jnp.where(used, slot_xmin, 0.0).astype(jnp.int32)
    ty0 = jnp.where(used, slot_ymin, 0.0).astype(jnp.int32)
    oy_raw = rect[..., 0] + 1 + ty0
    ox_raw = rect[..., 1] + 1 + tx0
    dy = oy_raw % ALIGN_Y
    dx = ox_raw % ALIGN_X
    x_need = slot_xmax - slot_xmin + 2.0 + dx.astype(jnp.float32)
    y_need = slot_ymax - slot_ymin + 2.0 + dy.astype(jnp.float32)
    # Whole-rect alternative: window starts at the rect origin (texel
    # -1,-1; aligned by the packer, zero slack) and must contain the
    # full bordered rect. Handles fragmented-UV and wrap-seam tiles
    # whenever the mip is small enough.
    rect_x_need = (rect_wh[..., 0] + 2).astype(jnp.float32)
    rect_y_need = (rect_wh[..., 1] + 2).astype(jnp.float32)

    def class_tables(shapes):
        fit_all = covered & shape_ok
        w_oy = jnp.zeros((t_total, N_SLOTS), jnp.int32)
        w_ox = jnp.zeros((t_total, N_SLOTS), jnp.int32)
        t_y0 = jnp.zeros((t_total, N_SLOTS), jnp.int32)
        t_x0 = jnp.zeros((t_total, N_SLOTS), jnp.int32)
        for j, (wh, ww) in enumerate(shapes):
            bbox_fit = (x_need[:, j] <= ww) & (y_need[:, j] <= wh)
            rect_fit = (rect_x_need[:, j] <= ww) & (rect_y_need[:, j] <= wh)
            fit = (~used[:, j]) | bbox_fit | rect_fit
            fit_all = fit_all & fit
            pick_bbox = bbox_fit
            w_oy = w_oy.at[:, j].set(
                jnp.where(pick_bbox, oy_raw[:, j] - dy[:, j], rect[:, j, 0])
            )
            w_ox = w_ox.at[:, j].set(
                jnp.where(pick_bbox, ox_raw[:, j] - dx[:, j], rect[:, j, 1])
            )
            t_y0 = t_y0.at[:, j].set(
                jnp.where(pick_bbox, ty0[:, j] - dy[:, j], -1)
            )
            t_x0 = t_x0.at[:, j].set(
                jnp.where(pick_bbox, tx0[:, j] - dx[:, j], -1)
            )
        return fit_all, w_oy, w_ox, t_y0, t_x0

    fits_a, oy_a, ox_a, ty_a, tx_a = class_tables(SHAPES_A)
    fits_b, oy_b, ox_b, ty_b, tx_b = class_tables(SHAPES_B)

    cls = jnp.where(
        covered,
        jnp.where(fits_a, CLS_A, jnp.where(fits_b, CLS_B, CLS_RESIDUAL)),
        CLS_EMPTY,
    ).astype(jnp.int32)

    residual_tile = cls == CLS_RESIDUAL
    n_matched = jnp.sum(matched, axis=(1, 3)).reshape(-1)
    residual_px = jnp.sum(jnp.where(residual_tile, n_matched, 0))

    return {
        "cls": cls,
        "nprobe": nprobe,
        "slot_lvl": slot_lvl.astype(jnp.int32).reshape(-1),
        "slot_tex": slot_tex.astype(jnp.int32).reshape(-1),
        "oy_a": oy_a.reshape(-1),
        "ox_a": ox_a.reshape(-1),
        "ty_a": ty_a.reshape(-1),
        "tx_a": tx_a.reshape(-1),
        "oy_b": oy_b.reshape(-1),
        "ox_b": ox_b.reshape(-1),
        "ty_b": ty_b.reshape(-1),
        "tx_b": tx_b.reshape(-1),
        "residual_tile": residual_tile,
        "residual_px": residual_px,
    }


def _bilinear_slot(win, wh, ww, xrel, yrel, fx, fy, slot_mask, wdtype, sxy, sacc):
    """Sample window `win` (4, wh, ww) at per-pixel coords.

    xrel/yrel: window coords of the bilinear anchor, (th, tw) f32.
    fx/fy: bilinear fractions. slot_mask zeroes pixels outside this
    slot. Returns 4 planes (th, tw) f32 (zero where masked).

    x-filtering: batched MXU contraction with tent weights
      C[r, i, c] = max(0, 1 - |i - (xrel + fx)|)
    which places (1-fx, fx) at the two x-neighbors. y-filtering: tent
    over rows on the VPU. Weight placement and lerp order match
    shade._trilerp up to f32-vs-bf16 rounding.
    """
    th, tw = xrel.shape
    sxy[0] = jnp.where(slot_mask, xrel + fx, -2.0)
    sxy[1] = jnp.where(slot_mask, yrel + fy, -2.0)
    t4 = win.reshape(4 * wh, ww).astype(wdtype)
    # Pixel rows are processed in chunks so the (rows, ww, tw) tent
    # tensors stay small; a DYNAMIC ref-slicing loop makes Mosaic
    # reuse the chunk buffers (a static unroll stack-allocates every
    # iteration's temporaries and blows the 16 MB VMEM budget).
    rc = 8
    ix = jax.lax.broadcasted_iota(jnp.int32, (rc, ww, tw), 1).astype(jnp.float32)
    iy = jax.lax.broadcasted_iota(jnp.int32, (wh, rc, tw), 0).astype(jnp.float32)

    def chunk(i, _):
        r0 = pl.multiple_of(i * rc, rc)
        xc = sxy[0, pl.ds(r0, rc), :]
        yc = sxy[1, pl.ds(r0, rc), :]
        cw = jnp.maximum(0.0, 1.0 - jnp.abs(ix - xc[:, None, :]))
        # One batched contraction x-filters all 4 channels. Both
        # operands are explicitly bf16 (texels 2^-11 -> 2^-9, tent
        # weights 2^-9) so compiled MXU and interpret mode agree up
        # to accumulation order; f32 accumulation via
        # preferred_element_type.
        b = jax.lax.dot_general(
            t4,
            cw.astype(wdtype),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (4*wh, rc, tw)
        ry = jnp.maximum(0.0, 1.0 - jnp.abs(iy - yc[None, :, :]))
        b = b.reshape(4, wh, rc, tw)
        for c in range(4):
            sacc[c, pl.ds(r0, rc), :] = jnp.sum(b[c] * ry, axis=0)
        return 0

    jax.lax.fori_loop(0, th // rc, chunk, 0)
    return [sacc[c] for c in range(4)]


def _sample_class(
    g,
    wins,
    shapes,
    t,
    slot_lvl_ref,
    slot_tex_ref,
    ty0_ref,
    tx0_ref,
    nprobe_ref,
    *,
    tile_h,
    tile_w,
    max_anisotropy,
    wdtype,
    sxy,
    sacc,
):
    """Shared per-class sampling body: returns albedo planes [r,g,b,a]."""
    matched = g[16] > 0.0
    u, v = g[6], g[7]
    tw0, th0 = g[9], g[10]
    tw1, th1 = g[11], g[12]
    tfrac = g[13]
    maj_du, maj_dv = g[14], g[15]
    span = g[17]
    texid = g[18]
    l0 = g[19]
    l1 = jnp.where((tw1 == tw0) & (th1 == th0), l0, l0 + 1.0)
    np_t = nprobe_ref[t]
    npf = np_t.astype(jnp.float32)

    def probe_body(i, acc):
        fo = ((i.astype(jnp.float32) + 0.5) / npf - 0.5) * span
        up = u + maj_du * fo
        vp = v + maj_dv * fo
        own_acc = [jnp.zeros((tile_h, tile_w), jnp.float32)] * 4
        par_acc = [jnp.zeros((tile_h, tile_w), jnp.float32)] * 4
        for j, (wh, ww) in enumerate(shapes):
            lvl_j = slot_lvl_ref[t * N_SLOTS + j].astype(jnp.float32)
            tex_j = slot_tex_ref[t * N_SLOTS + j].astype(jnp.float32)
            tex_ok = matched & (texid == tex_j)
            own_j = tex_ok & (l0 == lvl_j)
            par_j = tex_ok & (l1 == lvl_j)
            any_role = own_j | par_j
            # Own-level coords where this slot is the pixel's l0, else
            # parent coords (roles coincide at the mip chain clamp,
            # where the coords are equal anyway).
            ww_sel = jnp.where(own_j, tw0, tw1)
            hh_sel = jnp.where(own_j, th0, th1)
            x = up * ww_sel - 0.5
            yy = vp * hh_sel - 0.5
            x0 = jnp.floor(x)
            y0 = jnp.floor(yy)
            fx = x - x0
            fy = yy - y0
            x0w = jnp.mod(x0, jnp.maximum(ww_sel, 1.0))
            y0w = jnp.mod(y0, jnp.maximum(hh_sel, 1.0))
            xrel = x0w - tx0_ref[t * N_SLOTS + j].astype(jnp.float32)
            yrel = y0w - ty0_ref[t * N_SLOTS + j].astype(jnp.float32)
            planes = _bilinear_slot(
                wins[j][...], wh, ww, xrel, yrel, fx, fy, any_role,
                wdtype, sxy, sacc,
            )
            for c in range(4):
                own_acc[c] = own_acc[c] + jnp.where(own_j, planes[c], 0.0)
                par_acc[c] = par_acc[c] + jnp.where(par_j, planes[c], 0.0)
        t_i = 1.0 - tfrac
        return [
            a + (o * t_i + p * tfrac)
            for a, o, p in zip(acc, own_acc, par_acc)
        ]

    zero = [jnp.zeros((tile_h, tile_w), jnp.float32)] * 4
    if max_anisotropy > 1:
        albedo = jax.lax.fori_loop(0, np_t, probe_body, zero)
        return [a / npf for a in albedo]
    return probe_body(jnp.int32(0), zero)


def _sampler_kernel(
    # scalar prefetch
    cls_ref,  # (T,) i32
    nprobe_ref,  # (T,) i32
    slot_lvl_ref,  # (T*S,) i32
    slot_tex_ref,  # (T*S,) i32
    oy_a_ref,
    ox_a_ref,
    ty_a_ref,
    tx_a_ref,
    oy_b_ref,
    ox_b_ref,
    ty_b_ref,
    tx_b_ref,
    # inputs
    gbuf_ref,  # VMEM (A_OUT, th, tw)
    cam_ref,  # VMEM (1, 3) f32 camera position
    page_ref,  # ANY (4, PH, PW)
    # output
    out_ref,  # VMEM (4, th, tw) linear color
    # scratch
    wa0,
    wa1,
    wa2,
    wa3,
    wb0,
    wb1,
    wb2,
    wb3,
    sxy,
    sacc,
    sem,
    *,
    tile_h: int,
    tile_w: int,
    max_anisotropy: int,
    wdtype,
    light_direction,
    light_color,
    ambient_amount: float,
    specular_power: float,
    clear_color,
    blend: str,
):
    t = pl.program_id(0)
    cls = cls_ref[t]
    wins_a = (wa0, wa1, wa2, wa3)
    wins_b = (wb0, wb1, wb2, wb3)

    def shade_out(albedo):
        g = gbuf_ref
        matched = g[16] > 0.0
        cam = cam_ref[0, :]
        rgb = _shade._light_planes(
            albedo,
            [g[0], g[1], g[2]],
            [g[3], g[4], g[5]],
            cam,
            light_direction=light_direction,
            light_color=light_color,
            ambient_amount=ambient_amount,
            specular_power=specular_power,
        )
        planes = _shade.blend_planes(
            rgb, jnp.float32(1.0), matched, clear_color, blend
        )
        for c in range(4):
            out_ref[c] = planes[c]

    def run_class(which, wins, shapes, oy_ref, ox_ref, ty_ref, tx_ref):
        @pl.when(cls == which)
        def _():
            copies = []
            for j, (wh, ww) in enumerate(shapes):
                # Origins are ALIGN-multiples by construction
                # (plan_tiles); multiple_of makes that provable to
                # Mosaic's slice checker.
                oy = pl.multiple_of(oy_ref[t * N_SLOTS + j], ALIGN_Y)
                ox = pl.multiple_of(ox_ref[t * N_SLOTS + j], ALIGN_X)
                c = pltpu.make_async_copy(
                    page_ref.at[:, pl.ds(oy, wh), pl.ds(ox, ww)],
                    wins[j],
                    sem.at[j],
                )
                c.start()
                copies.append(c)
            for c in copies:
                c.wait()
            albedo = _sample_class(
                gbuf_ref,
                wins,
                shapes,
                t,
                slot_lvl_ref,
                slot_tex_ref,
                ty_ref,
                tx_ref,
                nprobe_ref,
                tile_h=tile_h,
                tile_w=tile_w,
                max_anisotropy=max_anisotropy,
                wdtype=wdtype,
                sxy=sxy,
                sacc=sacc,
            )
            shade_out(albedo)

    run_class(CLS_A, wins_a, SHAPES_A, oy_a_ref, ox_a_ref, ty_a_ref, tx_a_ref)
    run_class(CLS_B, wins_b, SHAPES_B, oy_b_ref, ox_b_ref, ty_b_ref, tx_b_ref)

    @pl.when(cls >= CLS_EMPTY)
    def _other():
        # Empty tiles show the clear color; residual tiles are
        # overwritten by the XLA fallback combine (renderer).
        for c in range(4):
            out_ref[c] = jnp.full(
                (tile_h, tile_w), jnp.float32(clear_color[c]), jnp.float32
            )


def sample_tiles(
    gbuf,  # (A_OUT, H, W)
    page,  # (4, PH, PW) bf16
    plan,  # from plan_tiles
    camera_position,  # (3,) f32
    *,
    tiles_x: int,
    tiles_y: int,
    tile_h: int,
    tile_w: int,
    max_anisotropy: int,
    light_direction,
    light_color,
    ambient_amount: float,
    specular_power: float,
    clear_color,
    blend: str = "alpha",
):
    """Run the windowed sampler over all tiles.

    Returns (4, H, W) f32 linear framebuffer; residual-class tiles
    hold the clear color and must be overlaid by the gather fallback.
    """
    t_total = tiles_x * tiles_y
    h = tiles_y * tile_h
    w = tiles_x * tile_w
    wdtype = jnp.bfloat16

    kernel = functools.partial(
        _sampler_kernel,
        tile_h=tile_h,
        tile_w=tile_w,
        max_anisotropy=max_anisotropy,
        wdtype=wdtype,
        light_direction=light_direction,
        light_color=light_color,
        ambient_amount=ambient_amount,
        specular_power=specular_power,
        clear_color=clear_color,
        blend=blend,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=12,
        grid=(t_total,),
        in_specs=[
            pl.BlockSpec(
                (A_OUT, tile_h, tile_w),
                lambda g, *_: (0, g // tiles_x, g % tiles_x),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 3), lambda g, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(
                (4, tile_h, tile_w),
                lambda g, *_: (0, g // tiles_x, g % tiles_x),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((4,) + SHAPES_A[0], page.dtype),
            pltpu.VMEM((4,) + SHAPES_A[1], page.dtype),
            pltpu.VMEM((4,) + SHAPES_A[2], page.dtype),
            pltpu.VMEM((4,) + SHAPES_A[3], page.dtype),
            pltpu.VMEM((4,) + SHAPES_B[0], page.dtype),
            pltpu.VMEM((4,) + SHAPES_B[1], page.dtype),
            pltpu.VMEM((4,) + SHAPES_B[2], page.dtype),
            pltpu.VMEM((4,) + SHAPES_B[3], page.dtype),
            pltpu.VMEM((2, tile_h, tile_w), jnp.float32),
            pltpu.VMEM((4, tile_h, tile_w), jnp.float32),
            pltpu.SemaphoreType.DMA((N_SLOTS,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((4, h, w), jnp.float32)],
        interpret=_k.interpret_mode(),
    )(
        plan["cls"],
        plan["nprobe"],
        plan["slot_lvl"],
        plan["slot_tex"],
        plan["oy_a"],
        plan["ox_a"],
        plan["ty_a"],
        plan["tx_a"],
        plan["oy_b"],
        plan["ox_b"],
        plan["ty_b"],
        plan["tx_b"],
        gbuf,
        camera_position.reshape(1, 3),
        page,
    )[0]
