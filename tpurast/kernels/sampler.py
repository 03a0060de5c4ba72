"""Windowed texture sampling: the TPU-native texture unit.

The gather path (kernels/shade.py) fetches one 52-float atlas row per
trilinear sample through XLA's dynamic-gather — ~7-76 ns per row
depending on table footprint. At 1080p that is 2M rows/frame, and on
scenes with multi-GB texture residency (the porsche class) the frame is
texture-gather bound at >100 ms. A GPU hides the same access pattern
behind its texture caches; the TPU equivalent built here makes the
cache EXPLICIT:

  1. PLAN (XLA, plan_tiles): per framebuffer tile, reduce the G-buffer
     (kernels/resolve.py planes) to up to K sampling slots, each one
     fixed-shape (WH, WW) texel window of some (texture, mip) rect,
     placed by GREEDY BANDED COVERING: each round seeds at the
     top-left-most uncovered anchor of the lowest uncovered (tex, mip)
     key, opens a window band there, and absorbs every pixel whose
     whole anchor range (bilinear + anisotropy-probe extremes) fits
     the window. Mips whose entire rect fits one window are covered
     whole — one window serves any number of UV islands and wrap
     seams. Fragmented atlases cost extra windows only when a tile's
     footprint is genuinely scattered; rotated mappings split across
     y-bands whose x origin tracks the strip. Mip LOD selection keeps
     texels:pixel in [1, 2) at the own level and <= 1 at the parent,
     so footprints are ~tile-sized per level.
     The plan emits per-pixel ASSIGNMENT PLANES (own/parent slot
     index): assignment decisions are made ONCE in XLA and shipped to
     the kernel, so plan and kernel can never disagree about which
     window serves a pixel (the arithmetic is not re-derived under a
     different compiler). Tiles needing more than K2 windows fall back
     to the gather path (counted as window_miss_px); tiles needing
     more than K (but <= K2) run a second kernel wave that re-DMAs
     slots [K, K2) into the same VMEM scratch.
  2. SAMPLE (Pallas, sample_tiles): per tile, DMA the planned windows
     from the texture page (device/pages.py) into VMEM — a DYNAMIC
     trip-count loop runs only the windows the tile actually uses —
     then select + bilinear-filter texels with tent-weight one-hot MXU
     contractions:

       weights C[r, i, c] = max(0, 1 - |i - x(r, c)|)   (RC, WW, tw)

     nonzero exactly at the two bilinear x-neighbors with exactly the
     bilinear weights, so one batched matmul  B = T . C  x-filters
     every pixel row against the window; a tent over the band rows
     y-filters on the VPU. The contraction cost is 4*rows*WW MACs per
     pixel, so the kernel walks RC-row pixel chunks and, per chunk,
     runs EXACTLY the slots that chunk references (the plan packs a
     dense per-chunk slot list) against ONLY a YB-row band of the
     window the plan proves sufficient — ~n_used*WH/YB fewer MACs
     than filtering every chunk against every slot's full window.
     Per-pixel HBM gathers are gone: texel traffic is the window DMA
     (O(tile footprint), contiguous), and selection runs at MXU rate.
  3. The basic.frag lighting + blend (kernels/shade.py formulas) run
     in-kernel on the G-buffer planes, so the kernel emits final
     linear framebuffer tiles and the XLA shading tail disappears.

Anisotropy (the reference sampler's maxAnisotropy 16,
src/Renderer.zig:515) loops trilinear probes along the major-gradient
axis INSIDE the kernel with a per-tile dynamic trip count = the tile's
worst ceil(anisotropy ratio): isotropic tiles pay one probe, grazing
tiles pay up to maxAnisotropy — data-dependent work with static
shapes, where the gather path pays max_anisotropy probes per pixel.
Probe anchors stay inside the assigned window because the plan's
coverage test uses the probe-extreme anchor range (with a 1-texel
safety margin against cross-compiler f32 rounding).

Numerics: pages store linear texels bf16 (2^-9 relative, under half a
u8 LSB through the shading chain; BASELINE budget is 1 LSB/channel);
tent weights ride the matmul in bf16 too. fx/fy/lod/tfrac come from
the same G-buffer planes as the gather path, and filtering uses the
same lerp op order as shade._trilerp.
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

# Window DMA origins must land on Mosaic's slice grid for the page
# memref (measured on v5e: sublane multiples of 8, lane multiples of
# 128): origins round DOWN to ALIGN_* and the plan pays the per-window
# remainder out of the covered anchor range.
ALIGN_Y = 8
ALIGN_X = 128

# Uniform window shape (rows, cols) and slot budget. COV_* is the
# anchor range one window covers after worst-case alignment slack, the
# +1 bilinear neighbor, and a 1-texel safety margin (plan coverage is
# decided in XLA, per-probe anchors are recomputed under Mosaic — the
# margin absorbs any cross-compiler f32 rounding at floor boundaries).
WH = 96
WW = 384
K = 16  # RESIDENT window slots (one VMEM wave)
# Total plan slots per tile: tiles needing more than K windows run a
# second kernel wave that re-DMAs slots [K, K2) into the same scratch —
# scattered-UV-island tiles (the porsche car body wants 15-24 windows)
# stay on the windowed path instead of falling back to per-pixel
# gathers. Only tiles with n_used > K pay the second wave.
K2 = 32
COV_Y = WH - ALIGN_Y - 1  # 87
COV_X = WW - ALIGN_X - 1  # 255

CLS_WINDOWED = 0
CLS_EMPTY = 2
CLS_RESIDUAL = 3

# Kernel blocking: pixel rows per chunk (sublane-sized) and window rows
# per selection band. The x-filter contraction costs 4*rows*WW MACs per
# pixel, so contracting a YB-row band the plan proves sufficient —
# instead of all WH rows — cuts the dominant matmul 3x; chunks whose
# span can't fit one band (wrapped small-rect seams, extreme aniso
# spreads) run WH//YB disjoint bands, which sums to the identical
# result (tent weights are evaluated against absolute window rows, so
# rows outside a pixel's 2-row support contribute exact zeros).
RC = 16
YB = 48



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
    """Per-tile window plan (pure XLA reshape/reduce — no big gathers).

    Returns per-tile arrays (cls, nprobe, n_used), flat (T*K,) slot
    tables (window page origin oy/ox + window texel origin tyo/txo),
    per-pixel assignment planes assign (2, H, W) f32 (own slot index,
    parent slot index; -1 = none), and the residual accounting.
    """
    t_total = tiles_x * tiles_y
    big = jnp.float32(3.4e38)

    def tiled(plane):  # (H, W) -> (ty, th, tx, tw)
        return plane.reshape(tiles_y, tile_h, tiles_x, tile_w)

    def tmin(v, m):
        return jnp.min(jnp.where(m, v, big), axis=(1, 3)).reshape(-1)

    def tmax(v, m):
        return jnp.max(jnp.where(m, v, -big), axis=(1, 3)).reshape(-1)

    def bt(x):  # (T,) -> broadcastable over tile pixels
        return x.reshape(tiles_y, 1, tiles_x, 1)

    matched = tiled(gbuf[16] > 0.0)
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
    # role, at the probe extremes. The +1 bilinear neighbor rides the
    # window's extra col/row (see COV_*).
    def anchor(uu, ww, dd):
        lo = jnp.mod(jnp.floor((uu - dd) * ww - 0.5), jnp.maximum(ww, 1.0))
        hi = jnp.mod(jnp.floor((uu + dd) * ww - 0.5), jnp.maximum(ww, 1.0))
        return jnp.minimum(lo, hi), jnp.maximum(lo, hi)

    # Anchor extremes in PAGE coordinates: wrapped texel coords + the
    # pixel's own/parent page-rect base (resolve planes 20..23). One
    # coordinate system across every (texture, mip) means a window
    # absorbs ANY pixel whose range fits it — adjacent rects (small
    # mips, neighboring chain levels) share windows for free, and the
    # covering needs no per-key logic at all.
    b_oy0, b_ox0 = tiled(gbuf[20]), tiled(gbuf[21])
    b_oy1, b_ox1 = tiled(gbuf[22]), tiled(gbuf[23])
    xo_lo, xo_hi = anchor(u, tw0, du_ext)
    yo_lo, yo_hi = anchor(v, th0, dv_ext)
    xp_lo, xp_hi = anchor(u, tw1, du_ext)
    yp_lo, yp_hi = anchor(v, th1, dv_ext)
    xo_lo, xo_hi = xo_lo + b_ox0, xo_hi + b_ox0
    yo_lo, yo_hi = yo_lo + b_oy0, yo_hi + b_oy0
    xp_lo, xp_hi = xp_lo + b_ox1, xp_hi + b_ox1
    yp_lo, yp_hi = yp_lo + b_oy1, yp_hi + b_oy1

    # ---- greedy banded covering: K rounds ---------------------------------
    # Each round seeds a window at the topmost (then leftmost) uncovered
    # anchor and absorbs every pixel role whose whole anchor range fits.
    todo_o = matched
    todo_p = matched
    assign_o = jnp.full((tiles_y, tile_h, tiles_x, tile_w), -1.0)
    assign_p = jnp.full((tiles_y, tile_h, tiles_x, tile_w), -1.0)
    slot_used, slot_ty, slot_tx = [], [], []
    # The kernel computes ONE coordinate set per (pixel, slot), own
    # coords taking precedence — so a pixel may hold own AND parent
    # roles in the same slot only where the coords coincide (the mip
    # chain clamp, where resolve sets l1 = l0). Elsewhere a shared
    # window defers the parent role to a later round.
    share_ok = (tw1 == tw0) & (th1 == th0)
    for s in range(K2):
        ymin = jnp.minimum(tmin(yo_lo, todo_o), tmin(yp_lo, todo_p))  # (T,)
        got = ymin < big * 0.5
        band_o = todo_o & (yo_hi < bt(ymin) + COV_Y)
        band_p = todo_p & (yp_hi < bt(ymin) + COV_Y)
        xmin = jnp.minimum(tmin(xo_lo, band_o), tmin(xp_lo, band_p))
        win_o = band_o & (xo_hi < bt(xmin) + COV_X)
        win_p = band_p & (xp_hi < bt(xmin) + COV_X)
        win_p = win_p & (~win_o | share_ok)
        sf = jnp.float32(s)
        assign_o = jnp.where(win_o, sf, assign_o)
        assign_p = jnp.where(win_p, sf, assign_p)
        todo_o = todo_o & ~win_o
        todo_p = todo_p & ~win_p
        slot_used.append(got)
        slot_ty.append(jnp.where(got, ymin, 0.0))
        slot_tx.append(jnp.where(got, xmin, 0.0))
    leftover = jnp.any(todo_o | todo_p, axis=(1, 3)).reshape(-1)
    fits = covered & ~leftover

    used = jnp.stack(slot_used, axis=1)  # (T, K)
    s_ty = jnp.stack(slot_ty, axis=1)  # (T, K) page coords of the seed
    s_tx = jnp.stack(slot_tx, axis=1)
    # Window origin: seed anchor aligned DOWN to the DMA slice grid (the
    # COV_* coverage bounds already pay for the worst alignment slack).
    slot_oy = s_ty - s_ty % ALIGN_Y
    slot_ox = s_tx - s_tx % ALIGN_X
    n_used = jnp.sum(used, axis=1).astype(jnp.int32)

    cls = jnp.where(
        covered,
        jnp.where(fits, CLS_WINDOWED, CLS_RESIDUAL),
        CLS_EMPTY,
    ).astype(jnp.int32)

    residual_tile = cls == CLS_RESIDUAL
    n_matched = jnp.sum(matched, axis=(1, 3)).reshape(-1)
    residual_px = jnp.sum(jnp.where(residual_tile, n_matched, 0))

    # ---- per-chunk slot lists + selection bands ---------------------------
    # The kernel walks pixel rows in chunks of RC; per (tile, chunk) the
    # plan packs the slots actually referenced by that chunk's pixels
    # (dense list + count, so the kernel's slot loop runs EXACTLY the
    # used slots — no cond, no masked wasted matmuls) and a y-band
    # [band0, band0 + nb*YB) of the window that contains every
    # referenced texel row, so the MXU contraction reads YB window rows
    # instead of WH. Bands cover all probe extremes (same yo/yp ranges
    # the covering used), so the kernel never reads outside its band.
    nc = tile_h // RC

    def chunked(plane4):  # (ty, th, tx, tw) -> (ty, NC, RC, tx, tw)
        return plane4.reshape(tiles_y, nc, RC, tiles_x, tile_w)

    def cmin(v, m):  # masked min over a chunk -> (ty, NC, tx)
        return jnp.min(jnp.where(m, v, big), axis=(2, 4))

    def cmax(v, m):
        return jnp.max(jnp.where(m, v, -big), axis=(2, 4))

    ao_c = chunked(assign_o)
    ap_c = chunked(assign_p)
    yol_c, yoh_c = chunked(yo_lo), chunked(yo_hi)
    ypl_c, yph_c = chunked(yp_lo), chunked(yp_hi)
    c_used, c_jid, c_b0, c_nb = [], [], [], []
    oy_tk = slot_oy.reshape(tiles_y, tiles_x, K2)
    for j in range(K2):
        own_j = ao_c == float(j)
        par_j = ap_c == float(j)
        use_j = jnp.any(own_j | par_j, axis=(2, 4))  # (ty, NC, tx)
        lo = jnp.minimum(cmin(yol_c, own_j), cmin(ypl_c, par_j))
        hi = jnp.maximum(cmax(yoh_c, own_j), cmax(yph_c, par_j))
        oy_j = oy_tk[:, :, j].astype(jnp.float32)  # (ty, tx) page coords
        rel_lo = lo - oy_j[:, None, :]
        rel_hi = hi - oy_j[:, None, :] + 1.0  # +1 bilinear row neighbor
        b0 = jnp.clip(jnp.floor(rel_lo / ALIGN_Y) * ALIGN_Y, 0.0, WH - YB)
        fits1 = rel_hi < b0 + YB
        c_used.append(use_j)
        c_jid.append(jnp.full_like(use_j, j, dtype=jnp.int32))
        c_b0.append(jnp.where(fits1, b0, 0.0).astype(jnp.int32))
        c_nb.append(jnp.where(fits1, 1, WH // YB).astype(jnp.int32))
    cu = jnp.stack(c_used, axis=-1)  # (ty, NC, tx, K2)
    cjid = jnp.stack(c_jid, axis=-1)
    cb0 = jnp.stack(c_b0, axis=-1)
    cnb = jnp.stack(c_nb, axis=-1)
    # Pack used slots densely (ascending j) via one tiny sort along K2.
    sort_key = jnp.where(cu, cjid, K2).astype(jnp.int32)
    _, p_jid, p_b0, p_nb = jax.lax.sort(
        (sort_key, cjid, cb0, cnb), num_keys=1
    )
    chunk_cnt = jnp.sum(cu, axis=-1).astype(jnp.int32)  # (ty, NC, tx)
    # Slots below K are wave-0 (resident); the ascending pack puts them
    # first, so the kernel's wave split is just this count.
    chunk_cnt0 = jnp.sum(cu & (cjid < K), axis=-1).astype(jnp.int32)

    def chunk_flat(x):  # (ty, NC, tx, ...) -> (T * NC * ...), tile-major
        return jnp.swapaxes(x, 1, 2).reshape(-1).astype(jnp.int32)

    h = tiles_y * tile_h
    w = tiles_x * tile_w
    assign = jnp.stack(
        [
            assign_o.reshape(h, w),
            assign_p.reshape(h, w),
        ],
        axis=0,
    )

    def flat_i32(x):
        return x.astype(jnp.int32).reshape(-1)

    return {
        "cls": cls,
        "nprobe": nprobe,
        "n_used": n_used,
        "slot_oy": flat_i32(slot_oy),
        "slot_ox": flat_i32(slot_ox),
        "chunk_cnt": chunk_flat(chunk_cnt),
        "chunk_cnt0": chunk_flat(chunk_cnt0),
        "chunk_jid": chunk_flat(p_jid),
        "chunk_b0": chunk_flat(p_b0),
        "chunk_nb": chunk_flat(p_nb),
        "assign": assign,
        "residual_tile": residual_tile,
        "residual_px": residual_px,
    }


def _bilinear_chunk(win, j, b0, nb, xsel, ysel, wdtype, ix):
    """Bilinear-sample window slot `j` for one RC-row pixel chunk.

    xsel/ysel: per-pixel window-coordinate sample positions
    (anchor + fraction), (RC, tw) f32, -2.0 where the pixel does not
    reference this slot (tent weights vanish there). b0/nb: the plan's
    selection band — rows [b0, b0 + nb*YB) of the window contain every
    referenced texel row. Returns 4 planes (RC, tw) f32.

    x-filtering: batched MXU contraction with tent weights
      C[r, i, c] = max(0, 1 - |i - xsel(r, c)|)
    which places (1-fx, fx) at the two x-neighbors. y-filtering: tent
    over the band rows on the VPU, against ABSOLUTE window row indices
    (bands are disjoint, so multi-band sums add exact zeros). Weight
    placement and lerp order match shade._trilerp up to f32-vs-bf16
    rounding.
    """
    tw = xsel.shape[1]
    cw = jnp.maximum(0.0, 1.0 - jnp.abs(ix - xsel[:, None, :])).astype(wdtype)
    iy = jax.lax.broadcasted_iota(jnp.int32, (YB, RC, tw), 0).astype(jnp.float32)

    def band(k, p4):
        start = pl.multiple_of(b0 + k * YB, ALIGN_Y)
        tband = win[j, :, pl.ds(start, YB), :].reshape(4 * YB, WW).astype(wdtype)
        # One batched contraction x-filters all 4 channels. Both
        # operands are explicitly bf16 (texels 2^-11 -> 2^-9, tent
        # weights 2^-9) so compiled MXU and interpret mode agree up
        # to accumulation order; f32 accumulation via
        # preferred_element_type.
        b = jax.lax.dot_general(
            tband,
            cw,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(4, YB, RC, tw)
        ry = jnp.maximum(
            0.0, 1.0 - jnp.abs(iy + start.astype(jnp.float32) - ysel[None, :, :])
        )
        return [p4[c] + jnp.sum(b[c] * ry, axis=0) for c in range(4)]

    zero = [jnp.zeros((RC, tw), jnp.float32)] * 4
    return jax.lax.fori_loop(0, nb, band, zero)


def _sampler_kernel(
    # scalar prefetch
    cls_ref,  # (T,) i32
    nprobe_ref,  # (T,) i32
    n_used_ref,  # (T,) i32
    oy_ref,  # (T*K2,) i32 window page origin (DMA-aligned)
    ox_ref,
    cnt_ref,  # (T*NC,) i32 used-slot count per pixel chunk
    cnt0_ref,  # (T*NC,) i32 count of wave-0 slots (jid < K) per chunk
    jid_ref,  # (T*NC*K2,) i32 dense used-slot ids per chunk (ascending)
    b0_ref,  # (T*NC*K2,) i32 selection band start row
    nb_ref,  # (T*NC*K2,) i32 selection band count
    # inputs
    gbuf_ref,  # VMEM (A_OUT, th, tw)
    assign_ref,  # VMEM (2, th, tw) f32 own/parent slot index
    cam_ref,  # VMEM (1, 3) f32 camera position
    page_ref,  # ANY (4, PH, PW)
    # output
    out_ref,  # VMEM (4, th, tw) linear color
    # scratch
    win,  # VMEM (K, 4, WH, WW) — resident slots of the CURRENT wave
    sacc,  # VMEM (8, th, tw) f32 own/parent probe sums
    sem,  # DMA sem (K,)
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

    @pl.when(cls == CLS_WINDOWED)
    def _windowed():
        n = n_used_ref[t]
        g = gbuf_ref
        np_t = nprobe_ref[t]
        npf = np_t.astype(jnp.float32)
        nc = tile_h // RC
        ix = jax.lax.broadcasted_iota(
            jnp.int32, (RC, WW, tile_w), 1
        ).astype(jnp.float32)

        for c in range(8):
            sacc[c] = jnp.zeros((tile_h, tile_w), jnp.float32)

        def wave_pass(wave: int):
            # Slots [wave*K, min(n, wave*K + K)) resident this wave.
            j_lo = wave * K

            def dma_start(j, _):
                oy = pl.multiple_of(oy_ref[t * K2 + j], ALIGN_Y)
                ox = pl.multiple_of(ox_ref[t * K2 + j], ALIGN_X)
                pltpu.make_async_copy(
                    page_ref.at[:, pl.ds(oy, WH), pl.ds(ox, WW)],
                    win.at[j - j_lo],
                    sem.at[j - j_lo],
                ).start()
                return 0

            j_hi = jnp.minimum(n, j_lo + K)
            jax.lax.fori_loop(j_lo, j_hi, dma_start, 0)

            def dma_wait(j, _):
                pltpu.make_async_copy(
                    page_ref.at[:, pl.ds(0, WH), pl.ds(0, WW)],
                    win.at[j - j_lo],
                    sem.at[j - j_lo],
                ).wait()
                return 0

            jax.lax.fori_loop(j_lo, j_hi, dma_wait, 0)

            def chunk_body(ci, _):
                r0 = pl.multiple_of(ci * RC, RC)
                rows = pl.ds(r0, RC)
                u, v = g[6, rows, :], g[7, rows, :]
                tw0, th0 = g[9, rows, :], g[10, rows, :]
                tw1, th1 = g[11, rows, :], g[12, rows, :]
                maj_du, maj_dv = g[14, rows, :], g[15, rows, :]
                span = g[17, rows, :]
                b_oy0, b_ox0 = g[20, rows, :], g[21, rows, :]
                b_oy1, b_ox1 = g[22, rows, :], g[23, rows, :]
                assign_o = assign_ref[0, rows, :]
                assign_p = assign_ref[1, rows, :]
                cbase = t * nc + ci
                # This wave's span of the chunk's ascending slot list.
                k_lo = jnp.int32(0) if wave == 0 else cnt0_ref[cbase]
                k_hi = cnt0_ref[cbase] if wave == 0 else cnt_ref[cbase]

                def probe_body(i, acc):
                    fo = ((i.astype(jnp.float32) + 0.5) / npf - 0.5) * span
                    up = u + maj_du * fo
                    vp = v + maj_dv * fo

                    def slot_body(k, sacc8):
                        # The plan's dense used-slot list: the loop trip
                        # count is EXACTLY the slots this chunk references.
                        e = cbase * K2 + k
                        j = jid_ref[e]
                        jf = j.astype(jnp.float32)
                        oy_j = oy_ref[t * K2 + j].astype(jnp.float32)
                        ox_j = ox_ref[t * K2 + j].astype(jnp.float32)
                        own_j = assign_o == jf
                        par_j = assign_p == jf
                        m = own_j | par_j
                        # Own-level coords where this slot is the pixel's
                        # l0, else parent coords (roles coincide at the mip
                        # chain clamp, where the coords are equal anyway).
                        # Wrapped texel coords + the level's page base give
                        # PAGE coords; window coords = page - window origin.
                        ww_sel = jnp.where(own_j, tw0, tw1)
                        hh_sel = jnp.where(own_j, th0, th1)
                        bx_sel = jnp.where(own_j, b_ox0, b_ox1)
                        by_sel = jnp.where(own_j, b_oy0, b_oy1)
                        x = up * ww_sel - 0.5
                        yy = vp * hh_sel - 0.5
                        x0 = jnp.floor(x)
                        y0 = jnp.floor(yy)
                        fx = x - x0
                        fy = yy - y0
                        x0w = jnp.mod(x0, jnp.maximum(ww_sel, 1.0))
                        y0w = jnp.mod(y0, jnp.maximum(hh_sel, 1.0))
                        xsel = jnp.where(m, x0w + bx_sel - ox_j + fx, -2.0)
                        ysel = jnp.where(m, y0w + by_sel - oy_j + fy, -2.0)
                        planes = _bilinear_chunk(
                            win,
                            j - j_lo,
                            b0_ref[e],
                            nb_ref[e],
                            xsel,
                            ysel,
                            wdtype,
                            ix,
                        )
                        out = []
                        for c in range(4):
                            out.append(
                                sacc8[c] + jnp.where(own_j, planes[c], 0.0)
                            )
                        for c in range(4):
                            out.append(
                                sacc8[4 + c] + jnp.where(par_j, planes[c], 0.0)
                            )
                        return out

                    return jax.lax.fori_loop(k_lo, k_hi, slot_body, acc)

                zero8 = [jnp.zeros((RC, tile_w), jnp.float32)] * 8
                if max_anisotropy > 1:
                    acc8 = jax.lax.fori_loop(0, np_t, probe_body, zero8)
                else:
                    acc8 = probe_body(jnp.int32(0), zero8)
                for c in range(8):
                    sacc[c, rows, :] += acc8[c]
                return 0

            jax.lax.fori_loop(0, nc, chunk_body, 0)

        wave_pass(0)

        @pl.when(n > K)
        def _second_wave():
            wave_pass(1)

        # Mip blend + probe normalization, once per tile: the per-probe
        # own/parent sums are linear in the probes, so
        #   sum_p (own_p*(1-tf) + par_p*tf)/np == ((1-tf)*Sown + tf*Spar)/np.
        tfrac = g[13]
        t_i = 1.0 - tfrac
        shade_out(
            [(sacc[c] * t_i + sacc[4 + c] * tfrac) / npf for c in range(4)]
        )

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
    assert tile_h % RC == 0, "tile_h must be a multiple of the row chunk"

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
        num_scalar_prefetch=10,
        grid=(t_total,),
        in_specs=[
            pl.BlockSpec(
                (A_OUT, tile_h, tile_w),
                lambda g, *_: (0, g // tiles_x, g % tiles_x),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (2, tile_h, tile_w),
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
            pltpu.VMEM((K, 4, WH, WW), page.dtype),
            pltpu.VMEM((8, tile_h, tile_w), jnp.float32),
            pltpu.SemaphoreType.DMA((K,)),
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
        plan["n_used"],
        plan["slot_oy"],
        plan["slot_ox"],
        plan["chunk_cnt"],
        plan["chunk_cnt0"],
        plan["chunk_jid"],
        plan["chunk_b0"],
        plan["chunk_nb"],
        gbuf,
        plan["assign"],
        camera_position.reshape(1, 3),
        page,
    )[0]
