"""Windowed texture sampling: the TPU-native texture unit.

The gather path (kernels/shade.py) fetches one 52-float atlas row per
trilinear sample through XLA's dynamic-gather — ~7-76 ns per row
depending on table footprint. At 1080p that is 2M rows/frame, and on
scenes with multi-GB texture residency (the porsche class) the frame is
texture-gather bound at >100 ms. A GPU hides the same access pattern
behind its texture caches; the TPU equivalent built here makes the
cache EXPLICIT, and BOTH halves run as Pallas kernels over the tile
grid so no stage touches full-frame HBM planes more than once:

  1. PLAN (_plan_kernel): per framebuffer tile, reduce the G-buffer
     (kernels/resolve.py planes) to up to K2 sampling slots, each one
     fixed-shape (WH, WW) texel window of the texture page, placed by
     GREEDY BANDED COVERING: each round seeds at the top-left-most
     uncovered anchor (page coordinates — one coordinate system across
     every (texture, mip)), opens a window band there, and absorbs
     every pixel whose whole anchor range (bilinear + per-pixel
     anisotropy-probe extremes) fits the window. The loop runs a
     DYNAMIC number of rounds — exactly the tile's slot count (most
     tiles need 1-3; the old XLA formulation paid 32 static rounds of
     full-frame reductions, ~13 ms at 1080p; in-kernel the planes stay
     in VMEM and covered tiles stop early). The kernel also emits
     per-pixel ASSIGNMENT PLANES (own/parent slot index) — assignment
     decisions are made ONCE and shipped to the sampling kernel — and
     per-(chunk, slot) SELECTION BANDS: a y-band [b0, b0+nyb*YB) and
     an x-band [xb0*XB, (xb0+nxb)*XB) of the window that contain every
     texel the chunk references, so the sampling contraction reads a
     (YB, XB) sub-window instead of (WH, WW). Tiles needing more than
     K2 windows fall back to the gather path (counted as
     window_miss_px); tiles needing more than K (but <= K2) run a
     second kernel wave that re-DMAs slots [K, K2) into VMEM.
  2. SAMPLE (_sampler_kernel): per tile, DMA the planned windows from
     the texture page (device/pages.py) into VMEM — a DYNAMIC
     trip-count loop runs only the windows the tile actually uses —
     then select + bilinear-filter texels with tent-weight one-hot MXU
     contractions:

       weights C[r, i, c] = max(0, 1 - |i - x(r, c)|)   (RC, XB, tw)

     nonzero exactly at the two bilinear x-neighbors with exactly the
     bilinear weights, so one batched matmul  B = T . C  x-filters
     every pixel row against the slot's x-band; a tent over the band
     rows y-filters on the VPU. The kernel walks RC-row pixel chunks
     and runs, per chunk, only the slots whose plan word is live, over
     only the planned (YB, XB) bands — the dominant costs (tent-weight
     construction on the VPU and the contraction on the MXU) scale
     with the chunk's true footprint. Per-pixel HBM gathers are gone:
     texel traffic is the window DMA (O(tile footprint), contiguous),
     and selection runs at MXU rate.
  3. The basic.frag lighting + blend (kernels/shade.py formulas) run
     in-kernel on the G-buffer planes, so the kernel emits final
     linear framebuffer tiles and the XLA shading tail disappears.

Anisotropy (the reference sampler's maxAnisotropy 16,
src/Renderer.zig:515) uses PER-PIXEL probe counts (shade.probe_count:
ceil of the pixel's anisotropy ratio): the probe loop's trip count is
the chunk's worst count, probe i only accumulates into pixels whose
own count needs it, and positions/normalization use the pixel's own
count — so isotropic chunks pay one probe and only grazing chunks loop,
with identical quadrature to the gather path's masked static loop.
Probe anchors stay inside the assigned window and bands because the
plan's coverage test uses the same per-pixel probe-extreme anchor
range (with a 1-texel safety margin); plan and sample recompute the
count with the same expression under the same compiler.

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
# +1 bilinear neighbor, and a 1-texel safety margin (coverage is
# decided in the plan kernel, per-probe anchors are recomputed in the
# sampling kernel — the margin absorbs f32 rounding at floor
# boundaries).
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

# Repeat-addressing wrap scheme thresholds (shared by the plan's anchor
# computation, the sampling kernel's probe coordinates, and the page
# packer's ghost-border sizing — device/pages.py):
#   * mips at most this wide/tall fit a window WHOLE (incl. worst
#     alignment slack), so a wrap-crossing anchor range can use plain
#     min/max — the window covers both sides of the seam as real texels.
#   * bigger mips anchor the range at its wrapped LO texel and extend
#     past the mip edge into the rect's ghost border (WRAP_GHOST wrapped
#     texel copies on the right/bottom of big rects), so a seam-crossing
#     footprint stays one contiguous window range instead of exploding
#     to the whole mip.
X_WRAP_LIM = 255.0
Y_WRAP_LIM = 87.0
# Max texels a footprint extends past the mip edge: probe-train extent
# (<= maxAnisotropy 16 texels at the selected level by the ratio clamp,
# shade.aniso_footprint) + bilinear neighbor + rounding margin.
WRAP_GHOST = 24

# Kernel blocking: pixel rows per chunk (sublane-sized), window rows
# per y selection band, window cols per x selection band. The x-filter
# contraction costs 4*YB*XB MACs per output (RC*tw) column — banding
# both axes to the chunk's planned footprint (instead of the whole
# (WH, WW) window) cuts the dominant matmul and its VPU tent-weight
# construction ~6x. Chunks whose span can't fit one band run the exact
# number of disjoint bands that cover it, which sums to the identical
# result (tent weights are evaluated against absolute window
# coordinates, so texels outside a pixel's 2-tap support contribute
# exact zeros).
RC = 16  # preferred chunk height; rc_for() shrinks it for small tiles
# Y selection-band granularity. Measured dead end (r5, docs/perf.md):
# YB=16 cuts the contraction's M (=4*YB) 3x on paper but REGRESSED the
# sample stage 18.8 -> ~21 ms — the MXU streams the RHS, so cost is
# ~independent of M below 128 rows, and shrinking the band only
# multiplied band count and per-band loop overhead. Must stay a
# multiple of ALIGN_Y (band starts stay DMA/slice aligned) and WH//YB
# bands must fit the plan word's 3-bit nyb field.
YB = 48
XB = 128
NXB = WW // XB


def rc_for(tile_h: int) -> int:
    """Chunk row height for a tile height: the largest of {16, 8} that
    divides it (config.py documents tile_h as any multiple of 8).
    Bigger chunks amortize the per-(chunk, slot) loop + matmul overhead
    over more pixels; the plan's per-chunk bands/probe counts coarsen
    accordingly."""
    if tile_h % 8 != 0:
        raise ValueError(f"tile_h must be a multiple of 8, got {tile_h}")
    for rc in (RC, 8):
        if tile_h % rc == 0:
            return rc
    raise AssertionError

# Per-(chunk, slot) plan word (lane j of the chunk row):
#   bit 0      live (chunk references slot j)
#   bits 1-8   b0   — y-band start row (ALIGN_Y-aligned, <= WH - YB)
#   bits 9-11  nyb  — y-band count (1..WH//YB)
#   bits 12-13 xb0  — x-band start index (0..NXB-1)
#   bits 14-15 nxb  — x-band count (1..NXB)
#   bits 16-19 np-1 — worst probe count over the chunk's pixels that
#                     reference THIS slot (so an isotropic wall slot in
#                     a chunk that also holds grazing floor pixels pays
#                     1 probe, not the floor's 16)
# Lane CHUNK_NP_LANE of the chunk row: the chunk's worst per-pixel
# probe count (kept for tooling/diagnostics).
CHUNK_NP_LANE = 120


def _probe_extent_anchors(g, max_anisotropy: int):
    """Per-pixel page-coordinate anchor ranges (bilinear + probe
    extremes) and the per-pixel probe count, from G-buffer planes.
    Shared shape of the plan kernel's coverage test; all ops are plain
    VPU elementwise so plan and sample agree under one compiler."""
    u, v = g[6], g[7]
    tw0, th0, tw1, th1 = g[9], g[10], g[11], g[12]
    span = g[17]
    if max_anisotropy > 1:
        n_px = _shade.probe_count(
            span, g[14], g[15], tw0, th0, max_anisotropy
        )
    else:
        n_px = jnp.ones_like(span)
    fo_ext = (0.5 - 0.5 / n_px) * span
    du_ext = jnp.abs(g[14]) * fo_ext
    dv_ext = jnp.abs(g[15]) * fo_ext

    def anchor(uu, ww, dd, lim):
        lo_u = jnp.floor((uu - dd) * ww - 0.5)
        hi_u = jnp.floor((uu + dd) * ww - 0.5)
        lo_m = jnp.mod(lo_u, jnp.maximum(ww, 1.0))
        hi_m = jnp.mod(hi_u, jnp.maximum(ww, 1.0))
        # Big mips (> lim): anchor the range at its wrapped lo texel;
        # the tail past the mip edge reads the rect's WRAP_GHOST border
        # (device/pages.py). Small mips: wrap-agnostic min/max — the
        # whole mip fits one window, so both seam sides are real texels.
        big = ww > lim
        lo = jnp.where(big, lo_m, jnp.minimum(lo_m, hi_m))
        hi = jnp.where(big, lo_m + (hi_u - lo_u), jnp.maximum(lo_m, hi_m))
        return lo, hi

    xo_lo, xo_hi = anchor(u, tw0, du_ext, X_WRAP_LIM)
    yo_lo, yo_hi = anchor(v, th0, dv_ext, Y_WRAP_LIM)
    xp_lo, xp_hi = anchor(u, tw1, du_ext, X_WRAP_LIM)
    yp_lo, yp_hi = anchor(v, th1, dv_ext, Y_WRAP_LIM)
    own = (
        yo_lo + g[20], yo_hi + g[20], xo_lo + g[21], xo_hi + g[21],
    )
    par = (
        yp_lo + g[22], yp_hi + g[22], xp_lo + g[23], xp_hi + g[23],
    )
    return own, par, n_px


def _plan_kernel(
    # inputs
    gbuf_ref,  # VMEM (A_OUT, th, tw)
    # outputs
    table_ref,  # VMEM (1, 8, 128) i32: row 0 = meta ([0]=cls [1]=n_used
    #            [32+k]=oy [64+k]=ox), rows 1..NC = chunk plan rows
    #            (lane j = plan word, lane CHUNK_NP_LANE = probe count)
    assign_ref,  # VMEM (2, th, tw) f32 own/parent slot index (-1 none)
    # scratch
    anch,  # VMEM (8, th, tw) f32 own(y_lo,y_hi,x_lo,x_hi) par(...)
    todo,  # VMEM (2, th, tw) f32 1.0 = anchor range still uncovered
    npx_s,  # VMEM (1, th, tw) f32 per-pixel probe count
    sl_oy,  # SMEM (K2,) i32 window page origins
    sl_ox,  # SMEM (K2,) i32
    st,  # SMEM (2,) i32: [0]=covering done flag, [1]=n_used
    *,
    tile_h: int,
    tile_w: int,
    max_anisotropy: int,
    rc: int,
):
    g = gbuf_ref
    big = jnp.float32(3.4e38)
    matched = g[16] > 0.0
    tw0, th0, tw1, th1 = g[9], g[10], g[11], g[12]

    own, par, n_px = _probe_extent_anchors(g, max_anisotropy)
    npx_s[0] = n_px
    for i in range(4):
        anch[i] = own[i]
        anch[4 + i] = par[i]
    # Pre-drop pixels whose anchor range can NEVER fit a window (worst
    # alignment slack): a greedy seed must absorb itself or the round
    # makes no progress and the remaining slots are burned re-seeding
    # the same pixel. Dropped pixels force the tile residual below.
    unfit_o = (own[1] - own[0] > WH - ALIGN_Y - 2) | (
        own[3] - own[2] > WW - ALIGN_X - 2
    )
    unfit_p = (par[1] - par[0] > WH - ALIGN_Y - 2) | (
        par[3] - par[2] > WW - ALIGN_X - 2
    )
    unfit_any = jnp.any(matched & (unfit_o | unfit_p))
    todo[0] = jnp.where(matched & ~unfit_o, 1.0, 0.0)
    todo[1] = jnp.where(matched & ~unfit_p, 1.0, 0.0)
    assign_ref[0] = jnp.full((tile_h, tile_w), -1.0, jnp.float32)
    assign_ref[1] = assign_ref[0]
    st[0] = 0
    st[1] = 0

    # The kernel computes ONE coordinate set per (pixel, slot), own
    # coords taking precedence — so a pixel may hold own AND parent
    # roles in the same slot only where the coords coincide (the mip
    # chain clamp, where resolve sets l1 = l0). Elsewhere a shared
    # window defers the parent role to a later round.
    share_ok = (tw1 == tw0) & (th1 == th0)

    def round_body(s, _):
        @pl.when(st[0] == 0)
        def _round():
            t_o = todo[0] > 0.5
            t_p = todo[1] > 0.5
            # One cross-lane reduction per seed coordinate: elementwise
            # min of the two masked role planes first (min of mins).
            ymin = jnp.min(
                jnp.minimum(
                    jnp.where(t_o, anch[0], big),
                    jnp.where(t_p, anch[4], big),
                )
            )

            @pl.when(ymin < big * 0.5)
            def _seed():
                # Absorb against the window's ACTUAL (ALIGN-rounded)
                # origin, not the worst-case COV_* slack: page rects
                # x-align to ALIGN_X (device/pages.py shelf pack), so a
                # whole 256-wide mip — whose wrap-crossing pixels get a
                # full-mip anchor range [0, w-1] from the mod in
                # _probe_extent_anchors — fits one window (256+ghost+
                # bilinear << WW at slack ~1) where the COV_X test
                # rejected it by one texel and burned every slot.
                # Margins: +1 bilinear neighbor +1 f32 safety.
                oy = ymin - jnp.floor(ymin / ALIGN_Y) * ALIGN_Y
                band_o = t_o & (anch[1] < ymin - oy + (WH - 2))
                band_p = t_p & (anch[5] < ymin - oy + (WH - 2))
                xmin = jnp.min(
                    jnp.minimum(
                        jnp.where(band_o, anch[2], big),
                        jnp.where(band_p, anch[6], big),
                    )
                )
                oxs = xmin - jnp.floor(xmin / ALIGN_X) * ALIGN_X
                win_o = band_o & (anch[3] < xmin - oxs + (WW - 2))
                win_p = band_p & (anch[7] < xmin - oxs + (WW - 2))
                win_p = win_p & (~win_o | share_ok)
                sf = s.astype(jnp.float32)
                assign_ref[0] = jnp.where(win_o, sf, assign_ref[0])
                assign_ref[1] = jnp.where(win_p, sf, assign_ref[1])
                todo[0] = jnp.where(win_o, 0.0, todo[0])
                todo[1] = jnp.where(win_p, 0.0, todo[1])
                ymin_i = ymin.astype(jnp.int32)
                xmin_i = xmin.astype(jnp.int32)
                sl_oy[s] = ymin_i - ymin_i % ALIGN_Y
                sl_ox[s] = xmin_i - xmin_i % ALIGN_X
                st[1] = st[1] + 1

            @pl.when(ymin >= big * 0.5)
            def _done():
                st[0] = 1

        return 0

    jax.lax.fori_loop(0, K2, round_body, 0)

    covered = jnp.any(matched)
    leftover = jnp.any((todo[0] > 0.5) | (todo[1] > 0.5)) | unfit_any
    n_used = st[1]
    cls = jnp.where(
        covered,
        jnp.where(leftover, CLS_RESIDUAL, CLS_WINDOWED),
        CLS_EMPTY,
    ).astype(jnp.int32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    row = jnp.where(lane == 0, cls, 0)
    row = jnp.where(lane == 1, n_used, row)

    def put_slot(k, r):
        r = jnp.where(lane == 32 + k, sl_oy[k], r)
        return jnp.where(lane == 64 + k, sl_ox[k], r)

    table_ref[0, 0:1, :] = jax.lax.fori_loop(0, n_used, put_slot, row)

    # ---- per-chunk plan words: live flag + selection bands ----------------
    # Bands are derived from the SAME anchor planes the covering used,
    # so the sampling kernel never reads outside its band. All ranges
    # are relative to the slot's (ALIGN-rounded) window origin; the
    # coverage bounds guarantee ryhi+1 <= WH and rxhi+1 <= WW.
    # All values stay in VECTOR registers ((1, 1) keepdims reductions,
    # broadcast compares, lane-select row writes): cross-lane
    # vector->scalar transfers stall the VPU pipeline for ~100 cycles
    # each, and the slot loop would otherwise pay 4 per (chunk, slot).
    nc = tile_h // rc

    def vmin(a, b):
        return jnp.min(jnp.minimum(a, b), axis=(0, 1), keepdims=True)

    def vmax(a, b):
        return jnp.max(jnp.maximum(a, b), axis=(0, 1), keepdims=True)

    for ci in range(nc):
        rows = slice(ci * rc, (ci + 1) * rc)
        ao = assign_ref[0][rows, :]
        ap = assign_ref[1][rows, :]
        m_c = matched[rows, :]
        npx_c = npx_s[0][rows, :]
        np_chunk = jnp.max(
            jnp.where(m_c, npx_c, 1.0),
            axis=(0, 1),
            keepdims=True,
        ).astype(jnp.int32)
        ylo_o, yhi_o = anch[0][rows, :], anch[1][rows, :]
        xlo_o, xhi_o = anch[2][rows, :], anch[3][rows, :]
        ylo_p, yhi_p = anch[4][rows, :], anch[5][rows, :]
        xlo_p, xhi_p = anch[6][rows, :], anch[7][rows, :]

        def slot_body(j, r):
            jf = j.astype(jnp.float32)
            m_o = ao == jf
            m_p = ap == jf
            use = jnp.max(
                (m_o | m_p).astype(jnp.int32), axis=(0, 1), keepdims=True
            )
            ylo = vmin(
                jnp.where(m_o, ylo_o, big), jnp.where(m_p, ylo_p, big)
            )
            yhi = vmax(
                jnp.where(m_o, yhi_o, -big), jnp.where(m_p, yhi_p, -big)
            )
            xlo = vmin(
                jnp.where(m_o, xlo_o, big), jnp.where(m_p, xlo_p, big)
            )
            xhi = vmax(
                jnp.where(m_o, xhi_o, -big), jnp.where(m_p, xhi_p, -big)
            )
            rylo = jnp.clip(ylo.astype(jnp.int32) - sl_oy[j], 0, WH - 1)
            ryhi = jnp.clip(yhi.astype(jnp.int32) - sl_oy[j] + 1, 0, WH - 1)
            rxlo = jnp.clip(xlo.astype(jnp.int32) - sl_ox[j], 0, WW - 1)
            rxhi = jnp.clip(xhi.astype(jnp.int32) - sl_ox[j] + 1, 0, WW - 1)
            b0 = rylo - rylo % ALIGN_Y
            nyb = jnp.clip((ryhi + 1 - b0 + YB - 1) // YB, 1, WH // YB)
            b0 = jnp.minimum(b0, WH - nyb * YB)
            xb0 = rxlo // XB
            nxb = jnp.clip(rxhi // XB, 0, NXB - 1) - xb0 + 1
            np_s = jnp.clip(
                jnp.max(
                    jnp.where(m_o | m_p, npx_c, 1.0), axis=(0, 1), keepdims=True
                ).astype(jnp.int32),
                1,
                16,
            )
            word = (
                1
                | (b0 << 1)
                | (nyb << 9)
                | (xb0 << 12)
                | (nxb << 14)
                | ((np_s - 1) << 16)
            )
            word = jnp.where(use > 0, word, 0)
            return jnp.where(lane == j, word, r)

        crow = jax.lax.fori_loop(
            0, n_used, slot_body, jnp.zeros((1, 128), jnp.int32)
        )
        crow = jnp.where(lane == CHUNK_NP_LANE, np_chunk, crow)
        table_ref[0, 1 + ci : 2 + ci, :] = crow


def plan_tiles(
    gbuf,  # (A_OUT, H, W) from resolve_gbuffer
    page_origins,  # unused (page coords ride the G-buffer planes 20..23)
    page_sizes,  # unused
    *,
    tiles_x: int,
    tiles_y: int,
    tile_h: int,
    tile_w: int,
    max_anisotropy: int = 1,
):
    """Per-tile window plan (Pallas kernel over the tile grid).

    Returns per-tile arrays (cls, nprobe, n_used), flat (T*K2,) slot
    origin tables, flat (T*NC*K2,) per-(chunk, slot) plan words +
    (T*NC,) chunk probe counts, per-pixel assignment planes
    assign (2, H, W) f32 (own/parent slot index; -1 = none), and the
    residual accounting.
    """
    del page_origins, page_sizes
    t_total = tiles_x * tiles_y
    rc = rc_for(tile_h)
    nc = tile_h // rc
    assert nc + 1 <= 8, "plan table block holds meta + NC chunk rows"

    kernel = functools.partial(
        _plan_kernel,
        tile_h=tile_h,
        tile_w=tile_w,
        max_anisotropy=max_anisotropy,
        rc=rc,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(t_total,),
        in_specs=[
            pl.BlockSpec(
                (A_OUT, tile_h, tile_w),
                lambda g: (0, g // tiles_x, g % tiles_x),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 8, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (2, tile_h, tile_w),
                lambda g: (0, g // tiles_x, g % tiles_x),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, tile_h, tile_w), jnp.float32),
            pltpu.VMEM((2, tile_h, tile_w), jnp.float32),
            pltpu.VMEM((1, tile_h, tile_w), jnp.float32),
            pltpu.SMEM((K2,), jnp.int32),
            pltpu.SMEM((K2,), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
        ],
    )
    h = tiles_y * tile_h
    w = tiles_x * tile_w
    table, assign = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t_total, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((2, h, w), jnp.float32),
        ],
        interpret=_k.interpret_mode(),
    )(gbuf)

    meta = table[:, 0, :]
    chunkt = table[:, 1 : 1 + nc, :].reshape(t_total * nc, 128)
    cls = meta[:, 0]
    n_used = meta[:, 1]
    slot_oy = meta[:, 32 : 32 + K2].reshape(-1)
    slot_ox = meta[:, 64 : 64 + K2].reshape(-1)
    chunk_pack = chunkt[:, :K2].reshape(-1)
    chunk_np = chunkt[:, CHUNK_NP_LANE]
    nprobe = jnp.max(chunk_np.reshape(t_total, nc), axis=1)

    matched = (gbuf[16] > 0.0).reshape(tiles_y, tile_h, tiles_x, tile_w)
    n_matched = jnp.sum(matched, axis=(1, 3)).reshape(-1)
    residual_tile = cls == CLS_RESIDUAL
    residual_px = jnp.sum(jnp.where(residual_tile, n_matched, 0))

    return {
        "cls": cls,
        "nprobe": nprobe,
        "n_used": n_used,
        "slot_oy": slot_oy,
        "slot_ox": slot_ox,
        "chunk_pack": chunk_pack,
        "chunk_np": chunk_np,
        "assign": assign,
        "residual_tile": residual_tile,
        "residual_px": residual_px,
    }


def _slot_accumulate(
    win, wj, word, probe_sel, np_s, rc, tw_px, wdtype, pacc, iy0, ixb0
):
    """Accumulate ALL probes of one (chunk, slot) pair into pacc.

    probe_sel(i) -> (xsel, ysel): per-pixel window-coordinate sample
    positions (anchor + fraction) for probe i, (rc, tw) f32, -2.0 where
    the pixel does not use this slot/probe (tent weights vanish there).
    `word` carries the plan's selection bands — rows [b0, b0 + nyb*YB)
    and cols [xb0*XB, (xb0+nxb)*XB) of the window contain every texel
    ANY probe references (the plan's coverage test uses probe-extreme
    anchors); np_s is the slot's probe trip count (plan word bits
    16-19). pacc (4, rc, tw) f32 scratch receives the probe SUM; the
    caller normalizes by the per-pixel count.

    The band grid is a STATIC (WH//YB x NXB) unroll with pl.when guards
    — a dynamic-trip fori_loop costs more in Mosaic loop overhead per
    band than the band's own matmul (measured: most slots plan exactly
    one band). Loop order stays band-outer / probe-inner so the window
    band load runs once per band, not once per probe. Per probe,
    x-filtering is a batched MXU contraction with tent weights
      C[i, r, c] = max(0, 1 - |i - xsel(r, c)|)
    which places (1-fx, fx) at the two x-neighbors; y-filtering is a
    tent over the band rows on the VPU, against ABSOLUTE window
    coordinates (bands are disjoint, so multi-band sums add exact
    zeros, and a probe whose support misses the band contributes exact
    zeros). Weight placement and lerp order match shade._trilerp up to
    f32-vs-bf16 rounding.
    """
    b0 = (word >> 1) & 0xFF
    nyb = (word >> 9) & 0x7
    xb0 = (word >> 12) & 0x3
    nxb = (word >> 14) & 0x3

    for c in range(4):
        pacc[c] = jnp.zeros((rc, tw_px), jnp.float32)

    for ky in range(WH // YB):
        for kx in range(NXB):

            @pl.when((ky < nyb) & (kx < nxb))
            def _band(ky=ky, kx=kx):
                ystart = pl.multiple_of(b0 + ky * YB, ALIGN_Y)
                xstart = pl.multiple_of((xb0 + kx) * XB, XB)
                tband = (
                    win[wj, :, pl.ds(ystart, YB), pl.ds(xstart, XB)]
                    .reshape(4 * YB, XB)
                    .astype(wdtype)
                )

                def probe(i, s4):
                    xsel, ysel = probe_sel(i)
                    # The iotas (iy0, ixb0 — built ONCE per kernel
                    # program) are probe- and band-invariant: the band
                    # offset folds into the (rc, tw) sel planes instead
                    # of the 262K-element weight grids, so the per-probe
                    # VPU work is just sub/abs/relu/cast over the grids.
                    # cw stays XB-MAJOR — (XB, rc, tw), contracting dim
                    # 0 — so the MXU sees its RHS (K=XB, N=rc*tw) in its
                    # natural layout; building it (rc, XB, tw) and
                    # contracting dim 1 forces Mosaic to relayout all
                    # 262K weights per probe, which dominated the whole
                    # sample stage.
                    ry = jnp.maximum(
                        0.0,
                        1.0
                        - jnp.abs(
                            iy0
                            - (ysel - ystart.astype(jnp.float32))[None, :, :]
                        ),
                    )
                    cw = jnp.maximum(
                        0.0,
                        1.0
                        - jnp.abs(
                            ixb0
                            - (xsel - xstart.astype(jnp.float32))[None, :, :]
                        ),
                    ).astype(wdtype)
                    # One batched contraction x-filters all 4 channels.
                    # Both operands are explicitly bf16 (texels 2^-11 ->
                    # 2^-9, tent weights 2^-9) so compiled MXU and
                    # interpret mode agree up to accumulation order; f32
                    # accumulation via preferred_element_type.
                    b = jax.lax.dot_general(
                        tband,
                        cw,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).reshape(4, YB, rc, tw_px)
                    return [
                        s4[c] + jnp.sum(b[c] * ry, axis=0) for c in range(4)
                    ]

                zero = [jnp.zeros((rc, tw_px), jnp.float32)] * 4
                s4 = jax.lax.fori_loop(0, np_s, probe, zero)
                for c in range(4):
                    pacc[c] += s4[c]


def _sampler_kernel(
    # scalar prefetch
    cls_ref,  # (T,) i32
    n_used_ref,  # (T,) i32
    oy_ref,  # (T*K2,) i32 window page origin (DMA-aligned)
    ox_ref,
    pack_ref,  # (T*NC*K2,) i32 per-(chunk, slot) plan word
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
    pacc,  # VMEM (4, rc, tw) f32 one (chunk, slot)'s probe sum
    sem,  # DMA sem (K,)
    *,
    tile_h: int,
    tile_w: int,
    max_anisotropy: int,
    rc: int,
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
        nc = tile_h // rc

        # Probe-/band-invariant weight-grid iotas, built once per tile
        # (band offsets fold into the small sel planes instead).
        iy0 = jax.lax.broadcasted_iota(
            jnp.int32, (YB, rc, tile_w), 0
        ).astype(jnp.float32)
        ixb0 = jax.lax.broadcasted_iota(
            jnp.int32, (XB, rc, tile_w), 0
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
                r0 = pl.multiple_of(ci * rc, rc)
                rows = pl.ds(r0, rc)
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
                if max_anisotropy > 1:
                    n_px = _shade.probe_count(
                        span, maj_du, maj_dv, tw0, th0, max_anisotropy
                    )
                else:
                    n_px = jnp.ones_like(span)
                # Probe-extreme deltas, the same expression the plan's
                # anchor computation used (_probe_extent_anchors) — they
                # reconstruct each pixel's anchored-lo texel for the
                # big-mip wrap scheme below.
                fo_ext = (0.5 - 0.5 / n_px) * span
                du_ext = jnp.abs(maj_du) * fo_ext
                dv_ext = jnp.abs(maj_dv) * fo_ext

                def slot_body(j, _):
                    word = pack_ref[cbase * K2 + j]

                    @pl.when((word & 1) == 1)
                    def _live_slot():
                        jf = j.astype(jnp.float32)
                        oy_j = oy_ref[t * K2 + j].astype(jnp.float32)
                        ox_j = ox_ref[t * K2 + j].astype(jnp.float32)
                        own_j = assign_o == jf
                        par_j = assign_p == jf
                        m0 = own_j | par_j
                        # Own-level coords where this slot is the pixel's
                        # l0, else parent coords (roles coincide at the
                        # mip chain clamp, where the coords are equal
                        # anyway). Wrapped texel coords + the level's
                        # page base give PAGE coords; window coords =
                        # page - origin. All probe-INDEPENDENT work
                        # happens here, outside the probe loop.
                        ww_sel = jnp.where(own_j, tw0, tw1)
                        hh_sel = jnp.where(own_j, th0, th1)
                        bx_sel = jnp.where(own_j, b_ox0, b_ox1) - ox_j
                        by_sel = jnp.where(own_j, b_oy0, b_oy1) - oy_j
                        # Big-mip wrap scheme (_probe_extent_anchors):
                        # the plan anchored this pixel's range at its
                        # wrapped LO texel, extending past the mip edge
                        # into the rect's WRAP_GHOST border. A probe
                        # whose wrapped coord lands BELOW lo belongs to
                        # that tail: shift it up one period so it reads
                        # the ghost copy inside the planned bands.
                        ww_c = jnp.maximum(ww_sel, 1.0)
                        hh_c = jnp.maximum(hh_sel, 1.0)
                        shift_x = jnp.where(ww_sel > X_WRAP_LIM, ww_sel, 0.0)
                        shift_y = jnp.where(hh_sel > Y_WRAP_LIM, hh_sel, 0.0)
                        lo_x = jnp.mod(
                            jnp.floor((u - du_ext) * ww_sel - 0.5), ww_c
                        )
                        lo_y = jnp.mod(
                            jnp.floor((v - dv_ext) * hh_sel - 0.5), hh_c
                        )

                        def probe_sel(i):
                            ifl = i.astype(jnp.float32)
                            m = m0 & (ifl < n_px)
                            fo = ((ifl + 0.5) / n_px - 0.5) * span
                            x = (u + maj_du * fo) * ww_sel - 0.5
                            yy = (v + maj_dv * fo) * hh_sel - 0.5
                            x0 = jnp.floor(x)
                            y0 = jnp.floor(yy)
                            x0w = jnp.mod(x0, ww_c)
                            y0w = jnp.mod(y0, hh_c)
                            x0w = jnp.where(x0w < lo_x, x0w + shift_x, x0w)
                            y0w = jnp.where(y0w < lo_y, y0w + shift_y, y0w)
                            xsel = jnp.where(m, x0w + bx_sel + (x - x0), -2.0)
                            ysel = jnp.where(m, y0w + by_sel + (yy - y0), -2.0)
                            return xsel, ysel

                        np_s = ((word >> 16) & 0xF) + 1
                        _slot_accumulate(
                            win,
                            j - j_lo,
                            word,
                            probe_sel,
                            np_s,
                            rc,
                            tile_w,
                            wdtype,
                            pacc,
                            iy0,
                            ixb0,
                        )
                        for c in range(4):
                            sacc[c, rows, :] += jnp.where(
                                own_j, pacc[c], 0.0
                            )
                            sacc[4 + c, rows, :] += jnp.where(
                                par_j, pacc[c], 0.0
                            )

                    return 0

                return jax.lax.fori_loop(j_lo, j_hi, slot_body, 0)

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
        if max_anisotropy > 1:
            npx_full = _shade.probe_count(
                g[17], g[14], g[15], g[9], g[10], max_anisotropy
            )
        else:
            npx_full = jnp.ones((tile_h, tile_w), jnp.float32)
        shade_out(
            [(sacc[c] * t_i + sacc[4 + c] * tfrac) / npx_full for c in range(4)]
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
    rc = rc_for(tile_h)

    kernel = functools.partial(
        _sampler_kernel,
        tile_h=tile_h,
        tile_w=tile_w,
        max_anisotropy=max_anisotropy,
        rc=rc,
        wdtype=wdtype,
        light_direction=light_direction,
        light_color=light_color,
        ambient_amount=ambient_amount,
        specular_power=specular_power,
        clear_color=clear_color,
        blend=blend,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
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
            pltpu.VMEM((4, rc, tile_w), jnp.float32),
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
        plan["n_used"],
        plan["slot_oy"],
        plan["slot_ox"],
        plan["chunk_pack"],
        gbuf,
        plan["assign"],
        camera_position.reshape(1, 3),
        page,
    )[0]
