"""Geometry stage: vertex transform, triangle setup, tile binning (XLA).

Replaces the reference's vertex shader (shaders/src/basic.vert) and the
GPU's fixed-function primitive assembly / cull / bin hardware.

All shapes are static: faces are padded to a fixed count with a validity
mask; per-tile triangle lists have a fixed capacity with overflow counted
and reported (SURVEY.md §7 "hard parts" #2).

Rasterization math: clipless 2D-homogeneous setup. For clip-space
vertices c_i we build viewport-homogeneous coords
  v_i = (sx_i * w_i, sy_i * w_i, w_i)
with sx = (x + w) * W/2, sy = (w - y) * H/2 (WebGPU NDC y-up -> framebuffer
y-down). Edge functions are rows of adj([v0 v1 v2]):
  e_i(p) = E[i] . (px, py, 1)
Perspective-correct barycentric weights are e_i / sum(e); screen-linear
depth is z(p) = (e . z_clip) / (e . w_clip). det = e_0 . v_0 gives facing:
det < 0 is front (CCW in y-down framebuffer coords, the reference's
FrontFace=CCW + back cull, src/Renderer.zig:409-413).
"""

from __future__ import annotations

import jax.numpy as jnp

SETUP_WIDTH = 16  # [E(9), z_clip(3), w_clip(3), pad]


def transform_vertices(positions, normals, vert_prim, models, normal_mats, view_proj):
    """Vertex stage: model -> world -> clip, normals to world space.

    positions/normals: (V, 3); vert_prim: (V,) int32 primitive id;
    models: (P, 4, 4); normal_mats: (P, 3, 3); view_proj: (4, 4).
    Returns (clip (V, 4), world (V, 3), world_normal (V, 3)).

    Matches basic.vert:22-31: world = model * pos; clip = proj * view *
    world; normal = normal_matrix * normal (not renormalized here — the
    fragment stage normalizes, basic.frag:23).
    """
    m = models[vert_prim]  # (V, 4, 4)
    pos_h = jnp.concatenate([positions, jnp.ones_like(positions[:, :1])], axis=1)
    world_h = jnp.einsum("vij,vj->vi", m, pos_h)
    clip = world_h @ view_proj.T
    nm = normal_mats[vert_prim]
    world_normal = jnp.einsum("vij,vj->vi", nm, normals)
    return clip, world_h[:, :3], world_normal


def triangle_setup(clip, faces, n_faces, width, height):
    """Per-triangle rasterization setup.

    clip: (V, 4); faces: (F, 3) int32; n_faces: static or traced count of
    valid faces. Returns dict with:
      setup: (F, 16) f32 — edge matrix rows + z_clip + w_clip
      valid: (F,) bool — in-range, front-facing, non-degenerate
      aabb:  (F, 4) f32 — (minx, miny, maxx, maxy) in pixels, full screen
             for triangles crossing w<=0
    """
    c = clip[faces]  # (F, 3, 4)
    w = c[..., 3]
    vx = (c[..., 0] + w) * (width * 0.5)
    vy = (w - c[..., 1]) * (height * 0.5)
    v = jnp.stack([vx, vy, w], axis=-1)  # (F, 3, 3) viewport-homogeneous

    # Adjugate rows: e_i = cross(v_{i+1}, v_{i+2}).
    e0 = jnp.cross(v[:, 1], v[:, 2])
    e1 = jnp.cross(v[:, 2], v[:, 0])
    e2 = jnp.cross(v[:, 0], v[:, 1])
    det = jnp.sum(e0 * v[:, 0], axis=-1)

    face_ids = jnp.arange(faces.shape[0], dtype=jnp.int32)
    in_range = face_ids < n_faces
    finite = jnp.all(jnp.isfinite(c.reshape(c.shape[0], -1)), axis=-1)
    front = det < 0.0  # CCW front under y-down framebuffer coords
    valid = in_range & finite & front

    # Screen AABB. Vertices behind/at the eye plane (w <= eps) make the
    # projected extent unbounded -> conservatively bin to the full screen.
    eps = jnp.float32(1e-20)
    w_ok = w > eps
    any_behind = ~jnp.all(w_ok, axis=-1)
    sx = jnp.where(w_ok, vx / jnp.where(w_ok, w, 1.0), 0.0)
    sy = jnp.where(w_ok, vy / jnp.where(w_ok, w, 1.0), 0.0)
    big = jnp.float32(1e9)
    minx = jnp.where(any_behind, 0.0, jnp.min(jnp.where(w_ok, sx, big), axis=-1))
    miny = jnp.where(any_behind, 0.0, jnp.min(jnp.where(w_ok, sy, big), axis=-1))
    maxx = jnp.where(any_behind, jnp.float32(width), jnp.max(jnp.where(w_ok, sx, -big), axis=-1))
    maxy = jnp.where(any_behind, jnp.float32(height), jnp.max(jnp.where(w_ok, sy, -big), axis=-1))
    aabb = jnp.stack([minx, miny, maxx, maxy], axis=-1)

    # Off-screen culling.
    on_screen = (maxx >= 0.0) & (maxy >= 0.0) & (minx < width) & (miny < height)
    valid = valid & on_screen

    setup = jnp.concatenate(
        [
            e0,
            e1,
            e2,
            c[..., 2],  # z_clip per vertex
            w,  # w_clip per vertex
            # Field 15: the face id itself (exact in f32 below 2^24).
            # Within a tile bin, face-id order == draw order, so the
            # raster kernel's later-wins tie-break can max over this
            # field directly and emit face ids without a slot->id pass.
            face_ids.astype(jnp.float32)[:, None],
        ],
        axis=-1,
    ).astype(jnp.float32)
    return {"setup": setup, "valid": valid, "aabb": aabb, "det": det}


def bin_triangles(
    aabb,
    valid,
    tiles_x,
    tiles_y,
    tile_w,
    tile_h,
    capacity,
    tiles_per_face: int = 64,
    huge_budget: int = 256,
):
    """Tiled binning: rank-by-cumsum + sparse pair scatter.

    XLA:TPU scatter cost is proportional to *attempted* updates, so the
    naive dense (T, F) masked scatter is ~50x slower than needed. Instead:

      1. A (T, F) overlap mask gives per-tile counts and, via cumsum, each
         face's draw-order rank within each tile (cheap: VPU-bound).
      2. "Small" faces (AABB spanning <= tiles_per_face tiles) enumerate
         their (face, tile) pairs explicitly — F x tiles_per_face
         candidates — and one sparse scatter writes them at their ranks.
      3. "Huge" faces (near-plane spanning, close-up geometry) are rare;
         up to huge_budget of them are compacted and scattered against
         all T tiles. Excess huge faces are dropped and counted.

    Returns (tile_ids (T, K) int32 face ids in draw order, tile_counts
    (T,) int32 clamped to K, overflow (T,) int32 dropped count).
    """
    f = aabb.shape[0]
    t = tiles_x * tiles_y
    k = capacity
    tx0 = jnp.clip(jnp.floor(aabb[:, 0] / tile_w), 0, tiles_x - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor(aabb[:, 1] / tile_h), 0, tiles_y - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor(aabb[:, 2] / tile_w), 0, tiles_x - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor(aabb[:, 3] / tile_h), 0, tiles_y - 1).astype(jnp.int32)
    span_x = tx1 - tx0 + 1
    span_y = ty1 - ty0 + 1
    span = jnp.where(valid, span_x * span_y, 0)

    # -- rank/count matrix (dense but scatter-free) -----------------------
    tile_col = (jnp.arange(t, dtype=jnp.int32) % tiles_x)[:, None]  # (T, 1)
    tile_row = (jnp.arange(t, dtype=jnp.int32) // tiles_x)[:, None]
    mask = (
        valid[None, :]
        & (tile_col >= tx0[None, :])
        & (tile_col <= tx1[None, :])
        & (tile_row >= ty0[None, :])
        & (tile_row <= ty1[None, :])
    )  # (T, F)
    counts_full = jnp.sum(mask, axis=1, dtype=jnp.int32)
    rank = jnp.cumsum(mask, axis=1, dtype=jnp.int32) - 1  # (T, F)

    face_ids = jnp.arange(f, dtype=jnp.int32)
    small = valid & (span <= tiles_per_face)
    huge = valid & (span > tiles_per_face)

    # -- small faces: explicit pair enumeration ---------------------------
    j = jnp.arange(tiles_per_face, dtype=jnp.int32)[None, :]  # (1, TPF)
    jx = j % jnp.maximum(span_x, 1)[:, None]
    jy = j // jnp.maximum(span_x, 1)[:, None]
    pair_tile = (ty0[:, None] + jy) * tiles_x + (tx0[:, None] + jx)  # (F, TPF)
    pair_ok = small[:, None] & (j < span[:, None])
    pair_rank = rank.reshape(-1)[
        jnp.where(pair_ok, pair_tile * f + face_ids[:, None], 0)
    ]
    dest = jnp.where(
        pair_ok & (pair_rank < k), pair_tile * k + pair_rank, t * k
    )
    tile_ids_flat = (
        jnp.zeros(t * k, dtype=jnp.int32)
        .at[dest.reshape(-1)]
        .set(jnp.broadcast_to(face_ids[:, None], dest.shape).reshape(-1), mode="drop")
    )

    # -- huge faces: compact up to huge_budget, scatter against all tiles -
    n_huge = jnp.sum(huge, dtype=jnp.int32)
    hslot = jnp.cumsum(huge, dtype=jnp.int32) - 1
    hdest = jnp.where(huge & (hslot < huge_budget), hslot, huge_budget)
    huge_ids = (
        jnp.zeros(huge_budget + 1, dtype=jnp.int32).at[hdest].set(face_ids, mode="promise_in_bounds")
    )[:huge_budget]
    huge_active = jnp.arange(huge_budget) < jnp.minimum(n_huge, huge_budget)
    h_tile = jnp.arange(t, dtype=jnp.int32)[:, None]  # (T, 1)
    h_mask = mask.T[huge_ids].T & huge_active[None, :]  # (T, HB) overlap
    h_rank = rank.T[huge_ids].T  # (T, HB)
    h_dest = jnp.where(
        h_mask & (h_rank < k), h_tile * k + h_rank, t * k
    )
    tile_ids_flat = tile_ids_flat.at[h_dest.reshape(-1)].set(
        jnp.broadcast_to(huge_ids[None, :], h_dest.shape).reshape(-1), mode="drop"
    )

    counts = jnp.minimum(counts_full, k)
    overflow = (counts_full - counts) + jnp.maximum(n_huge - huge_budget, 0)
    return tile_ids_flat.reshape(t, k), counts, overflow
