"""Multi-chip SPMD rendering: framebuffer tile-row sharding over a mesh.

The reference is single-GPU; its parallelism is the rasterizer hardware
(SURVEY §2.5). The TPU-native scale-out axis is screen space: tile rows
shard across devices on a 1-D mesh ("tiles" axis). Rasterization is
embarrassingly parallel after binning — each device bins and rasterizes
only its slab, with no halo exchange (SURVEY §5 "long-context" analog).
Scene buffers are replicated (small: MBs); per-slab framebuffers
concatenate into the output sharding, and the only collective is a psum
of the bin-overflow counter (serves as the cross-chip health check).

Coordinate handling: rather than teaching the Pallas kernel about global
offsets, the slab shifts its triangle setup — an edge function
e(px, py) = a*px + b*py + c becomes a slab-local function by c += b*dy.
Depth/z fields are invariant; AABBs shift the same way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpurast.kernels import geometry, present, raster, shade


def _shift_setup_rows(setup, dy):
    """Shift edge functions to slab-local pixel rows by moving each
    face's evaluation anchor: Y0' = Y0 - dy (kernels/geometry.py anchored
    edge functions). The per-face y extent (row-group restriction)
    shifts the same way."""
    from tpurast.kernels.geometry import FIELD_ANCHOR_Y, FIELD_YMAX, FIELD_YMIN

    shift = jnp.zeros((setup.shape[1],), setup.dtype)
    shift = shift.at[jnp.array([FIELD_ANCHOR_Y, FIELD_YMIN, FIELD_YMAX])].set(-dy)
    return setup + shift[None, :]


def render_frame_sharded(
    scene,
    view_proj,
    camera_position,
    *,
    mesh: Mesh,
    axis: str = "tiles",
    width: int,
    height: int,
    tile_h: int,
    tile_w: int,
    tiles_x: int,
    tiles_y_per_device: int,
    bin_capacity: int,
    segment_headroom: int,
    clear_depth: float,
    clear_color,
    light_direction,
    light_color,
    ambient_amount: float,
    specular_power: float,
    max_anisotropy: int = 1,
):
    """Jit-compatible multi-device frame: returns dict with the color
    framebuffer (sharded over rows) and the global bin overflow count."""
    n_dev = mesh.shape[axis]
    slab_h = tiles_y_per_device * tile_h

    def slab_fn(scene_rep, vp, cam):
        d = jax.lax.axis_index(axis)
        dy = (d * slab_h).astype(jnp.float32)

        clip, world, wnormal = geometry.transform_vertices(
            scene_rep["positions"],
            scene_rep["normals"],
            scene_rep["vert_prim"],
            scene_rep["models"],
            scene_rep["normal_mats"],
            vp,
        )
        s = geometry.triangle_setup(
            clip, scene_rep["faces"], scene_rep["n_faces"], width, height
        )
        # Slab-local coordinates: e(px, py_local + dy) = a*px + b*py_local
        # + (c + b*dy).
        setup_local = _shift_setup_rows(s["setup"], dy)
        aabb_local = s["aabb"] - jnp.array([0.0, 1.0, 0.0, 1.0]) * dy
        bins = geometry.bin_triangles(
            aabb_local,
            s["valid"],
            tiles_x,
            tiles_y_per_device,
            tile_w,
            tile_h,
            bin_capacity,
        )
        overflow = bins["overflow"]
        depth, fid, dropped_segments = raster.rasterize_visibility(
            bins,
            setup_local,
            tile_h=tile_h,
            tile_w=tile_w,
            tiles_x=tiles_x,
            tiles_y=tiles_y_per_device,
            clear_depth=clear_depth,
            segment_headroom=segment_headroom,
        )
        faces = scene_rep["faces"]
        shade_rows = shade.pack_shade_rows(
            setup_local,
            world[faces],
            wnormal[faces],
            scene_rep["uvs"][faces],
            scene_rep["prim_tex"][scene_rep["face_prim"]],
            scene_rep["atlas"],
        )
        fb = shade.shade_deferred(
            fid,
            shade_rows,
            scene_rep["atlas"]["texels"],
            cam,
            light_direction=light_direction,
            light_color=light_color,
            ambient_amount=ambient_amount,
            specular_power=specular_power,
            clear_color=clear_color,
            max_anisotropy=max_anisotropy,
        )
        color = present.encode_srgb_u8(fb, tiles_x * tile_w, slab_h)
        total_overflow = jax.lax.psum(jnp.sum(overflow) + dropped_segments, axis)
        return color, depth, total_overflow

    color, depth, overflow = jax.shard_map(
        slab_fn,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        # Color is channel-planar (4, H, W): slabs concatenate on rows.
        out_specs=(P(None, axis, None), P(axis, None), P()),
        # Pallas calls don't carry varying-mesh-axis metadata yet.
        check_vma=False,
    )(scene, view_proj, camera_position)
    return {
        "color": color[:, :height, :width],
        "depth": depth[:height, :width],
        "bin_overflow": overflow,
    }


def make_sharded_renderer(scene_dev, config, mesh: Mesh, width: int, height: int):
    """Build a jitted multi-chip frame function for a given mesh.

    Pads the framebuffer so tile rows divide evenly across devices.
    Returns (fn, static_info); fn(scene, view_proj, cam_pos) -> frame dict.
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    tiles_x = -(-width // config.tile_w)
    tiles_y = -(-height // config.tile_h)
    tiles_y = -(-tiles_y // n_dev) * n_dev  # divisible by device count
    quantum = 128
    cap = config.bin_capacity or 4 * int(scene_dev["faces"].shape[0])
    cap = -(-cap // quantum) * quantum
    fn = jax.jit(
        functools.partial(
            render_frame_sharded,
            mesh=mesh,
            axis=axis,
            width=width,
            height=height,
            tile_h=config.tile_h,
            tile_w=config.tile_w,
            tiles_x=tiles_x,
            tiles_y_per_device=tiles_y // n_dev,
            bin_capacity=cap,
            segment_headroom=min(
                config.segment_headroom,
                max(512, int(scene_dev["faces"].shape[0]) // 32),
            ),
            clear_depth=config.clear_depth,
            clear_color=config.clear_color,
            light_direction=config.light_direction,
            light_color=config.light_color,
            ambient_amount=config.ambient_amount,
            specular_power=config.specular_power,
            max_anisotropy=config.max_anisotropy,
        )
    )
    return fn
