"""Unit tests for tpurast.math3d against the reference's semantics.

Each test pins one of the SURVEY.md §2.4 gotchas with hand-computed values.
"""

import math

import numpy as np
import pytest

from tpurast import math3d


def test_coordinate_transform_gltf_to_vulkan_is_diag():
    # SURVEY §2.4.1: glTF (right=-X, up=+Y, fwd=+Z) -> vulkan
    # (right=+X, up=-Y, fwd=+Z) flips x and y.
    m = math3d.coordinate_transform(math3d.GLTF, math3d.VULKAN)
    np.testing.assert_array_equal(m, np.diag([-1, -1, 1, 1]).astype(np.float32))


def test_coordinate_transform_blender_to_vulkan():
    # Blender: right=+X, up=+Z, fwd=+Y. A blender-forward vector (0,1,0)
    # must land on vulkan-forward (0,0,1); blender-up (0,0,1) on vulkan-up
    # (0,-1,0).
    m = math3d.coordinate_transform(math3d.BLENDER, math3d.VULKAN)
    np.testing.assert_allclose(m[:3, :3] @ [0, 1, 0], [0, 0, 1])
    np.testing.assert_allclose(m[:3, :3] @ [0, 0, 1], [0, -1, 0])
    np.testing.assert_allclose(m[:3, :3] @ [1, 0, 0], [1, 0, 0])


def test_compose_application_order():
    # SURVEY §2.4.2: compose reads left-to-right in application order.
    t = math3d.translation([1.0, 0.0, 0.0])
    s = math3d.scaling(2.0)
    # Apply translation FIRST, then scale: p=(0,0,0) -> (1,0,0) -> (2,0,0).
    m = math3d.compose(t, s)
    np.testing.assert_allclose(math3d.transform_point(m, [0, 0, 0]), [2, 0, 0])
    # Scale first, then translate: (0,0,0) -> (0,0,0) -> (1,0,0).
    m2 = math3d.compose(s, t)
    np.testing.assert_allclose(math3d.transform_point(m2, [0, 0, 0]), [1, 0, 0])


def test_trs_order_scale_first():
    # glTF TRS: M = T*R*S (scale applied first).
    m = math3d.trs([1, 0, 0], [0, 0, 0, 1], [2, 2, 2])
    np.testing.assert_allclose(math3d.transform_point(m, [1, 0, 0]), [3, 0, 0])


def test_rotation_quat_identity_and_90deg():
    np.testing.assert_allclose(math3d.rotation_quat([0, 0, 0, 1]), np.eye(4))
    # 90 deg about +Z: quat (0, 0, sin45, cos45); x -> y.
    s = math.sin(math.pi / 4)
    m = math3d.rotation_quat([0, 0, s, math.cos(math.pi / 4)])
    np.testing.assert_allclose(math3d.transform_point(m, [1, 0, 0]), [0, 1, 0], atol=1e-6)


def test_rotation_axis_matches_quat():
    axis = np.array([0.3, -0.5, 0.8])
    angle = 1.234
    a = math3d.normalize(axis)
    q = np.append(a * math.sin(angle / 2), math.cos(angle / 2))
    np.testing.assert_allclose(
        math3d.rotation_axis(angle, axis), math3d.rotation_quat(q), atol=1e-6
    )


def test_look_at_demo_camera():
    # Demo camera: position (0,0,-2.5) target (0,0,1) up (0,-1,0)
    # (src/Engine.zig:157-160). Forward=(0,0,1), right=(1,0,0),
    # local_up=(0,-1,0).
    view = math3d.look_at([0, 0, -2.5], [0, 0, 1], [0, -1, 0])
    np.testing.assert_allclose(view[0, :3], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(view[1, :3], [0, -1, 0], atol=1e-6)
    np.testing.assert_allclose(view[2, :3], [0, 0, 1], atol=1e-6)
    # A point at the camera position maps to view-space origin.
    np.testing.assert_allclose(math3d.transform_point(view, [0, 0, -2.5]), [0, 0, 0], atol=1e-6)
    # World origin is 2.5 ahead (+Z) of the camera.
    np.testing.assert_allclose(math3d.transform_point(view, [0, 0, 0]), [0, 0, 2.5], atol=1e-6)


def test_perspective_reversed_z_infinite_far():
    # SURVEY §2.4.3: near maps to NDC depth 1, infinity to 0.
    near = 0.01
    p = math3d.perspective_inverse_depth(math.radians(80.0), 16 / 9, near)
    clip = p @ np.array([0, 0, near, 1], dtype=np.float32)
    assert clip[3] == pytest.approx(near)
    assert clip[2] / clip[3] == pytest.approx(1.0)
    clip_far = p @ np.array([0, 0, 1e9, 1], dtype=np.float32)
    assert clip_far[2] / clip_far[3] == pytest.approx(0.0, abs=1e-7)
    # Focal length: x = cot(vfov/2)/aspect.
    focal = 1.0 / math.tan(math.radians(40.0))
    assert p[0, 0] == pytest.approx(focal / (16 / 9), rel=1e-6)
    assert p[1, 1] == pytest.approx(focal, rel=1e-6)


def test_forward_from_euler():
    # SURVEY §2.4.5: (cos p sin y, sin p, cos p cos y).
    np.testing.assert_allclose(math3d.forward_from_euler(0.0, 0.0), [0, 0, 1], atol=1e-7)
    np.testing.assert_allclose(
        math3d.forward_from_euler(0.0, math.pi / 2), [1, 0, 0], atol=1e-7
    )
    np.testing.assert_allclose(
        math3d.forward_from_euler(math.pi / 2, 0.0), [0, 1, 0], atol=1e-7
    )


def test_normal_matrix_inverse_transpose():
    m = math3d.compose(math3d.scaling([2.0, 1.0, 1.0]), math3d.translation([5, 6, 7]))
    n = math3d.normal_matrix(m)
    # Normals of a plane with normal +X under scale (2,1,1): inverse
    # transpose scales x by 1/2 (then needs renormalization).
    np.testing.assert_allclose(n @ [1, 0, 0], [0.5, 0, 0], atol=1e-6)
    # Translation must not affect the normal matrix.
    np.testing.assert_allclose(n, math3d.normal_matrix(math3d.scaling([2.0, 1.0, 1.0])), atol=1e-6)


def test_normalize_zero_safe():
    np.testing.assert_array_equal(math3d.normalize([0.0, 0.0, 0.0]), [0, 0, 0])
