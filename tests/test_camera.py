"""Camera behavior tests vs src/Camera.zig."""

import math

import numpy as np
import pytest

from tpurast.camera import MOVE_SPEED, PITCH_LIMIT, Camera, MoveDirection


def demo_camera() -> Camera:
    # src/Engine.zig:157-160: position -2.5*forward, target = forward.
    return Camera.from_target([0, 0, -2.5], [0, 0, 1])


def test_init_from_target():
    cam = demo_camera()
    assert cam.pitch == pytest.approx(0.0)
    assert cam.yaw == pytest.approx(0.0)
    np.testing.assert_allclose(cam.forward(), [0, 0, 1], atol=1e-7)


def test_translate_forward_speed():
    cam = demo_camera().translate(0.5, MoveDirection(forward=True))
    # speed 2.0 u/s * 0.5 s = 1 unit along +Z.
    np.testing.assert_allclose(cam.position, [0, 0, -1.5], atol=1e-6)
    assert MOVE_SPEED == 2.0


def test_opposite_keys_cancel():
    cam = demo_camera()
    moved = cam.translate(1.0, MoveDirection(forward=True, backward=True))
    np.testing.assert_allclose(moved.position, cam.position)


def test_strafe_right_with_y_down_world():
    # forward=(0,0,1), world up=(0,-1,0): right = normalize(forward x up)
    # = (1,0,0).
    cam = demo_camera().translate(1.0, MoveDirection(right=True))
    np.testing.assert_allclose(cam.position, [2, 0, -2.5], atol=1e-6)


def test_up_moves_along_world_up():
    cam = demo_camera().translate(1.0, MoveDirection(up=True))
    # world up vector is (0,-1,0).
    np.testing.assert_allclose(cam.position, [0, -2, -2.5], atol=1e-6)


def test_orientation_sensitivity_clamp_wrap():
    cam = demo_camera()
    c2 = cam.update_orientation(100.0, 0.0)
    assert c2.yaw == pytest.approx(0.2)
    # Pitch clamps at +/-(pi/2 - 0.01).
    c3 = cam.update_orientation(0.0, 1e6)
    assert c3.pitch == pytest.approx(PITCH_LIMIT)
    # Yaw wraps into [0, 2pi).
    c4 = cam.update_orientation(-10.0 / 0.002, 0.0)  # -10 rad
    assert 0.0 <= c4.yaw < 2 * math.pi
    assert c4.yaw == pytest.approx((-10.0) % (2 * math.pi))


def test_view_matrix_matches_lookat():
    cam = demo_camera()
    view = cam.view_matrix()
    np.testing.assert_allclose(view[2, :3], [0, 0, 1], atol=1e-6)  # +Z forward
    # local up = (0,-1,0) (world up).
    np.testing.assert_allclose(view[1, :3], [0, -1, 0], atol=1e-6)
