"""Reference-screenshot parity: recovered poses must keep matching.

The reference ships three screenshots (docs/media/*.jpg) and no camera
data. tools/fit_pose.py recovered each pose by silhouette search;
docs/parity/poses.json pins them. These tests re-render the poses at low
resolution and assert the silhouette/crate-mask IoU stays above the
fitted level minus slack — a rendering regression that moves geometry,
camera math, or the projection breaks them.

Known mount limitations (stated tolerance, tools/parity_render.py):
stripped dragon texture + porche.glb mean color comparison is only
meaningful for geometry masks, not texels.
"""

import json
import pathlib

import numpy as np
import pytest
from PIL import Image

from tpurast import math3d
from tpurast.camera import Camera
from tpurast.config import RendererConfig
from tpurast.renderer import Renderer

# Long CPU-interpret renders: excluded from the fast subset
# (`pytest -m 'not slow'`, see README testing section).
pytestmark = pytest.mark.slow

REPO = pathlib.Path(__file__).resolve().parent.parent
POSES = json.load(open(REPO / "docs" / "parity" / "poses.json"))
W, H = 256, 144


def _ref_small(path):
    img = np.asarray(Image.open(path).convert("RGB"))[31:]  # drop title bar
    return np.asarray(Image.fromarray(img).resize((W, H), Image.BILINEAR))


def _brown(img):
    rr = img[..., 0].astype(np.int32)
    gg = img[..., 1].astype(np.int32)
    bb = img[..., 2].astype(np.int32)
    return (rr > 50) & (rr * 10 > gg * 11) & (gg * 10 > bb * 11) & (rr < 240)


def _iou(a, b):
    return (a & b).sum() / max((a | b).sum(), 1)


# Gate = the pose's fitted IoU (docs/parity/poses.json) minus a small
# slack: a real regression trips it, render-noise does not.
IOU_SLACK = 0.05


@pytest.fixture(scope="module")
def demo_scene(data_dir):
    from tpurast.device.scene import load_demo_scene

    return load_demo_scene(str(data_dir))


def test_hello_dragon_silhouette(data_dir):
    from tpurast.assets.gltf import load_glb
    from tpurast.device.scene import build_scene

    spec = POSES["hello_dragon"]
    up = math3d.WORLD_SPACE.up.vector()
    m = load_glb(
        str(data_dir / "meshes/stanford_dragon.glb"),
        post_transform=math3d.translation(up * -1.0),
    )
    scene = build_scene([m], data_dir=str(data_dir))
    r = Renderer(scene, RendererConfig(width=W, height=H, segment_headroom=256))
    cam = Camera.from_target(
        np.asarray(spec["position"], np.float32), np.asarray(spec["target"], np.float32)
    )
    depth = np.asarray(r.render(cam)["depth"])
    ours = depth > 0.0

    ref = _ref_small(spec["ref"])
    corners = np.concatenate([ref[2:10, -10:-2], ref[-10:-2, 2:10], ref[-10:-2, -10:-2]])
    bg = np.median(corners.reshape(-1, 3), axis=0)
    mask_ref = np.abs(ref.astype(np.float32) - bg).sum(-1) > 110
    assert _iou(ours, mask_ref) > spec["iou"] - IOU_SLACK, (
        "dragon silhouette drifted from the screenshot pose"
    )


@pytest.mark.parametrize("name", ["specular_map", "complex_textured_models"])
def test_crate_pose_parity(demo_scene, name):
    spec = POSES[name]
    r = Renderer(demo_scene, RendererConfig(width=W, height=H, segment_headroom=256))
    cam = Camera.from_target(
        np.asarray(spec["position"], np.float32), np.asarray(spec["target"], np.float32)
    )
    ours = _brown(r.render_to_host(cam))
    mask_ref = _brown(_ref_small(spec["ref"]))
    assert _iou(ours, mask_ref) > spec["iou"] - IOU_SLACK, (
        f"{name}: crate mask drifted from the screenshot pose"
    )
