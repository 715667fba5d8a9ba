"""Tests for the procedural hints scene generator (data/synthetic.py)."""
import numpy as np

from nrhints_tpu.data.parser import parse_load_nr_data
from nrhints_tpu.data.synthetic import (
    DISC_ALBEDO,
    PLANE_Y,
    look_at_pose,
    make_hints_scene,
    render_scene_image,
)


def test_scene_roundtrip_through_parser(tmp_path):
    d = make_hints_scene(tmp_path / "scene", n_train=4, n_val=2, n_test=2, H=24, W=24)
    scene = parse_load_nr_data(str(d))
    assert scene.images.shape == (8, 24, 24, 3)
    assert scene.poses.shape == (8, 4, 4)
    assert scene.pls.shape == (8, 3)
    assert tuple(scene.num_image_per_split) == (4, 2, 2)
    assert np.isfinite(scene.images).all()
    assert scene.images.min() >= 0.0 and scene.images.max() <= 1.0


def test_shadow_moves_with_light():
    """The sphere's cast shadow on the disc must move when only the light
    moves — the signal the shadow hint exists to explain."""
    eye = np.array([0.0, 2.2, 2.2])
    c2w = look_at_pose(eye)
    H = W = 64
    focal = 0.5 * W / np.tan(0.4)
    img_a = render_scene_image(c2w, np.array([2.5, 2.5, 0.0]), H, W, focal)
    img_b = render_scene_image(c2w, np.array([-2.5, 2.5, 0.0]), H, W, focal)
    # identical geometry -> identical alpha
    np.testing.assert_allclose(img_a[..., 3], img_b[..., 3])
    # but shading must differ on a large fraction of hit pixels
    hit = img_a[..., 3] > 0
    diff = np.abs(img_a[..., :3] - img_b[..., :3]).max(-1)
    assert (diff[hit] > 0.05).mean() > 0.3


def test_specular_highlight_present():
    """With the light near the mirror direction, some sphere pixels must be
    far brighter than pure-lambertian shading allows."""
    eye = np.array([0.0, 1.0, 2.6])
    c2w = look_at_pose(eye)
    H = W = 64
    focal = 0.5 * W / np.tan(0.4)
    # light AT the camera -> retro-reflection: the highlight sits where the
    # normal faces the viewer (center of the visible sphere disk), which is
    # always sampled regardless of resolution.  Compare against the
    # diffuse-only render of the same frame.
    img = render_scene_image(c2w, eye.copy(), H, W, focal)
    img_diff = render_scene_image(c2w, eye.copy(), H, W, focal, specular=False)
    assert img[..., :3].max() > 1.1 * img_diff[..., :3].max()
    assert (np.abs(img[..., :3] - img_diff[..., :3]) > 0.05).any()


def test_disc_shadowed_vs_lit_regions():
    """Straight-down view: the disc must contain both lit pixels and pixels
    darkened by the sphere's shadow."""
    eye = np.array([0.05, 2.6, 0.05])
    c2w = look_at_pose(eye)
    H = W = 64
    focal = 0.5 * W / np.tan(0.4)
    img = render_scene_image(c2w, np.array([2.0, 2.0, 1.0]), H, W, focal)
    # ring of disc pixels (outside the sphere silhouette)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    r = np.sqrt((ys - H / 2) ** 2 + (xs - W / 2) ** 2)
    ring = (r > H * 0.25) & (r < H * 0.4) & (img[..., 3] > 0)
    lum = img[..., :3].mean(-1)
    assert lum[ring].max() > 3.0 * max(lum[ring].min(), 1e-3)
