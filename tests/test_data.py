import json

import numpy as np
import pytest

from nrhints_tpu.data.manager import DataManager
from nrhints_tpu.data.parser import parse_load_nr_data
from nrhints_tpu.data.sampler import PixelSampler, PixelSamplingStrategy
from tests.data_utils import make_synthetic_scene


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    return make_synthetic_scene(tmp_path_factory.mktemp("scene"))


@pytest.fixture(scope="module")
def scene(scene_dir):
    return parse_load_nr_data(scene_dir)


def test_parser_shapes_and_camera(scene):
    assert scene.images.shape == (11, 32, 32, 3)
    assert scene.poses.shape == (11, 4, 4)
    assert scene.pls.shape == (11, 3)
    assert scene.num_image_per_split == [6, 2, 3]
    cam = scene.camera
    assert cam.H == cam.W == 32
    focal = 0.5 * 32 / np.tan(0.4)
    np.testing.assert_allclose(cam.fx, focal, rtol=1e-5)
    np.testing.assert_allclose(cam.cx, 16.0)
    assert cam.zn == 3.0 and cam.zf == 10.0


def test_parser_white_background(scene):
    # Background pixels (alpha=0) must composite to white.
    corner = scene.images[:, 0, 0, :]
    np.testing.assert_allclose(corner, 1.0, atol=1e-2)


def test_parser_black_background(scene_dir):
    sc = parse_load_nr_data(scene_dir, white_background=False)
    # Without compositing, only rgb channels are kept (premultiplied black bg).
    corner = sc.images[:, 0, 0, :]
    np.testing.assert_allclose(corner, 0.0, atol=1e-2)


def test_parser_camera_intrinsics_field(tmp_path):
    d = make_synthetic_scene(tmp_path / "s2", n_train=1, n_val=1, n_test=1)
    for split in ("train", "val", "test"):
        p = d / f"transforms_{split}.json"
        meta = json.loads(p.read_text())
        meta["camera_intrinsics"] = [10.0, 12.0, 40.0, 41.0]
        meta["camera_near"] = 1.5
        meta["camera_far"] = 7.0
        p.write_text(json.dumps(meta))
    sc = parse_load_nr_data(d)
    assert (sc.camera.cx, sc.camera.cy, sc.camera.fx, sc.camera.fy) == (10, 12, 40, 41)
    assert (sc.camera.zn, sc.camera.zf) == (1.5, 7.0)


def test_sampler_rank_decorrelation():
    common = dict(train_image_num=10, H=32, W=32, batch_size=64)
    s0 = PixelSampler(**common, local_rank=0, strategy=PixelSamplingStrategy.SAME_IMAGE)
    s1 = PixelSampler(**common, local_rank=1, strategy=PixelSamplingStrategy.SAME_IMAGE)
    b0, b1 = s0.sample_batch(), s1.sample_batch()
    # SAME_IMAGE: all ranks pick the same image...
    np.testing.assert_array_equal(b0.img_indices, b1.img_indices)
    # ...but different pixels.
    assert not np.array_equal(b0.h_indices, b1.h_indices)

    a0 = PixelSampler(**common, local_rank=0, strategy=PixelSamplingStrategy.ALL_IMAGES)
    a1 = PixelSampler(**common, local_rank=1, strategy=PixelSamplingStrategy.ALL_IMAGES)
    assert not np.array_equal(a0.sample_batch().img_indices, a1.sample_batch().img_indices)


def test_sampler_state_roundtrip():
    s = PixelSampler(train_image_num=10, H=32, W=32, batch_size=16)
    s.sample_batch()
    state = s.get_state()
    b1 = s.sample_batch()
    s.set_state(state)
    b2 = s.sample_batch()
    np.testing.assert_array_equal(b1.img_indices, b2.img_indices)
    np.testing.assert_array_equal(b1.h_indices, b2.h_indices)
    np.testing.assert_array_equal(b1.w_indices, b2.w_indices)


def test_manager_train_batch(scene):
    dm = DataManager(scene, batch_size=32)
    b = dm.next_train_batch()
    assert b.h_indices.shape == (32,)
    assert b.poses.shape == (32, 4, 4)
    assert b.pls.shape == (32, 3)
    assert b.rgb_gt.shape == (32, 3)
    # Training batches only draw from the train split.
    assert (b.img_indices < 6).all()
    # Ground truth actually corresponds to the indexed pixel.
    i = 5
    np.testing.assert_array_equal(
        b.rgb_gt[i],
        scene.images[b.img_indices[i], int(b.h_indices[i]), int(b.w_indices[i])],
    )


def test_manager_view_limit(scene):
    dm = DataManager(scene, batch_size=64, training_view_num_limit=2)
    for _ in range(5):
        assert (dm.next_train_batch().img_indices < 2).all()


def test_manager_test_view(scene):
    dm = DataManager(scene, batch_size=8)
    assert dm.test_view_num == 3
    v = dm.get_test_view(0)
    assert v.h_indices.shape == (32, 32)
    assert v.rgb_gt.shape == (32, 32, 3)
    assert (v.img_indices == 8).all()  # 6 train + 2 val


def test_manager_video_bundles(scene):
    dm = DataManager(scene, batch_size=8)
    vb = dm.get_video_pixel_bundles(4)
    assert len(vb) == 8  # two clips of 4
    f = vb[0]
    assert f.poses.shape == (32, 32, 4, 4)
    assert f.img_indices is None and f.rgb_gt is None


def test_parser_npy_file_ext(tmp_path):
    """Frames with file_ext=.npy (float HDR arrays) load without scaling
    (reference data_parser.py:87-99 handles .png/.exr/.npy)."""
    import json

    from tests.data_utils import make_synthetic_scene

    d = make_synthetic_scene(tmp_path / "npy_scene")
    for split in ("train", "val", "test"):
        tf = d / f"transforms_{split}.json"
        meta = json.loads(tf.read_text())
        for frame in meta["frames"]:
            png = d / (frame["file_path"] + ".png")
            import imageio.v3 as iio

            rgba = iio.imread(png) / 255.0
            np.save(d / (frame["file_path"] + ".npy"), rgba.astype(np.float32))
            frame["file_ext"] = ".npy"
        tf.write_text(json.dumps(meta))

    sc = parse_load_nr_data(d)
    assert sc.images.dtype == np.float32
    assert np.isfinite(sc.images).all()
    # npy round-trip matches the png pipeline to quantization error.
    ref = parse_load_nr_data(_strip_ext(d, tmp_path / "png_scene"))
    np.testing.assert_allclose(sc.images, ref.images, atol=1.5 / 255)


def _strip_ext(src, dst):
    """Copy a scene dir, dropping the file_ext override (back to .png)."""
    import json
    import shutil

    shutil.copytree(src, dst)
    for split in ("train", "val", "test"):
        tf = dst / f"transforms_{split}.json"
        meta = json.loads(tf.read_text())
        for frame in meta["frames"]:
            frame.pop("file_ext", None)
        tf.write_text(json.dumps(meta))
    return dst
