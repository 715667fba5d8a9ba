"""Vendored minimal EXR codec (data/exr.py) + the parser's .exr fallback.

No EXR backend exists in this image (imageio has no freeimage plugin, cv2
is built without OpenEXR), yet the reference reads its real captures as EXR
(``/root/reference/data/data_parser.py:96-97``).  These tests round-trip the
vendored reader against independently constructed files across the format
matrix it claims (NONE/ZIPS/ZIP x half/float x 1/3/4 channels, partial final
ZIP chunks, raw-stored incompressible chunks) and run the full dataset
parser over an EXR scene.
"""
import json

import numpy as np
import pytest

from nrhints_tpu.data.exr import read_exr, write_exr
from nrhints_tpu.data.parser import parse_load_nr_data
from tests.data_utils import make_synthetic_scene


@pytest.mark.parametrize("compression", ["none", "zips", "zip"])
@pytest.mark.parametrize("pixel_type", ["half", "float"])
def test_roundtrip_rgb(tmp_path, compression, pixel_type):
    rng = np.random.default_rng(0)
    # H=37 exercises a partial final ZIP chunk (37 = 2*16 + 5 lines).
    img = rng.random((37, 13, 3)).astype(np.float32)
    p = tmp_path / f"t_{compression}_{pixel_type}.exr"
    write_exr(p, img, compression=compression, pixel_type=pixel_type)
    back = read_exr(p)
    assert back.shape == img.shape and back.dtype == np.float32
    atol = 1e-3 if pixel_type == "half" else 0.0
    np.testing.assert_allclose(back, img, atol=atol)


def test_roundtrip_rgba_and_gray(tmp_path):
    rng = np.random.default_rng(1)
    rgba = rng.random((8, 8, 4)).astype(np.float32)
    write_exr(tmp_path / "a.exr", rgba, pixel_type="float")
    np.testing.assert_allclose(read_exr(tmp_path / "a.exr"), rgba)

    gray = rng.random((8, 8)).astype(np.float32)
    write_exr(tmp_path / "g.exr", gray, pixel_type="float")
    np.testing.assert_allclose(read_exr(tmp_path / "g.exr"), gray[..., None])


def test_hdr_values_and_compression_agreement(tmp_path):
    """HDR (>1, negative) float values survive exactly, and all three
    compression modes decode to the identical image."""
    rng = np.random.default_rng(2)
    img = (rng.standard_normal((19, 7, 3)) * 100.0).astype(np.float32)
    outs = []
    for comp in ("none", "zips", "zip"):
        p = tmp_path / f"h_{comp}.exr"
        write_exr(p, img, compression=comp, pixel_type="float")
        outs.append(read_exr(p))
    np.testing.assert_array_equal(outs[0], img)
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])


def test_zip_raw_storage_fallback(tmp_path):
    """Incompressible (random half bits) chunks are stored raw per spec —
    the reader must take the size<expected branch only when actually
    compressed."""
    rng = np.random.default_rng(3)
    img = rng.random((16, 16, 3)).astype(np.float32)
    write_exr(tmp_path / "r.exr", img, compression="zip", pixel_type="half")
    np.testing.assert_allclose(read_exr(tmp_path / "r.exr"), img, atol=1e-3)


def test_rejects_non_exr(tmp_path):
    p = tmp_path / "bad.exr"
    p.write_bytes(b"\x89PNG\r\n\x1a\nnot an exr")
    with pytest.raises(ValueError, match="magic"):
        read_exr(p)


def test_parser_exr_file_ext(tmp_path):
    """End-to-end: a scene whose frames are EXR loads through
    parse_load_nr_data and matches the png pipeline (reference
    data_parser.py:87-99 treats .exr as linear float, no scaling)."""
    import imageio.v3 as iio

    d = make_synthetic_scene(tmp_path / "exr_scene")
    for split in ("train", "val", "test"):
        tf = d / f"transforms_{split}.json"
        meta = json.loads(tf.read_text())
        for frame in meta["frames"]:
            rgba = iio.imread(d / (frame["file_path"] + ".png")) / 255.0
            write_exr(
                d / (frame["file_path"] + ".exr"),
                rgba.astype(np.float32),
                compression="zip",
                pixel_type="half",
            )
            frame["file_ext"] = ".exr"
        tf.write_text(json.dumps(meta))

    sc = parse_load_nr_data(d)
    assert sc.images.shape == (11, 32, 32, 3)
    assert np.isfinite(sc.images).all()
    # EXR (half) round-trip matches the png pipeline within half precision.
    d_png = make_synthetic_scene(tmp_path / "png_scene")
    ref = parse_load_nr_data(d_png)
    np.testing.assert_allclose(sc.images, ref.images, atol=2e-3)
