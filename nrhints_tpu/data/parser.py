"""NR-dataset parser: NeRF-Blender transforms_*.json with per-frame point
light positions, loaded into host-RAM numpy arrays.

Schema parity with ``data/data_parser.py`` in iamNCJ/NRHints: per-frame
``file_path``, optional ``file_ext`` (.png/.exr/.npy), ``pl_pos``,
``transform_matrix``; intrinsics from ``camera_intrinsics`` [cx,cy,fx,fy]
or ``camera_angle_x`` fallback; optional ``camera_near/far`` (default 3/10);
half-res resize; white-background alpha compositing.

TPU-native data plane: there is no shared-memory fan-out layer — JAX runs
one process per host, so each host process loads the dataset into ordinary
numpy arrays once (SURVEY.md §5.8).  Multi-host sharding happens at batch
assembly, not at storage.

Deliberate divergence (SURVEY.md §2.3): the reference's half-res intrinsics
set ``cx = cy/2`` (``data/data_parser.py:71``, a typo); we use ``cx/2``.
"""
from __future__ import annotations

import json
import pathlib
from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

from nrhints_tpu.camera.model import CameraModel


@dataclass
class SceneData:
    """Everything loaded from one scene directory (host memory)."""

    images: np.ndarray  # [N, H, W, 3] float32
    poses: np.ndarray  # [N, 4, 4] float32 camera-to-world
    pls: np.ndarray  # [N, 3] float32 point-light positions
    camera: CameraModel
    num_image_per_split: List[int]  # [train, val, test]

    @property
    def total_image_num(self) -> int:
        return int(self.images.shape[0])


def _load_image(path: pathlib.Path, ext: str) -> np.ndarray:
    import imageio.v3 as iio

    if ext == ".npy":
        return np.load(path)
    if ext == ".exr":
        # Prefer an installed imageio EXR backend (freeimage/openexr —
        # battle-tested, full format coverage); fall back to the vendored
        # minimal reader (data/exr.py: scanline NONE/ZIPS/ZIP, half/float —
        # the subset the reference's real captures and Blender emit,
        # reference data/data_parser.py:96-97).
        try:
            return iio.imread(path)  # float HDR, no scaling
        except Exception:
            from nrhints_tpu.data.exr import read_exr

            return read_exr(path)
    return iio.imread(path) / 255.0


def parse_load_nr_data(
    basedir,
    splits: Optional[Sequence[str]] = None,
    half_res: bool = False,
    white_background: bool = True,
) -> SceneData:
    """Load all splits of a scene into host RAM -> SceneData."""
    if splits is None:
        splits = ["train", "val", "test"]
    basedir = pathlib.Path(basedir)

    metas = {}
    for s in splits:
        with open(basedir / f"transforms_{s}.json") as fp:
            metas[s] = json.load(fp)
    num_image_per_split = [len(metas[s]["frames"]) for s in splits]
    total = sum(num_image_per_split)

    meta = metas[splits[0]]
    zn = float(meta.get("camera_near", 3.0))
    zf = float(meta.get("camera_far", 10.0))

    first_frame = meta["frames"][0]
    first_ext = first_frame.get("file_ext", ".png")
    first_image = _load_image(basedir / (first_frame["file_path"] + first_ext), first_ext)
    H, W = first_image.shape[:2]

    if "camera_intrinsics" in meta:
        cx, cy, fx, fy = (float(v) for v in meta["camera_intrinsics"])
    else:
        camera_angle_x = float(meta["camera_angle_x"])
        focal = 0.5 * W / np.tan(0.5 * camera_angle_x)
        cx, cy, fx, fy = W / 2.0, H / 2.0, focal, focal

    if half_res:
        H, W = H // 2, W // 2
        cx, cy, fx, fy = cx / 2.0, cy / 2.0, fx / 2.0, fy / 2.0

    images = np.empty((total, H, W, 3), dtype=np.float32)
    poses = np.empty((total, 4, 4), dtype=np.float32)
    pls = np.empty((total, 3), dtype=np.float32)

    idx = 0
    for s in splits:
        for frame in metas[s]["frames"]:
            ext = frame.get("file_ext", ".png")
            if idx == 0:
                img = first_image  # already decoded for the H/W probe
            else:
                img = _load_image(basedir / (frame["file_path"] + ext), ext)
            if half_res:
                import cv2

                img = cv2.resize(img, (W, H), interpolation=cv2.INTER_AREA)
            if white_background and img.shape[-1] == 4:
                img = img[..., :3] * img[..., 3:] + (1.0 - img[..., 3:])
            else:
                img = img[..., :3]
            images[idx] = img.astype(np.float32)
            poses[idx] = np.asarray(frame["transform_matrix"], dtype=np.float32)
            pls[idx] = np.asarray(frame.get("pl_pos", [0.0, 0.0, 0.0]), dtype=np.float32)
            idx += 1

    return SceneData(
        images=images,
        poses=poses,
        pls=pls,
        camera=CameraModel(H, W, cx, cy, fx, fy, zn, zf),
        num_image_per_split=list(num_image_per_split),
    )
