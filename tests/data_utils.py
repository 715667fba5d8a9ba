"""Synthetic tiny-scene generation for tests: a Blender-style NR dataset
(transforms_*.json + PNGs with alpha + per-frame pl_pos) rendered
analytically from a lambertian sphere — no reference data needed."""
from __future__ import annotations

import json
import pathlib

import numpy as np


def look_at_pose(eye: np.ndarray) -> np.ndarray:
    """Camera-to-world with -z forward looking at the origin, y-ish up."""
    forward = -eye / np.linalg.norm(eye)  # direction of view (-z axis)
    up = np.array([0.0, 1.0, 0.0])
    if abs(np.dot(forward, up)) > 0.95:
        up = np.array([0.0, 0.0, 1.0])
    right = np.cross(forward, up)
    right /= np.linalg.norm(right)
    true_up = np.cross(right, forward)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0] = right
    c2w[:3, 1] = true_up
    c2w[:3, 2] = -forward  # camera z points backward
    c2w[:3, 3] = eye
    return c2w


def render_sphere_image(
    c2w: np.ndarray, pl: np.ndarray, H: int, W: int, focal: float, radius: float = 0.5
) -> np.ndarray:
    """Analytic lambertian sphere with point light + hard shadow -> RGBA."""
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    dirs = np.stack(
        [
            (xs + 0.5 - W / 2.0) / focal,
            -(ys + 0.5 - H / 2.0) / focal,
            -np.ones_like(xs, dtype=np.float32),
        ],
        axis=-1,
    )
    R, t = c2w[:3, :3], c2w[:3, 3]
    rays_d = dirs @ R.T
    rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = np.broadcast_to(t, rays_d.shape)

    b = 2.0 * np.sum(rays_o * rays_d, axis=-1)
    c = np.sum(rays_o * rays_o, axis=-1) - radius ** 2
    disc = b ** 2 - 4 * c
    hit = disc > 0
    t_hit = (-b - np.sqrt(np.maximum(disc, 0.0))) / 2.0
    pts = rays_o + rays_d * t_hit[..., None]
    normals = pts / radius
    to_light = pl - pts
    to_light /= np.linalg.norm(to_light, axis=-1, keepdims=True) + 1e-9
    lambert = np.clip(np.sum(normals * to_light, axis=-1), 0.0, 1.0)
    rgb = np.stack([lambert * 0.9, lambert * 0.7, lambert * 0.5], axis=-1)
    alpha = hit.astype(np.float32)
    return np.concatenate([rgb * alpha[..., None], alpha[..., None]], axis=-1)


def make_synthetic_scene(
    basedir,
    n_train: int = 6,
    n_val: int = 2,
    n_test: int = 3,
    H: int = 32,
    W: int = 32,
    seed: int = 0,
) -> pathlib.Path:
    """Write a complete tiny NR dataset to ``basedir``; returns the path."""
    import imageio.v3 as iio

    basedir = pathlib.Path(basedir)
    basedir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    focal = 0.5 * W / np.tan(0.5 * 0.8)

    counts = {"train": n_train, "val": n_val, "test": n_test}
    for split, n in counts.items():
        (basedir / split).mkdir(exist_ok=True)
        frames = []
        for i in range(n):
            theta = rng.uniform(0, 2 * np.pi)
            phi = rng.uniform(0.3, 1.2)
            eye = 2.5 * np.array(
                [np.cos(theta) * np.sin(phi), np.cos(phi), np.sin(theta) * np.sin(phi)]
            )
            pl = 3.0 * np.array(
                [
                    np.cos(theta + 0.5) * np.sin(phi + 0.2),
                    abs(np.cos(phi + 0.3)),
                    np.sin(theta + 0.5) * np.sin(phi + 0.2),
                ]
            )
            c2w = look_at_pose(eye)
            rgba = render_sphere_image(c2w, pl, H, W, focal)
            rel = f"{split}/r_{i}"
            iio.imwrite(
                basedir / f"{rel}.png", (np.clip(rgba, 0, 1) * 255).astype(np.uint8)
            )
            frames.append(
                {
                    "file_path": rel,
                    "transform_matrix": c2w.tolist(),
                    "pl_pos": pl.tolist(),
                }
            )
        meta = {"camera_angle_x": 0.8, "frames": frames}
        (basedir / f"transforms_{split}.json").write_text(json.dumps(meta))
    return basedir
