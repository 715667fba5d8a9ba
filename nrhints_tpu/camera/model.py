"""Pinhole camera intrinsics (single camera per scene).

Mirrors the reference ``camera/camera_model.py`` CameraModel fields.
Frozen/hashable so it can ride along as a jit static argument.
"""
from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class CameraModel:
    H: int
    W: int
    cx: float
    cy: float
    fx: float
    fy: float
    zn: float
    zf: float
