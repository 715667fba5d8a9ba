"""Metrics/observability: always-on JSONL + CSV to the run dir, optional
wandb when available.

Replaces the reference's wandb-only logging (``trainer/trainer.py:71-80,
253-254,312-323`` in iamNCJ/NRHints) with a thin logger interface; the
scalar/image surface matches ({loss, rgb_loss, eikonal_loss, s_val, psnr}
at the metrics interval, ``val/*`` means at eval).  Also tracks the
north-star throughput counter (rays/s) per logging interval.
"""
from __future__ import annotations

import csv
import json
import pathlib
import time
from typing import Mapping, Optional


class MetricsLogger:
    def __init__(self, run_dir, use_wandb: bool = False, wandb_kwargs: Optional[dict] = None):
        self.run_dir = pathlib.Path(run_dir)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.run_dir / "metrics.jsonl", "a", buffering=1)
        self._csv_path = self.run_dir / "metrics.csv"
        self._csv_file = None
        self._csv_writer = None
        self._csv_fields = None
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(**(wandb_kwargs or {}))
            except Exception:
                self._wandb = None

    def log(self, metrics: Mapping[str, float], step: int) -> None:
        record = {"step": int(step), "ts": time.time()}
        record.update({k: float(v) for k, v in metrics.items()})
        self._jsonl.write(json.dumps(record) + "\n")

        fields = list(record.keys())
        if self._csv_writer is None or fields != self._csv_fields:
            if self._csv_file:
                self._csv_file.close()
            self._csv_file = open(self._csv_path, "a", newline="", buffering=1)
            self._csv_writer = csv.DictWriter(self._csv_file, fieldnames=fields, extrasaction="ignore")
            self._csv_fields = fields
            # Header on EVERY field change (train metrics and val/* metrics
            # interleave): appending rows under a stale header would silently
            # misalign columns for the rest of the run.
            self._csv_writer.writeheader()
        self._csv_writer.writerow(record)

        if self._wandb is not None:
            self._wandb.log(dict(metrics), step=step)

    def log_image(self, name: str, image, step: int) -> None:
        """Images always go to disk; wandb mirrors when active."""
        import numpy as np

        img_dir = self.run_dir / "logged_images"
        img_dir.mkdir(exist_ok=True)
        arr = np.asarray(image)
        if arr.ndim == 3 and arr.shape[-1] == 1:
            arr = arr[..., 0]
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
        import imageio.v3 as iio

        iio.imwrite(img_dir / f"{name}_step_{step:07d}.png", arr)
        if self._wandb is not None:
            self._wandb.log({name: self._wandb.Image(arr)}, step=step)

    def close(self) -> None:
        self._jsonl.close()
        if self._csv_file:
            self._csv_file.close()
        if self._wandb is not None:
            self._wandb.finish()
