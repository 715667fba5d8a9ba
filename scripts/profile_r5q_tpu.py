"""Round-5 phase Q: the device-grid eval path end-to-end.

Phase L/Q background: the generic whole-image path uploaded a ~7 MB
per-ray pixel bundle per view (per-ray broadcast poses dominating) and
downloaded ~3 MB of maps through serial np.asarray fetches; over the
remote tunnel upload+download cost more than the 0.9 s device render.
The shipped path now builds the grid on device (upload ~100 bytes) and
starts all downloads with copy_to_host_async.  This phase times the
user-visible render_image on a true view bundle, the device-only rate,
and the pipelined 4-view loop.

Usage: python scripts/profile_r5q_tpu.py
"""
from __future__ import annotations

import time

import jax.numpy as jnp
import numpy as np

from nrhints_tpu.utils import enable_compilation_cache
import nrhints_tpu.render.renderer  # noqa: F401
import nrhints_tpu.train.step  # noqa: F401
import nrhints_tpu.kernels.march  # noqa: F401
import nrhints_tpu.kernels.core_mlp  # noqa: F401
import nrhints_tpu.kernels.core_stash  # noqa: F401
from nrhints_tpu.core.structs import PixelBundle
from nrhints_tpu.eval.evaluator import Evaluator
import __graft_entry__
import bench

enable_compilation_cache()


def main():
    n = 65536
    print("=== Phase Q: device-grid eval path (65,536-ray view) ===", flush=True)
    full, device = bench._measure_eval(n)
    print(f"  render_image full (device grid)   {n / full * 1e3:9.1f} ms/view  "
          f"{full:10.1f} rays/s", flush=True)
    print(f"  device-only                       {n / device * 1e3:9.1f} ms/view  "
          f"{device:10.1f} rays/s", flush=True)

    # Pipelined multi-view loop on the same path.
    cfg, camera, params, buffers, pixels = __graft_entry__._flagship_setup(batch=4)
    side = 256
    h, w = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    pose0 = np.asarray(pixels.poses)[0]
    pl0 = np.asarray(pixels.pls)[0]
    view = PixelBundle(
        h_indices=h.astype(np.float32), w_indices=w.astype(np.float32),
        poses=np.broadcast_to(pose0, (side, side, 4, 4)).copy(),
        pls=np.broadcast_to(pl0, (side, side, 3)).copy(),
        img_indices=None, rgb_gt=None,
    )
    ev = Evaluator(cfg, camera, buffers, mesh=None)
    for _ in range(2):
        ev.render_image(params, view)
    views = 4
    t0 = time.perf_counter()
    pending = ev.render_image_async(params, view)
    for i in range(views):
        nxt = ev.render_image_async(params, view) if i + 1 < views else None
        pending()
        pending = nxt
    pipe_s = time.perf_counter() - t0
    print(f"  pipelined 4-view loop             {pipe_s / views * 1e3:9.1f} ms/view  "
          f"{n * views / pipe_s:10.1f} rays/s", flush=True)


if __name__ == "__main__":
    main()
    print("done", flush=True)
