"""Round-5 eval-path coverage: the device-built pixel-grid view render,
the regular-view detector that gates it, the async dispatch/finalize
pipelining API, and the train/eval reflectance-trunk split.

These paths shipped in round 5 (PROFILE.md phases L/O/Q: the whole-image
eval rate went 29.5k -> 72.2k rays/s by building the pixel grid on device
and pipelining transfers) and replace the reference's python chunk loop
(``/root/reference/models/neus_hint_model.py:434-474``,
``pipelines/base_pipeline.py:50-69``).  The contract under test: every
fast path must be numerically interchangeable with the generic padded
chunk sweep it bypasses."""
import dataclasses

import jax
import numpy as np
import pytest

from nrhints_tpu.data.manager import DataManager
from nrhints_tpu.data.parser import parse_load_nr_data
from nrhints_tpu.eval.evaluator import Evaluator
from nrhints_tpu.train.trainer import Trainer
from tests.data_utils import make_synthetic_scene
from tests.test_trainer_e2e import e2e_config


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    d = make_synthetic_scene(tmp_path_factory.mktemp("scene_evalpaths"))
    return parse_load_nr_data(d)


@pytest.fixture(scope="module")
def setup(scene, tmp_path_factory):
    """One untrained trainer shared by every test here: init params are as
    good as trained ones for path-equivalence checks, and skipping the
    train loop keeps this module cheap."""
    cfg = e2e_config(tmp_path_factory.mktemp("runs_evalpaths"))
    trainer = Trainer(cfg, scene=scene)
    params = jax.device_get(trainer.state.params)
    buffers = jax.device_get(trainer.buffers)
    dm = DataManager(scene, batch_size=cfg.model.batch_size)
    return cfg, trainer, params, buffers, dm


def _force_generic(ev: Evaluator) -> Evaluator:
    """Disable the regular-view detector so render_image takes the generic
    per-ray-bundle upload path."""
    ev._regular_view = lambda *a, **k: None
    return ev


def test_regular_view_detector(setup):
    """_regular_view accepts exactly the plain full-image bundles (meshgrid
    pixel indices, one pose/light/index) and rejects anything else — a
    false positive would silently render the wrong pixels."""
    cfg, trainer, params, buffers, dm = setup
    ev = Evaluator(cfg, trainer.camera, buffers, mesh=None)
    pixels = dm.get_test_view(0)
    H, W = pixels.h_indices.shape

    reg = ev._regular_view(pixels, H, W)
    assert reg is not None
    pose, pl, img_idx = reg
    np.testing.assert_array_equal(np.asarray(pose), np.asarray(pixels.poses)[0, 0])
    np.testing.assert_array_equal(np.asarray(pl), np.asarray(pixels.pls)[0, 0])
    assert int(img_idx) == int(np.asarray(pixels.img_indices)[0, 0])

    # Mixed poses within the bundle -> generic path.
    p2 = np.asarray(pixels.poses).copy()
    p2[-1, -1, 0, 3] += 1e-3
    assert ev._regular_view(dataclasses.replace(pixels, poses=p2), H, W) is None

    # Shuffled pixel columns -> generic path.
    w2 = np.asarray(pixels.w_indices).copy()
    w2[:, [0, 1]] = w2[:, [1, 0]]
    assert ev._regular_view(dataclasses.replace(pixels, w_indices=w2), H, W) is None

    # Mixed image indices -> generic path.
    ii = np.asarray(pixels.img_indices).copy()
    ii[0, 0] += 1
    assert ev._regular_view(dataclasses.replace(pixels, img_indices=ii), H, W) is None

    # A crop NOT starting at pixel (0,0) (last H-1 rows) -> generic path.
    crop = jax.tree_util.tree_map(lambda x: x[1:], pixels)
    assert ev._regular_view(crop, H - 1, W) is None

    # Video bundles carry no img_indices: still the device-grid path.
    vid = dataclasses.replace(pixels, img_indices=None, rgb_gt=None)
    reg = ev._regular_view(vid, H, W)
    assert reg is not None and reg[2] is None


@pytest.mark.slow
def test_device_grid_matches_generic_path(setup):
    """The device-built iota pixel grid must reproduce the generic
    host-uploaded bundle render exactly (same chunking, same kernels —
    only the upload differs).  Slow tier: test_device_grid_padded_tail
    keeps the same grid-vs-generic equivalence in the fast tier on the
    strictly harder non-dividing-chunk case; this is the exact-divide
    variant at the shipping chunk size."""
    cfg, trainer, params, buffers, dm = setup
    pixels = dm.get_test_view(0)

    ev_grid = Evaluator(cfg, trainer.camera, buffers, mesh=None)
    assert ev_grid._regular_view(pixels, *pixels.h_indices.shape) is not None
    r_grid = ev_grid.render_image(params, pixels)

    ev_gen = _force_generic(Evaluator(cfg, trainer.camera, buffers, mesh=None))
    r_gen = ev_gen.render_image(params, pixels)

    assert set(r_grid) == set(r_gen)
    for k in r_grid:
        np.testing.assert_allclose(r_grid[k], r_gen[k], atol=2e-5, err_msg=k)


def test_device_grid_padded_tail(setup):
    """Chunk size that does not divide H*W: the device-grid path clamps its
    padded tail rays to the last valid pixel and slices them off on host —
    must match the generic path's edge-padded sweep."""
    cfg, trainer, params, buffers, dm = setup
    pixels = dm.get_test_view(1)
    # 32x32 = 1024 rays, chunk 96 -> 11 chunks, 32 dead tail rays.
    cfg96 = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, inference_chunk_size=96)
    )
    r_grid = Evaluator(cfg96, trainer.camera, buffers, mesh=None).render_image(
        params, pixels
    )
    r_gen = _force_generic(
        Evaluator(cfg96, trainer.camera, buffers, mesh=None)
    ).render_image(params, pixels)
    for k in r_grid:
        assert r_grid[k].shape[:2] == pixels.h_indices.shape
        np.testing.assert_allclose(r_grid[k], r_gen[k], atol=2e-5, err_msg=k)


def test_device_grid_sharded_over_mesh(setup):
    """Under an eval mesh the device-grid path shards the in-jit pixel grid
    over 'data' (multi-chip eval keeps the O(1)-per-view upload) — must
    match the generic host-bundle sharded path it replaces."""
    from nrhints_tpu.parallel import mesh as mesh_lib

    cfg, trainer, params, buffers, dm = setup
    pixels = dm.get_test_view(0)

    ev_grid = Evaluator(cfg, trainer.camera, buffers, mesh=mesh_lib.make_mesh(8))
    assert ev_grid.mesh is not None
    assert ev_grid._regular_view(pixels, *pixels.h_indices.shape) is not None
    r_grid = ev_grid.render_image(params, pixels)

    ev_gen = _force_generic(
        Evaluator(cfg, trainer.camera, buffers, mesh=mesh_lib.make_mesh(8))
    )
    r_gen = ev_gen.render_image(params, pixels)
    for k in r_grid:
        np.testing.assert_allclose(r_grid[k], r_gen[k], atol=2e-5, err_msg=k)


def test_render_image_async_pipelined_matches_sequential(setup):
    """Dispatching view k+1 before finalizing view k (the pipelined video/
    eval loop) must return the same images as the blocking calls, in the
    right order."""
    cfg, trainer, params, buffers, dm = setup
    ev = Evaluator(cfg, trainer.camera, buffers, mesh=None)
    v0, v1 = dm.get_test_view(0), dm.get_test_view(1)

    seq0 = ev.render_image(params, v0)
    seq1 = ev.render_image(params, v1)

    fin0 = ev.render_image_async(params, v0)
    fin1 = ev.render_image_async(params, v1)  # dispatched before fin0 runs
    pipe0, pipe1 = fin0(), fin1()

    for k in seq0:
        np.testing.assert_allclose(pipe0[k], seq0[k], atol=1e-6, err_msg=k)
        np.testing.assert_allclose(pipe1[k], seq1[k], atol=1e-6, err_msg=k)
    # The two views are genuinely different renders.
    assert not np.allclose(pipe0["rgb"], pipe1["rgb"])


def test_render_video_single_host(setup, scene, tmp_path):
    """Single-host pipelined video loop (trainer.render_video): dispatches
    frame i+1 before finalizing frame i via render_image_async, writes every
    frame png, and encodes (or gracefully skips) the two mp4 clips.  The
    multi-host variant runs in the slow tier (tests/multihost_worker.py);
    this is the fast-tier single-process path.  Reference:
    trainer.py:382-421."""
    import dataclasses as dc

    cfg, _, _, _, _ = setup
    cfg = dc.replace(
        cfg,
        data=dc.replace(cfg.data, video_frame_num=2),
        base_dir=str(tmp_path),
        exp_name="video",
    )
    trainer = Trainer(cfg, scene=scene)
    trainer.render_video()

    frame_dir = trainer.log_dir / "video" / f"step_{trainer.global_step:07d}"
    frames = sorted(frame_dir.glob("*.png"))
    # Two clips (rotate-view, rotate-light) x video_frame_num frames.
    assert len(frames) == 4
    import imageio.v3 as iio

    imgs = [iio.imread(p) for p in frames]
    assert all(im.shape == imgs[0].shape and im.dtype == np.uint8 for im in imgs)
    # The turntable actually moves: consecutive view-clip frames differ.
    assert not np.array_equal(imgs[0], imgs[1])


@pytest.mark.slow
def test_eval_reflectance_trunk_split(setup):
    """eval_reflectance_impl='xla' (the shipped no-grad eval default) must
    match the Pallas trunk it replaces; both run under fused_kernels='on'
    in interpret mode here (renderer.py:929-931 selects by the static
    is_training flag).  Slow tier: two interpret-mode whole-image fused
    renders (~21 s) — the xla-vs-pallas trunk equivalence is also pinned
    per-component by the core_mlp twin tests."""
    cfg, trainer, params, buffers, dm = setup
    pixels = dm.get_test_view(0)

    def with_impl(impl):
        rcfg = dataclasses.replace(
            cfg.model.renderer,
            fused_kernels="on",
            fused_interpret=True,
            eval_reflectance_impl=impl,
        )
        c = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, renderer=rcfg)
        )
        return Evaluator(c, trainer.camera, buffers, mesh=None).render_image(
            params, pixels
        )

    r_xla = with_impl("xla")
    r_pallas = with_impl("pallas")
    for k in r_xla:
        # The two trunks run the same f32 math with different blocking /
        # reduction order (Pallas row blocks vs one full-batch matmul);
        # measured max |diff| here is ~2e-4 on rgb after the volume render.
        np.testing.assert_allclose(r_xla[k], r_pallas[k], atol=5e-4, err_msg=k)
