"""Worker process for tests/test_multihost.py — NOT collected by pytest.

Runs one of N jax.distributed processes (CPU backend, 4 virtual devices per
process, gloo cross-process collectives) through the REAL production stack:
Trainer.run() over a global 2-host mesh, strided multi-host eval with the
NaN-padded metric allgather, multi-host video frames + sync, orbax
coordinated checkpoint save, and resume.  Asserts everything in-process and
writes a JSON result blob for the parent test to double-check.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
           <scene_dir> <run_dir> <out_json>
"""
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=4").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import numpy as np


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    scene_dir, run_dir, out_json = sys.argv[4], sys.argv[5], sys.argv[6]

    from nrhints_tpu.parallel import mesh as mesh_lib

    mesh_lib.initialize_multihost(f"localhost:{port}", num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 4 * nproc

    import dataclasses

    from nrhints_tpu.camera.rays import RayGeneratorConfig
    from nrhints_tpu.configs.config import IntervalsConfig, ParallelConfig, SystemConfig
    from nrhints_tpu.data.parser import parse_load_nr_data
    from nrhints_tpu.fields.reflectance import ReflectanceNetConfig
    from nrhints_tpu.fields.sdf import SDFNetConfig
    from nrhints_tpu.render.renderer import ModelConfig, RendererConfig
    from nrhints_tpu.train.trainer import Trainer, _array_to_metrics, _metrics_to_array

    cfg = SystemConfig(
        model=ModelConfig(
            sdf_network=SDFNetConfig(n_layers=2, d_hidden=32, d_out_feat=16),
            reflectance_network=ReflectanceNetConfig(n_layers=2, d_hidden=32),
            renderer=RendererConfig(
                n_samples=8,
                n_importance_samples=8,
                n_shadow_samples=8,
                n_shadow_importance_samples=8,
            ),
            batch_size=32,  # global; 16 rays per host
            inference_chunk_size=128,
            warm_up_end=5,
            end_iter=20,
            anneal_end=10,
        ),
        intervals=IntervalsConfig(
            log_metrics=10,
            save_ckpt=10,
            render_test_views=10_000_000,
            render_video=10_000_000,
            dump_mesh=10_000_000,
        ),
        # steps_per_dispatch>1 exercises make_array_from_process_local_data
        # on the stacked [K, rays] batch axis too.
        parallel=ParallelConfig(steps_per_dispatch=4),
        # SE3 cam-opt + pl-opt ON: the final strided eval registers each
        # test view's pose/light rows on a DIFFERENT host; the ownership
        # merge must fold them all into lockstep state (VERDICT r2 item 4).
        ray_generator=RayGeneratorConfig(cam_opt_mode="SE3", pl_opt=True),
        data=dataclasses.replace(
            SystemConfig().data, testset_skip=1, video_frame_num=2
        ),
        base_dir=run_dir,
        exp_name="mh",
        scene_name="sphere",
        final_mesh_resolution=16,
    )

    scene = parse_load_nr_data(scene_dir)
    trainer = Trainer(cfg, scene=scene)
    assert trainer.process_count == nproc
    assert trainer.local_batch == 32 // nproc
    trainer.run()  # 20 steps + final strided eval over hosts + mesh dump
    assert trainer.global_step == 20

    # (a) Params identical across hosts after training: the replicated
    # computation must stay bitwise in lockstep (DDP broadcast_buffers
    # equivalent is free in the sharded-jit model — this proves it).
    from jax.experimental import multihost_utils

    flat = np.concatenate(
        [np.asarray(x).ravel() for x in jax.tree_util.tree_leaves(jax.device_get(trainer.state.params))]
    )
    rows = np.asarray(multihost_utils.process_allgather(flat))
    for r in range(1, nproc):
        np.testing.assert_array_equal(rows[0], rows[r])

    # (b) The NaN-padded metric allgather decodes unequal per-host view
    # counts (3 test views over 2 hosts -> host0: 2 rows, host1: 1 row).
    local_metrics = (
        [{"psnr": 10.0, "ssim": 0.5}, {"psnr": 20.0, "ssim": 0.6}]
        if pid == 0
        else [{"psnr": 30.0, "ssim": 0.7}]
    )
    gathered = multihost_utils.process_allgather(_metrics_to_array(local_metrics, n_rows=2))
    decoded = _array_to_metrics(gathered)
    assert len(decoded) == 3, decoded
    assert sorted(m["psnr"] for m in decoded) == [10.0, 20.0, 30.0]

    # The real strided eval ran inside run(); every host fed the gather.
    log_lines = [
        json.loads(l)
        for l in (trainer.log_dir / "metrics.jsonl").read_text().splitlines()
    ]
    val_logs = [l for l in log_lines if "val/psnr" in l]
    if trainer.is_main_process:
        assert val_logs, "final eval must log val metrics on the main process"

    # (c) Multi-host video: each host renders its frame stripe, frames hop
    # to the main process through process_allgather (no shared-filesystem
    # assumption), and the main process writes all 4 (2 clips x 2).
    trainer.render_video()
    frame_dir = trainer.log_dir / "video" / f"step_{trainer.global_step:07d}"
    if trainer.is_main_process:
        assert len(sorted(frame_dir.glob("*.png"))) == 4
    multihost_utils.sync_global_devices("test_video_files")

    # (f) Multihost test-time registration PERSISTED (VERDICT r2 item 4):
    # the final eval registered view 0,2 on host0 and view 1 on host1; the
    # ownership merge must leave every test view's pose AND light rows
    # nonzero on BOTH hosts, with the tables in cross-host lockstep
    # (covered by (a) above — params include the merged raygen tables).
    rg_tables = jax.device_get(trainer.state.params)["raygen"]
    test_rows = [
        int(np.asarray(trainer.data_manager.get_test_view(i).img_indices).reshape(-1)[0])
        for i in range(trainer.data_manager.test_view_num)
    ]
    assert len(test_rows) == 3
    for key in ("cam_pose_adjustment", "pl_adjustment"):
        tab = np.asarray(rg_tables[key])
        for r in test_rows:
            assert np.abs(tab[r]).max() > 0, f"{key} row {r} not registered"

    # (d) Orbax coordinated save happened at steps 10 and 20 inside run();
    # a fresh Trainer on the same run dir resumes on every host.  The final
    # eval's registered raygen rows postdate the last save (reference
    # semantics: register_view mutates the live model without re-saving),
    # so resume equality is asserted on the renderer subtree.
    t2 = Trainer(cfg, scene=scene)
    assert t2.global_step == 20
    assert int(t2.state.step) == 20
    flat_r1 = np.concatenate(
        [np.asarray(x).ravel() for x in jax.tree_util.tree_leaves(
            jax.device_get(trainer.state.params)["renderer"])]
    )
    flat_r2 = np.concatenate(
        [np.asarray(x).ravel() for x in jax.tree_util.tree_leaves(
            jax.device_get(t2.state.params)["renderer"])]
    )
    np.testing.assert_array_equal(flat_r1, flat_r2)

    # (e) Resumed sampler streams stay rank-decorrelated and identical to a
    # continuation: one more train step must keep hosts in lockstep.
    t2.train_iter()
    flat3 = np.concatenate(
        [np.asarray(x).ravel() for x in jax.tree_util.tree_leaves(jax.device_get(t2.state.params))]
    )
    rows3 = np.asarray(multihost_utils.process_allgather(flat3))
    for r in range(1, nproc):
        np.testing.assert_array_equal(rows3[0], rows3[r])

    with open(out_json, "w") as f:
        json.dump(
            {
                "pid": pid,
                "global_step": trainer.global_step,
                "val_psnr": val_logs[-1]["val/psnr"] if val_logs else None,
                "params_lockstep": True,
            },
            f,
        )
    print(f"WORKER {pid} OK", flush=True)


if __name__ == "__main__":
    main()
