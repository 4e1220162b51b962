"""Distillation (train/distill.py) + turbo serving preset tests.

The distilled-student pipeline is a framework extension (the reference
always serves the full pipeline, …inference_handler.py:166-277); these
tests exercise the full loop at CPU-tractable sizes: teacher training ->
teacher-view rendering -> student distillation -> sidecar save/load ->
NeRFRenderer(preset="turbo") serving.
"""

import os

import jax
import numpy as np
import pytest

from nerf_workspaces_explorer_tpu.core.config import (
    ExperimentConfig,
    FrameworkConfig,
    LoggingConfig,
    ModelConfig,
    RenderingConfig,
)
from nerf_workspaces_explorer_tpu.data import make_synthetic_scene
from nerf_workspaces_explorer_tpu.train import Trainer
from nerf_workspaces_explorer_tpu.train.distill import (
    distill_student,
    office_distill_poses,
    read_turbo_metadata,
    render_teacher_views,
    save_turbo_checkpoint,
    student_spec_from_meta,
    turbo_sidecar_path,
)

H, W = 24, 32


def _silent_logging():
    return LoggingConfig(
        step_log_print=0,
        step_log_tensorboard=2**31 - 1,
        step_save_ckpt=0,
        step_render_test=0,
        step_render_train=0,
    )


@pytest.fixture(scope="module")
def tiny_teacher(tmp_path_factory):
    """A small teacher trained briefly on the synthetic scene."""
    cfg = FrameworkConfig(
        experiment=ExperimentConfig(image_width=W, image_height=H),
        model=ModelConfig(net_depth=4, net_width=64, net_depth_fine=4,
                          net_width_fine=64, chunk=4096),
        rendering=RenderingConfig(
            n_rays=256, n_samples=16, n_importance=16, num_freqs_3d=6,
            num_freqs_2d=2, depth_range=(0.1, 6.0), raw_noise_std=1.0,
        ),
        logging=_silent_logging(),
    )
    train, test, _ = make_synthetic_scene(n_train=4, n_test=1, height=H, width=W)
    trainer = Trainer(
        "distill_teacher", cfg, train_data=train, test_data=test,
        save_dir=str(tmp_path_factory.mktemp("teacher")),
        enable_tensorboard=False, seed=0,
    )
    trainer.setup()
    for i in range(120):
        trainer.step(i)
    poses = np.concatenate([train.camera_pose, test.camera_pose], axis=0)
    return trainer, cfg, poses


def test_render_teacher_views_shapes(tiny_teacher):
    trainer, cfg, poses = tiny_teacher
    rgb = render_teacher_views(
        trainer.params, trainer._spec, trainer._settings, poses[:2], H, W,
        near=0.1, far=6.0, use_pallas=False,
    )
    assert rgb.shape == (2, H, W, 3)
    assert np.isfinite(rgb).all()
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0
    # A trained teacher renders structure, not a constant field.
    assert rgb.std() > 0.01


def test_distill_and_turbo_roundtrip(tiny_teacher, tmp_path):
    trainer, cfg, poses = tiny_teacher

    student_params, student_cfg, report = distill_student(
        trainer.params, trainer._spec, trainer._settings, poses,
        height=H, width=W, near=0.1, far=6.0, steps=60,
        depth=2, net_width=32, num_freqs_3d=5, n_holdout=1,
        use_pallas=False, log_every=0, name="distill_test",
    )
    assert "proposal" in student_params and "fine" in student_params
    assert np.isfinite(report["psnr_vs_teacher"])
    # 60 steps won't converge; just require better-than-garbage (a black
    # frame against these scenes sits near ~6-8 dB).
    assert report["psnr_vs_teacher"] > 8.0

    # Sidecar roundtrip next to a fake teacher checkpoint path.
    teacher_ckpt = str(tmp_path / "model.npz")
    sidecar = turbo_sidecar_path(teacher_ckpt)
    assert sidecar == str(tmp_path / "model.turbo.npz")
    save_turbo_checkpoint(
        sidecar, student_params, student_cfg,
        n_importance_serving=12, proposal_subsample_serving=2,
        report=report, teacher=teacher_ckpt,
    )
    meta = read_turbo_metadata(sidecar)
    assert meta["turbo"] is True
    assert meta["student"]["width"] == 32
    assert meta["student"]["n_importance"] == 12
    assert meta["student"]["proposal_subsample"] == 2
    assert meta["distill_report"]["psnr_vs_teacher"] == pytest.approx(
        report["psnr_vs_teacher"]
    )
    spec, student = student_spec_from_meta(meta)
    assert spec.width == 32 and spec.depth == 2
    assert spec.input_ch == 3 * (1 + 2 * 5)

    # The turbo renderer serves the student end-to-end.
    from nerf_workspaces_explorer_tpu.core.types import COORD
    from nerf_workspaces_explorer_tpu.infer.renderer import NeRFRenderer

    render_cfg = FrameworkConfig(
        experiment=ExperimentConfig(image_width=W, image_height=H),
        rendering=RenderingConfig(depth_range=(0.1, 6.0)),
        logging=_silent_logging(),
    )
    r = NeRFRenderer(
        "tokyo", teacher_ckpt, config=render_cfg, precision="parity",
        use_pallas=False, preset="turbo",
    )
    # Turbo statics come from the sidecar, not the office config.
    assert r._spec.width == 32
    assert r._settings.use_proposal and not r._settings.merge_coarse
    assert r._settings.n_importance == 12
    assert r._settings.num_freqs_3d == 5
    # The gated serving stride rides the sidecar metadata into settings.
    assert r._settings.proposal_subsample == 2
    r.initialize_models()
    img = r.render_coordinates(COORD(x=0.0, y=0.0, z=2.5, pitch=-90.0), COORD())
    assert img.shape == (H, W, 3) and img.dtype == np.uint8
    assert np.isfinite(img.astype(np.float64)).all()


def test_distill_sample_count_overrides(tiny_teacher, tmp_path):
    """n_samples/n_importance_train override the student's sample counts
    (the proposal coarse pass is ~20% of the turbo frame's device time —
    profile_turbo_frame.py), land in the sidecar metadata, and flow into
    the turbo renderer's serving settings."""
    trainer, cfg, poses = tiny_teacher
    student_params, student_cfg, report = distill_student(
        trainer.params, trainer._spec, trainer._settings, poses,
        height=H, width=W, near=0.1, far=6.0, steps=30,
        depth=2, net_width=32, num_freqs_3d=5, n_holdout=1,
        use_pallas=False, log_every=0, name="distill_ns",
        n_samples=8, n_importance_train=12,
    )
    assert student_cfg.rendering.n_samples == 8
    assert student_cfg.rendering.n_importance == 12
    assert np.isfinite(report["psnr_vs_teacher"])

    teacher_ckpt = str(tmp_path / "model.npz")
    sidecar = turbo_sidecar_path(teacher_ckpt)
    save_turbo_checkpoint(
        sidecar, student_params, student_cfg,
        n_importance_serving=12, report=report, teacher=teacher_ckpt,
    )
    meta = read_turbo_metadata(sidecar)
    assert meta["student"]["n_samples"] == 8

    from nerf_workspaces_explorer_tpu.infer.renderer import NeRFRenderer

    render_cfg = FrameworkConfig(
        experiment=ExperimentConfig(image_width=W, image_height=H),
        rendering=RenderingConfig(depth_range=(0.1, 6.0)),
        logging=_silent_logging(),
    )
    r = NeRFRenderer(
        "tokyo", teacher_ckpt, config=render_cfg, precision="parity",
        use_pallas=False, preset="turbo",
    )
    assert r._settings.n_samples == 8
    assert r._settings.n_importance == 12


def test_distill_accepts_precomputed_teacher_views(tiny_teacher):
    """distill_student(teacher_rgb=...) must skip the teacher render pass
    (candidate-architecture sweeps pay it once) and validate its shape."""
    trainer, cfg, poses = tiny_teacher
    rgb = render_teacher_views(
        trainer.params, trainer._spec, trainer._settings, poses, H, W,
        near=0.1, far=6.0, use_pallas=False,
    )
    _, _, report = distill_student(
        trainer.params, trainer._spec, trainer._settings, poses,
        height=H, width=W, near=0.1, far=6.0, steps=30,
        depth=2, net_width=32, num_freqs_3d=5, n_holdout=1,
        use_pallas=False, log_every=0, name="distill_pre",
        teacher_rgb=rgb,
    )
    assert np.isfinite(report["psnr_vs_teacher"])
    with pytest.raises(ValueError, match="teacher_rgb shape"):
        distill_student(
            trainer.params, trainer._spec, trainer._settings, poses,
            height=H, width=W, near=0.1, far=6.0, steps=10,
            depth=2, net_width=32, num_freqs_3d=5, n_holdout=1,
            use_pallas=False, log_every=0, teacher_rgb=rgb[:1],
        )


def test_turbo_requires_sidecar(tmp_path):
    from nerf_workspaces_explorer_tpu.infer.renderer import NeRFRenderer

    with pytest.raises(RuntimeError, match="turbo sidecar"):
        NeRFRenderer(
            "tokyo", str(tmp_path / "missing.npz"), precision="parity",
            use_pallas=False, preset="turbo",
        )
    with pytest.raises(ValueError, match="requires a checkpoint"):
        NeRFRenderer("tokyo", None, precision="parity", use_pallas=False,
                     preset="turbo")


def test_set_turbo_serving_config_patches_metadata_only(tiny_teacher, tmp_path):
    """scripts/set_turbo_serving_config.py rewrites the sidecar's serving
    knobs (n_importance / proposal_subsample) in place without touching the
    student weights — the path a newly passed quality gate takes to adopt a
    cheaper placement without re-distilling."""
    import subprocess
    import sys as _sys

    trainer, cfg, poses = tiny_teacher
    student_params, student_cfg, report = distill_student(
        trainer.params, trainer._spec, trainer._settings, poses,
        height=H, width=W, near=0.1, far=6.0, steps=10,
        depth=2, net_width=32, num_freqs_3d=5, n_holdout=1,
        use_pallas=False, log_every=0, name="distill_patch",
    )
    sidecar = str(tmp_path / "model.turbo.npz")
    save_turbo_checkpoint(
        sidecar, student_params, student_cfg,
        n_importance_serving=16, report=report,
        teacher=str(tmp_path / "model.npz"),
    )
    before = np.load(sidecar)
    weight_keys = [k for k in before.files if k != "__meta__"]
    weights_before = {k: before[k].copy() for k in weight_keys}

    script = os.path.join(
        os.path.dirname(__file__), "..", "scripts", "set_turbo_serving_config.py"
    )
    out = subprocess.run(
        [_sys.executable, script, sidecar,
         "--n-importance", "12", "--prop-subsample", "4"],
        capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stderr

    meta = read_turbo_metadata(sidecar)
    assert meta["student"]["n_importance"] == 12
    assert meta["student"]["proposal_subsample"] == 4
    after = np.load(sidecar)
    assert sorted(after.files) == sorted(before.files)
    for k in weight_keys:
        np.testing.assert_array_equal(after[k], weights_before[k])

    # A non-turbo npz must be rejected, not silently rewritten.
    plain = str(tmp_path / "plain.npz")
    np.savez(plain, __meta__=np.frombuffer(b'{"turbo": false}', dtype=np.uint8))
    out = subprocess.run(
        [_sys.executable, script, plain, "--prop-subsample", "2"],
        capture_output=True, text=True,
    )
    assert out.returncode != 0
    assert "not a turbo sidecar" in (out.stderr + out.stdout)


def test_office_distill_poses_cover_the_floor_plan():
    poses = office_distill_poses("tokyo", grid=2, yaw_step_degrees=90.0)
    assert poses.shape == (2 * 2 * 4, 4, 4)
    # Valid rigid transforms: orthonormal rotation blocks.
    for p in poses[:4]:
        rot = p[:3, :3]
        np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-5)
    # Distinct camera positions across the lattice.
    assert np.unique(np.round(poses[:, :3, 3], 4), axis=0).shape[0] > 1


def test_default_student_is_the_interior_robust_recipe():
    """Round-4 VERDICT item 2: the shipped defaults must be the recipe
    measured to PASS interiors (6x192@10f @ 50k —
    reports/quality_gate_room_turbo_fix_6x192_50k.md); 4x128@8f stays an
    explicit opt-in (SPEED_STUDENT) because it fails the room probe-grid
    gate at every measured budget."""
    from nerf_workspaces_explorer_tpu.train.distill import (
        DEFAULT_DISTILL_STEPS,
        DEFAULT_STUDENT,
        SPEED_STUDENT,
    )

    assert DEFAULT_STUDENT == {"depth": 6, "width": 192, "num_freqs_3d": 10}
    assert DEFAULT_DISTILL_STEPS == 50_000
    assert SPEED_STUDENT == {"depth": 4, "width": 128, "num_freqs_3d": 8}

    # distill_student's own keyword defaults track DEFAULT_STUDENT.
    import inspect

    sig = inspect.signature(distill_student)
    assert sig.parameters["depth"].default == DEFAULT_STUDENT["depth"]
    assert sig.parameters["net_width"].default == DEFAULT_STUDENT["width"]
    assert (
        sig.parameters["num_freqs_3d"].default
        == DEFAULT_STUDENT["num_freqs_3d"]
    )
    assert sig.parameters["steps"].default == DEFAULT_DISTILL_STEPS


def test_entry_point_parsers_default_to_the_default_student():
    """The CLI, the quality gate, and the bench-fixture maker all resolve
    their student defaults from DEFAULT_STUDENT/DEFAULT_DISTILL_STEPS —
    no entry point may silently serve the interior-failing recipe."""
    import importlib.util

    from nerf_workspaces_explorer_tpu.cli.distill import build_parser
    from nerf_workspaces_explorer_tpu.train.distill import (
        DEFAULT_DISTILL_STEPS,
        DEFAULT_STUDENT,
    )

    cli = build_parser().parse_args([])
    assert (cli.depth, cli.width, cli.freqs) == (
        DEFAULT_STUDENT["depth"],
        DEFAULT_STUDENT["width"],
        DEFAULT_STUDENT["num_freqs_3d"],
    )
    assert cli.steps == DEFAULT_DISTILL_STEPS

    root = os.path.join(os.path.dirname(__file__), "..")
    for script, prefix in (
        ("validate_quality.py", "turbo_"),
        ("make_bench_fixture.py", "turbo_"),
    ):
        spec = importlib.util.spec_from_file_location(
            f"_defaults_{script[:-3]}", os.path.join(root, "scripts", script)
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        if hasattr(mod, "build_parser"):
            args = mod.build_parser().parse_args([])
        else:
            pytest.skip(f"{script} has no build_parser")
        assert getattr(args, f"{prefix}depth") == DEFAULT_STUDENT["depth"]
        assert getattr(args, f"{prefix}width") == DEFAULT_STUDENT["width"]
        assert (
            getattr(args, f"{prefix}freqs")
            == DEFAULT_STUDENT["num_freqs_3d"]
        )
        assert getattr(args, f"{prefix}steps") == DEFAULT_DISTILL_STEPS


def test_room_coverage_poses_disjoint_from_gate_grid():
    """The coverage views the student trains on must stay off the probe
    grid the gate holds out, or the gate stops being held-out."""
    from nerf_workspaces_explorer_tpu.data.synthetic import (
        room_coverage_poses,
        room_grid_poses,
    )

    cover = room_coverage_poses()
    gate = room_grid_poses()
    assert cover.shape == (2 * 4 * 4 * 4, 4, 4)
    cover_pos = cover[:, :3, 3]
    gate_pos = gate[:, :3, 3]
    d = np.linalg.norm(
        cover_pos[:, None, :] - gate_pos[None, :, :], axis=-1
    )
    assert d.min() > 0.05


def test_quality_gate_parser_has_ssim_thresholds():
    """Round-4 VERDICT weak item 6: the turbo gate must threshold SSIM
    (mean drop vs teacher + worst-view floor), not PSNR alone."""
    import importlib.util

    root = os.path.join(os.path.dirname(__file__), "..")
    spec = importlib.util.spec_from_file_location(
        "_vq_ssim", os.path.join(root, "scripts", "validate_quality.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    args = mod.build_parser().parse_args([])
    # Calibrated off the passing room report (drop 0.0111, min 0.7811 vs
    # teacher min 0.7871); the failing 4x128 recipe (0.0545, 0.7199)
    # must trip both.
    assert 0.011 < args.max_turbo_ssim_drop < 0.055
    assert 0.7199 / 0.7871 < args.min_turbo_ssim_ratio < 0.7811 / 0.7871
