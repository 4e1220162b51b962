"""Tests for the training stack: optimizer schedule, jitted step, trainer
loop, checkpoint/resume, and end-to-end convergence on a synthetic scene."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nerf_workspaces_explorer_tpu.core.config import (
    FrameworkConfig,
    LoggingConfig,
    ModelConfig,
    RenderingConfig,
    TrainingConfig,
)
from nerf_workspaces_explorer_tpu.data import make_synthetic_scene
from nerf_workspaces_explorer_tpu.models import NerfMLPSpec
from nerf_workspaces_explorer_tpu.rays import create_rays
from nerf_workspaces_explorer_tpu.render import RenderSettings
from nerf_workspaces_explorer_tpu.train import (
    Trainer,
    init_train_state,
    make_optimizer,
    make_train_step,
)
from nerf_workspaces_explorer_tpu.train.step import sample_training_rays


def small_config(**rendering_overrides) -> FrameworkConfig:
    rendering = dict(
        n_rays=256,
        n_samples=16,
        n_importance=16,
        num_freqs_3d=6,
        num_freqs_2d=2,
        depth_range=(0.1, 6.0),
        # raw_noise_std=1 (the reference default) is load-bearing: without it
        # a negatively-initialized sigma head is ReLU-dead and the coarse
        # net never receives gradient.
        raw_noise_std=1.0,
    )
    rendering.update(rendering_overrides)
    return FrameworkConfig(
        training=TrainingConfig(learning_rate=5e-4),
        model=ModelConfig(net_depth=4, net_width=64, chunk=4096),
        rendering=RenderingConfig(**rendering),
        logging=LoggingConfig(
            step_log_print=0,
            step_log_tensorboard=50,
            step_save_ckpt=0,
            step_render_test=0,
            step_render_train=0,
        ),
    )


def test_next_run_dir_survives_deleted_runs(tmp_path):
    # The reference numbers runs by len(os.listdir)+1
    # (…training_handler.py:33-40), which collides after a deleted run.
    # Ours is max(existing)+1 with exclusive creation.
    from nerf_workspaces_explorer_tpu.train.loop import _next_run_dir

    base = str(tmp_path / "office_tokyo")
    assert _next_run_dir(base).endswith(os.sep + "1")
    assert _next_run_dir(base).endswith(os.sep + "2")
    assert _next_run_dir(base).endswith(os.sep + "3")
    os.rmdir(os.path.join(base, "2"))  # delete a middle run
    # len(listdir)+1 would now collide with the existing "3"; max+1 must not.
    assert _next_run_dir(base).endswith(os.sep + "4")
    # Non-numeric entries (e.g. stray files) are ignored, not crashed on.
    open(os.path.join(base, "notes.txt"), "w").close()
    assert _next_run_dir(base).endswith(os.sep + "5")


def test_trainer_field_impl_defaults_to_fused_on_tpu(tmp_path, monkeypatch):
    """field_impl defaults to 'auto': the fused custom-VJP field on TPU
    (~2x steps/s, long-horizon validated — reports/long_horizon_200k_room.md),
    the XLA field elsewhere. The reference has a single training path
    (…training_handler.py:265-339); ours must default to the fast one."""
    import inspect

    import jax

    from nerf_workspaces_explorer_tpu.data import make_synthetic_scene
    from nerf_workspaces_explorer_tpu.train.loop import Trainer

    assert inspect.signature(Trainer.__init__).parameters["field_impl"].default == "auto"

    train, test, _ = make_synthetic_scene(n_train=2, n_test=1, height=8, width=8)
    kwargs = dict(
        config=small_config(), train_data=train, test_data=test,
        save_dir=str(tmp_path / "run"), enable_tensorboard=False,
    )
    trainer = Trainer("office_tokyo", **kwargs)
    assert trainer._field_impl == "xla"  # CPU host: auto -> xla

    class FakeTpu:
        platform = "tpu"

    monkeypatch.setattr(jax, "devices", lambda *a, **k: [FakeTpu()])
    trainer = Trainer(
        "office_tokyo", use_pallas=False,
        **{**kwargs, "save_dir": str(tmp_path / "run2")},
    )
    assert trainer._field_impl == "pallas"  # TPU: auto -> fused field


def test_eval_max_views_subsamples_eval_renders(tmp_path):
    """eval_max_views caps the eval render sets (evenly spaced ids) while
    training still samples the full train split; 0 keeps the reference
    render-every-view behavior (…training_handler.py:411-480)."""
    from nerf_workspaces_explorer_tpu.data import make_synthetic_scene
    from nerf_workspaces_explorer_tpu.train.loop import Trainer

    train, test, _ = make_synthetic_scene(n_train=6, n_test=5, height=8, width=8)
    trainer = Trainer(
        "office_tokyo", config=small_config(), train_data=train,
        test_data=test, save_dir=str(tmp_path / "r"),
        enable_tensorboard=False, eval_max_views=3,
    )
    trainer.prepare_data()
    trainer.initialize_rays()
    assert trainer.rays_train.origins.shape[0] == 6  # training: full split
    assert trainer.rays_vis.origins.shape[0] == 3
    assert trainer.rays_test.origins.shape[0] == 3
    assert trainer._train_rgbs_scaled.shape[0] == 3
    assert trainer._test_rgbs_scaled.shape[0] == 3
    # Evenly spaced over the split, endpoints included.
    np.testing.assert_array_equal(trainer._train_eval_ids, [0, 2, 5])
    np.testing.assert_array_equal(trainer._test_eval_ids, [0, 2, 4])
    # GT rows correspond to the subsampled poses (not the first N).
    np.testing.assert_allclose(
        trainer._test_rgbs_scaled[1], test.rgb[2], atol=1e-6
    )

    trainer0 = Trainer(
        "office_tokyo", config=small_config(), train_data=train,
        test_data=test, save_dir=str(tmp_path / "r0"),
        enable_tensorboard=False,
    )
    trainer0.prepare_data()
    trainer0.initialize_rays()
    assert trainer0.rays_test.origins.shape[0] == 5  # default: every view


def test_lr_schedule_matches_reference_decay():
    # Reference: lr * 0.1^(step/50000), continuous (…training_handler.py:312-315).
    opt = make_optimizer(5e-4, 0.1, 50_000.0)
    schedule = optax.exponential_decay(5e-4, 50_000.0, 0.1, staircase=False)
    for step in [0, 1, 1000, 50_000, 125_000]:
        expected = 5e-4 * 0.1 ** (step / 50_000.0)
        assert float(schedule(step)) == pytest.approx(expected, rel=1e-6)


def test_sample_training_rays_shapes():
    poses = jnp.stack([jnp.eye(4)] * 4)
    rays = create_rays(poses, 6, 8, 4.0, 4.0, 3.5, 2.5, 0.1, 6.0)
    rgbs = jax.random.uniform(jax.random.PRNGKey(0), (4, 48, 3))
    sampled, gt = sample_training_rays(jax.random.PRNGKey(1), rays, rgbs, 32)
    assert sampled.origins.shape == (32, 3)
    assert gt.shape == (32, 3)
    # Same image for all rays: all origins identical for identity poses.
    np.testing.assert_allclose(np.asarray(sampled.origins), 0.0)


def test_train_step_reduces_loss_overfit_single_image():
    # 200 steps on one tiny image must cut the loss substantially; sigma noise
    # at the reference's std=1 keeps the density head alive at init.
    spec = NerfMLPSpec(depth=4, width=64, input_ch=39, input_ch_views=15)
    settings = RenderSettings(
        n_samples=16, n_importance=16, num_freqs_3d=6, num_freqs_2d=2,
        raw_noise_std=1.0,
    )
    opt = make_optimizer(1e-3, 0.1, 50_000.0)
    state = init_train_state(jax.random.PRNGKey(0), spec, opt)

    train, _, _ = make_synthetic_scene(n_train=1, n_test=1, height=16, width=16)
    rays = create_rays(
        jnp.asarray(train.camera_pose), 16, 16, 8.0, 8.0, 7.5, 7.5, 0.1, 6.0
    )
    rgbs = jnp.asarray(train.rgb.reshape(1, -1, 3))

    step = make_train_step(settings, spec, opt, n_rays=128)
    key = jax.random.PRNGKey(42)
    first_loss = None
    for i in range(200):
        state, metrics = step(state, rays, rgbs, key)
        if first_loss is None:
            first_loss = float(metrics["total_loss"])
    final_loss = float(metrics["total_loss"])
    assert final_loss < 0.2 * first_loss, (first_loss, final_loss)
    assert float(metrics["psnr_coarse"]) > 15.0
    assert float(metrics["psnr_fine"]) > 15.0


def test_sharded_step_matches_metrics_structure():
    from jax.sharding import Mesh

    spec = NerfMLPSpec(depth=2, width=32)
    settings = RenderSettings(n_samples=8, n_importance=8, raw_noise_std=0.0)
    opt = make_optimizer()
    state = init_train_state(jax.random.PRNGKey(0), spec, opt)
    poses = jnp.stack([jnp.eye(4)] * 2)
    rays = create_rays(poses, 8, 8, 4.0, 4.0, 3.5, 3.5, 0.1, 6.0)
    rgbs = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 3))

    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
    step = make_train_step(settings, spec, opt, n_rays=64, mesh=mesh)
    new_state, metrics = step(state, rays, rgbs, jax.random.PRNGKey(2))
    assert int(new_state.step) == 1
    assert metrics["total_loss"].ndim == 0
    assert metrics["trans_fine"].shape[0] == 64  # gathered across devices
    # Params stay replicated and finite.
    for leaf in jax.tree.leaves(new_state.params):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_sharded_n_rays_divisibility():
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
    with pytest.raises(ValueError):
        make_train_step(
            RenderSettings(), NerfMLPSpec(), make_optimizer(), n_rays=100, mesh=mesh
        )


@pytest.fixture(scope="module")
def synthetic_trainer(tmp_path_factory):
    cfg = small_config()
    train, test, _ = make_synthetic_scene(n_train=3, n_test=1, height=16, width=16)
    trainer = Trainer(
        "office_synthetic",
        cfg,
        train_data=train,
        test_data=test,
        save_dir=str(tmp_path_factory.mktemp("run")),
        enable_tensorboard=True,
        seed=0,
    )
    trainer.setup()
    return trainer


def test_trainer_steps_and_metrics(synthetic_trainer):
    trainer = synthetic_trainer
    m0 = trainer.step(0)
    assert int(trainer.state.step) == 1
    losses = [float(m0["total_loss"])]
    for i in range(1, 30):
        losses.append(float(trainer.step(i)["total_loss"]))
    assert np.isfinite(losses).all()


def test_trainer_eval_render_and_psnr(synthetic_trainer):
    trainer = synthetic_trainer
    psnr = trainer.render_test_images(global_step=30)
    assert np.isfinite(psnr)
    render_dir = os.path.join(trainer.save_dir, "test_render", "step_000030")
    assert os.path.isdir(render_dir)
    assert any(name.endswith(".png") for name in os.listdir(render_dir))


def test_trainer_checkpoint_resume(synthetic_trainer):
    trainer = synthetic_trainer
    path = trainer.save_models_checkpoint(global_step=int(trainer.state.step))
    saved_step = int(trainer.state.step)
    params_before = jax.tree.map(np.asarray, trainer.params)

    # Step forward, then resume back.
    trainer.step(saved_step)
    assert int(trainer.state.step) == saved_step + 1
    restored_step = trainer.resume_from_checkpoint(path)
    assert restored_step == saved_step
    assert int(trainer.state.step) == saved_step
    for a, b in zip(jax.tree.leaves(params_before), jax.tree.leaves(trainer.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # Training continues after resume.
    trainer.step(saved_step)
    assert int(trainer.state.step) == saved_step + 1


def test_train_cli_synthetic_with_export(tmp_path, monkeypatch):
    """Drive the training CLI end-to-end: synthetic data, a few steps,
    final-model export in both formats."""
    monkeypatch.chdir(tmp_path)
    from nerf_workspaces_explorer_tpu.cli.train import main as train_main

    train_main([
        "--office", "tokyo", "--synthetic", "--synthetic-size", "16",
        "--iterations", "2", "--save-dir", str(tmp_path / "run"),
        "--export-final",
    ])
    assert os.path.exists(tmp_path / "final_models" / "office_tokyo" / "model.npz")


def test_train_cli_room_scene(tmp_path, monkeypatch):
    """--scene room drives the reference-scale walkthrough scene through
    the CLI (reference split rule; depth range switched to the room's)."""
    monkeypatch.chdir(tmp_path)
    from nerf_workspaces_explorer_tpu.cli.train import main as train_main

    train_main([
        "--office", "tokyo", "--synthetic", "--scene", "room",
        "--synthetic-size", "16", "--room-frames", "20", "--room-stride", "10",
        "--iterations", "2", "--save-dir", str(tmp_path / "run_room"),
        "--scene-cache", str(tmp_path / "scene_cache"),
    ])
    # The GT cache was written (reused by later runs on the same scene).
    assert any(
        name.startswith("room_") for name in os.listdir(tmp_path / "scene_cache")
    )


def test_train_cli_steps_per_call(tmp_path, monkeypatch):
    """--steps-per-call drives the scanned fit() loop through the CLI."""
    monkeypatch.chdir(tmp_path)
    from nerf_workspaces_explorer_tpu.cli.train import main as train_main

    train_main([
        "--office", "tokyo", "--synthetic", "--synthetic-size", "16",
        "--iterations", "9", "--save-dir", str(tmp_path / "run_scan"),
        "--steps-per-call", "4",
    ])


def test_obs_debug_scan():
    from nerf_workspaces_explorer_tpu.obs import scan_outputs_finite

    good = {"a": np.ones(3), "b": None}
    assert scan_outputs_finite(good) == []
    bad = {"a": np.array([1.0, np.nan])}
    assert scan_outputs_finite(bad) == ["a"]
    with pytest.raises(FloatingPointError):
        scan_outputs_finite(bad, raise_on_error=True)


def test_trainer_with_mesh_dp(tmp_path):
    """Trainer end-to-end on the 8-device CPU mesh (data-parallel)."""
    from jax.sharding import Mesh

    from nerf_workspaces_explorer_tpu.data import make_synthetic_scene

    cfg = small_config()
    train, test, _ = make_synthetic_scene(n_train=2, n_test=1, height=16, width=16)
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
    trainer = Trainer(
        "office_mesh",
        cfg,
        train_data=train,
        test_data=test,
        save_dir=str(tmp_path),
        enable_tensorboard=False,
        mesh=mesh,
        use_pallas=False,
    )
    trainer.setup()
    losses = [float(trainer.step(i)["total_loss"]) for i in range(5)]
    assert np.isfinite(losses).all()
    assert int(trainer.state.step) == 5


def test_scanned_multi_step_matches_single_steps():
    """steps_per_call=K must reproduce K single-step dispatches (keys fold
    from state.step inside the scan; equality holds to f32 rounding — the
    scan body fuses differently than the straight-line step)."""
    spec = NerfMLPSpec(depth=2, width=32, input_ch=39, input_ch_views=15)
    settings = RenderSettings(
        n_samples=8, n_importance=8, num_freqs_3d=6, num_freqs_2d=2,
        raw_noise_std=1.0,
    )
    opt = make_optimizer(1e-3, 0.1, 50_000.0)
    state_a = init_train_state(jax.random.PRNGKey(0), spec, opt)
    state_b = init_train_state(jax.random.PRNGKey(0), spec, opt)

    train, _, _ = make_synthetic_scene(n_train=2, n_test=1, height=8, width=8)
    rays = create_rays(
        jnp.asarray(train.camera_pose), 8, 8, 4.0, 4.0, 3.5, 3.5, 0.1, 6.0
    )
    rgbs = jnp.asarray(train.rgb.reshape(2, -1, 3))
    key = jax.random.PRNGKey(7)

    single = make_train_step(settings, spec, opt, n_rays=64, donate=False)
    scanned = make_train_step(
        settings, spec, opt, n_rays=64, donate=False, steps_per_call=4
    )
    for _ in range(4):
        state_a, metrics_a = single(state_a, rays, rgbs, key)
    state_b, metrics_b = scanned(state_b, rays, rgbs, key)

    assert int(state_a.step) == int(state_b.step) == 4
    for la, lb in zip(jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=1e-4, atol=1e-5
        )
    for k in ("total_loss", "psnr_fine"):
        np.testing.assert_allclose(
            float(metrics_a[k]), float(metrics_b[k]), rtol=1e-5
        )


def test_scanned_sharded_step_matches_single_steps():
    """The mesh variant of steps_per_call: scan inside shard_map with the
    per-step pmean preserved."""
    from jax.sharding import Mesh

    spec = NerfMLPSpec(depth=2, width=32)
    settings = RenderSettings(n_samples=8, n_importance=8, raw_noise_std=0.0)
    opt = make_optimizer()
    state_a = init_train_state(jax.random.PRNGKey(0), spec, opt)
    state_b = init_train_state(jax.random.PRNGKey(0), spec, opt)
    poses = jnp.stack([jnp.eye(4)] * 2)
    rays = create_rays(poses, 8, 8, 4.0, 4.0, 3.5, 3.5, 0.1, 6.0)
    rgbs = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 3))
    key = jax.random.PRNGKey(2)

    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
    single = make_train_step(settings, spec, opt, n_rays=64, mesh=mesh, donate=False)
    scanned = make_train_step(
        settings, spec, opt, n_rays=64, mesh=mesh, donate=False, steps_per_call=3
    )
    for _ in range(3):
        state_a, _ = single(state_a, rays, rgbs, key)
    state_b, metrics_b = scanned(state_b, rays, rgbs, key)
    assert int(state_b.step) == 3
    assert metrics_b["trans_fine"].shape[0] == 64
    for la, lb in zip(jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=1e-4, atol=1e-5
        )


def test_trainer_fit_steps_per_call(tmp_path):
    """Trainer.fit with steps_per_call: cadence boundaries still hit their
    exact steps and the final state matches plain stepping (to f32
    rounding; see test_scanned_multi_step_matches_single_steps)."""
    cfg = small_config()
    train, test, _ = make_synthetic_scene(n_train=2, n_test=1, height=16, width=16)

    def build(k):
        return Trainer(
            "office_scan_test",
            cfg,
            train_data=train,
            test_data=test,
            save_dir=str(tmp_path / f"run_{k}"),
            enable_tensorboard=False,
            use_pallas=False,
            steps_per_call=k,
        )

    a = build(1)
    a.setup()
    a.fit(12)
    b = build(4)
    b.setup()
    b.fit(12)
    assert int(a._state.step) == int(b._state.step) == 12
    for la, lb in zip(jax.tree.leaves(a._state.params), jax.tree.leaves(b._state.params)):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=1e-4, atol=1e-5
        )
