"""Tests for proposal-network sampling (interlevel loss + pipeline mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_workspaces_explorer_tpu.render.proposal import (
    _sample_edges,
    interlevel_loss,
    proposal_spec,
)


def _naive_bound(z_prop, w_fine, z_fine):
    """O(P*F) reference for the overlap bound."""
    pl_, pu = _sample_edges(jnp.asarray(z_prop))
    fl, fu = _sample_edges(jnp.asarray(z_fine))
    pl_, pu, fl, fu = map(np.asarray, (pl_, pu, fl, fu))
    out = np.zeros(len(np.asarray(z_prop)))
    for i in range(len(out)):
        for j in range(len(np.asarray(z_fine))):
            if fl[j] < pu[i] and fu[j] > pl_[i]:
                out[i] += w_fine[j]
    return out


def test_interlevel_loss_matches_naive():
    rng = np.random.default_rng(0)
    z_prop = np.sort(rng.uniform(0, 10, size=16)).astype(np.float32)
    z_fine = np.sort(rng.uniform(0, 10, size=48)).astype(np.float32)
    w_fine = rng.uniform(0, 0.1, size=48).astype(np.float32)

    # Perfect proposal: w_prop == bound -> loss 0.
    bound = _naive_bound(z_prop, w_fine, z_fine)
    loss0 = float(
        interlevel_loss(
            jnp.asarray(z_prop)[None],
            jnp.asarray(bound, dtype=jnp.float32)[None],
            jnp.asarray(z_fine)[None],
            jnp.asarray(w_fine)[None],
        )
    )
    assert loss0 == pytest.approx(0.0, abs=1e-9)

    # Under-covering proposal: positive loss, equal to the naive formula.
    w_prop = (bound * 0.5).astype(np.float32)
    loss = float(
        interlevel_loss(
            jnp.asarray(z_prop)[None],
            jnp.asarray(w_prop)[None],
            jnp.asarray(z_fine)[None],
            jnp.asarray(w_fine)[None],
        )
    )
    expected = np.mean(np.maximum(bound - w_prop, 0) ** 2 / (w_prop + 1e-7))
    assert loss == pytest.approx(float(expected), rel=1e-4)


def test_interlevel_loss_gradient_flows_to_proposal_only():
    rng = np.random.default_rng(1)
    z_prop = jnp.asarray(np.sort(rng.uniform(0, 10, size=(4, 16)), axis=-1), jnp.float32)
    z_fine = jnp.asarray(np.sort(rng.uniform(0, 10, size=(4, 48)), axis=-1), jnp.float32)
    w_fine = jnp.asarray(rng.uniform(0, 0.1, size=(4, 48)), jnp.float32)
    w_prop = jnp.asarray(rng.uniform(0, 0.01, size=(4, 16)), jnp.float32)

    g_prop = jax.grad(lambda w: interlevel_loss(z_prop, w, z_fine, w_fine))(w_prop)
    assert np.all(np.isfinite(np.asarray(g_prop)))
    assert float(jnp.abs(g_prop).sum()) > 0
    # Fine weights are stop-gradient'ed.
    g_fine = jax.grad(lambda w: interlevel_loss(z_prop, w_prop, z_fine, w))(w_fine)
    np.testing.assert_allclose(np.asarray(g_fine), 0.0)


def test_proposal_spec_shapes():
    spec = proposal_spec()
    assert spec.depth == 2 and spec.width == 64
    assert spec.skips == ()
    dims = spec.layer_dims()
    assert dims == [(39, 64), (64, 64)]


def test_proposal_pipeline_render():
    from nerf_workspaces_explorer_tpu.models import NerfMLPSpec, init_nerf_params
    from nerf_workspaces_explorer_tpu.rays import create_rays
    from nerf_workspaces_explorer_tpu.render import RenderSettings, render_ray_bundle

    spec = NerfMLPSpec(depth=4, width=64, input_ch=39, input_ch_views=15)
    settings = RenderSettings(
        n_samples=8, n_importance=8, num_freqs_3d=6, num_freqs_2d=2,
        use_proposal=True, proposal_num_freqs=6,
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        "proposal": init_nerf_params(k1, proposal_spec(6)),
        "fine": init_nerf_params(k2, spec),
    }
    rays = create_rays(jnp.eye(4)[None], 8, 8, 4.0, 4.0, 3.5, 3.5, 0.5, 4.0).reshape(64)
    out = render_ray_bundle(params, rays, settings.for_eval(), spec=spec, full_outputs=True)
    assert out["rgb_fine"].shape == (64, 3)
    assert out["z_vals_coarse"].shape == (64, 8)
    assert out["z_vals_fine"].shape == (64, 16)
    assert np.all(np.isfinite(np.asarray(out["rgb_fine"])))


def test_proposal_training_converges():
    from nerf_workspaces_explorer_tpu.data import make_synthetic_scene
    from nerf_workspaces_explorer_tpu.models import NerfMLPSpec
    from nerf_workspaces_explorer_tpu.rays import create_rays
    from nerf_workspaces_explorer_tpu.render import RenderSettings
    from nerf_workspaces_explorer_tpu.train import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    spec = NerfMLPSpec(depth=4, width=64, input_ch=39, input_ch_views=15)
    settings = RenderSettings(
        n_samples=16, n_importance=16, num_freqs_3d=6, num_freqs_2d=2,
        raw_noise_std=1.0, use_proposal=True, proposal_num_freqs=6,
    )
    opt = make_optimizer(1e-3)
    state = init_train_state(
        jax.random.PRNGKey(0), spec, opt, proposal_spec=proposal_spec(6)
    )
    assert "proposal" in state.params and "coarse" not in state.params

    train, _, _ = make_synthetic_scene(n_train=1, n_test=1, height=16, width=16)
    rays = create_rays(jnp.asarray(train.camera_pose), 16, 16, 8.0, 8.0, 7.5, 7.5, 0.1, 6.0)
    rgbs = jnp.asarray(train.rgb.reshape(1, -1, 3))
    step = make_train_step(settings, spec, opt, n_rays=128)
    key = jax.random.PRNGKey(42)
    first = None
    for i in range(200):
        state, m = step(state, rays, rgbs, key)
        if first is None:
            first = float(m["rgb_loss_fine"])
    assert np.isfinite(float(m["total_loss"]))
    assert float(m["rgb_loss_fine"]) < 0.3 * first
    assert float(m["psnr_fine"]) > 14.0


def test_proposal_fused_render_matches_jnp():
    from nerf_workspaces_explorer_tpu.models import NerfMLPSpec, init_nerf_params
    from nerf_workspaces_explorer_tpu.ops.pallas_render import render_rays_fused
    from nerf_workspaces_explorer_tpu.rays import create_rays
    from nerf_workspaces_explorer_tpu.render import RenderSettings, render_ray_bundle

    spec = NerfMLPSpec(depth=4, width=64, input_ch=39, input_ch_views=15)
    settings = RenderSettings(
        n_samples=16, n_importance=16, num_freqs_3d=6, num_freqs_2d=2,
        use_proposal=True, proposal_num_freqs=6,
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    params = {
        "proposal": init_nerf_params(k1, proposal_spec(6)),
        "fine": init_nerf_params(k2, spec),
    }
    for p in params.values():
        p["alpha"]["b"] = p["alpha"]["b"] + 1.5
    rays = create_rays(jnp.eye(4)[None], 8, 16, 8.0, 8.0, 7.5, 3.5, 0.5, 4.0).reshape(128)
    rgb_fused = np.asarray(
        render_rays_fused(params, rays, settings, spec=spec, ray_tile=128, interpret=True)
    )
    ref = render_ray_bundle(params, rays, settings.for_eval(), spec=spec, full_outputs=False)
    np.testing.assert_allclose(rgb_fused, np.asarray(ref["rgb_fine"]), atol=5e-3)


def test_proposal_int8_fused_render_matches_jnp():
    """precision='int8' with proposal mode: calibrate_model_quant must walk
    the 2x64 proposal net with a spec inferred from its own shapes (the
    flagship spec would shape-mismatch), and the fused int8 render must stay
    visually indistinguishable from the fp32 jnp pipeline."""
    from nerf_workspaces_explorer_tpu.models import NerfMLPSpec, init_nerf_params
    from nerf_workspaces_explorer_tpu.ops.pallas_render import render_rays_fused
    from nerf_workspaces_explorer_tpu.ops.quantize import (
        calibrate_model_quant,
        spec_from_net_params,
    )
    from nerf_workspaces_explorer_tpu.rays import create_rays
    from nerf_workspaces_explorer_tpu.render import RenderSettings, render_ray_bundle

    spec = NerfMLPSpec(depth=4, width=64, input_ch=39, input_ch_views=15)
    settings = RenderSettings(
        n_samples=16, n_importance=16, num_freqs_3d=6, num_freqs_2d=2,
        use_proposal=True, proposal_num_freqs=6,
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    params = {
        "proposal": init_nerf_params(k1, proposal_spec(6)),
        "fine": init_nerf_params(k2, spec),
    }
    for p in params.values():
        p["alpha"]["b"] = p["alpha"]["b"] + 1.5
    # The test spec's default skips=(4,) is vacuous at depth=4, so shape
    # inference correctly recovers skips=() — equal everywhere else.
    assert spec_from_net_params(params["fine"]) == spec._replace(skips=())
    assert spec_from_net_params(params["proposal"]) == proposal_spec(6)
    assert spec_from_net_params(init_nerf_params(k1, NerfMLPSpec())) == NerfMLPSpec()
    quant = calibrate_model_quant(params, spec, box=4.0)
    assert set(quant) == {"proposal", "fine"}
    rays = create_rays(jnp.eye(4)[None], 8, 16, 8.0, 8.0, 7.5, 3.5, 0.5, 4.0).reshape(128)
    rgb_q = np.asarray(
        render_rays_fused(
            params, rays, settings, spec=spec, ray_tile=128, interpret=True,
            quant=quant,
        )
    )
    ref = render_ray_bundle(params, rays, settings.for_eval(), spec=spec, full_outputs=False)
    err = np.abs(rgb_q - np.asarray(ref["rgb_fine"]))
    assert np.all(np.isfinite(rgb_q))
    assert err.mean() < 4e-3, err.mean()
    assert err.max() < 4e-2, err.max()


def test_interlevel_target_ignores_sigma_noise():
    """The interlevel histograms are recomposited without raw_noise_std
    (train/step.py): with an absurd noise std the rendering losses jitter
    but the proposal's histogram target must stay geometry-shaped. Under
    the old noisy-target coupling this loss blows past 1e5 immediately."""
    from nerf_workspaces_explorer_tpu.data import make_synthetic_scene
    from nerf_workspaces_explorer_tpu.models import NerfMLPSpec
    from nerf_workspaces_explorer_tpu.rays import create_rays
    from nerf_workspaces_explorer_tpu.render import RenderSettings
    from nerf_workspaces_explorer_tpu.render.proposal import proposal_spec
    from nerf_workspaces_explorer_tpu.render.volume import (
        composite_rays,
        sigma_to_weights,
    )
    from nerf_workspaces_explorer_tpu.train import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    # sigma_to_weights IS the weights slice of composite_rays at noise 0.
    key = jax.random.PRNGKey(3)
    raw = jax.random.normal(key, (32, 12, 4))
    z = jnp.sort(jax.random.uniform(key, (32, 12)), axis=-1)
    dirs = jax.random.normal(key, (32, 3))
    ref = composite_rays(raw, z, dirs, raw_noise_std=0.0).weights
    np.testing.assert_allclose(
        np.asarray(sigma_to_weights(raw[..., 3], z, dirs)), np.asarray(ref),
        rtol=1e-6,
    )

    spec = NerfMLPSpec(depth=4, width=64, input_ch=39, input_ch_views=15)
    settings = RenderSettings(
        n_samples=16, n_importance=16, num_freqs_3d=6, num_freqs_2d=2,
        raw_noise_std=100.0, use_proposal=True, proposal_num_freqs=6,
    )
    opt = make_optimizer(1e-3)
    state = init_train_state(
        jax.random.PRNGKey(0), spec, opt, proposal_spec=proposal_spec(6)
    )
    train, _, _ = make_synthetic_scene(n_train=1, n_test=1, height=16, width=16)
    rays = create_rays(jnp.asarray(train.camera_pose), 16, 16, 8.0, 8.0, 7.5, 7.5, 0.1, 6.0)
    rgbs = jnp.asarray(train.rgb.reshape(1, -1, 3))
    step = make_train_step(settings, spec, opt, n_rays=128)
    worst = 0.0
    for i in range(20):
        state, m = step(state, rays, rgbs, jax.random.PRNGKey(42))
        worst = max(worst, float(m["rgb_loss_coarse"]))
    assert np.isfinite(worst) and worst < 1e5, worst
