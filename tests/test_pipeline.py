"""Tests for the coarse+fine render pipeline and chunked full-frame render."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_workspaces_explorer_tpu.models import NerfMLPSpec, init_nerf_params
from nerf_workspaces_explorer_tpu.rays import create_rays
from nerf_workspaces_explorer_tpu.render import (
    RenderSettings,
    render_ray_bundle,
    render_rays_chunked,
)

SMALL = RenderSettings(n_samples=8, n_importance=16)
SPEC = NerfMLPSpec()


@pytest.fixture(scope="module")
def params():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    return {
        "coarse": init_nerf_params(k1, SPEC),
        "fine": init_nerf_params(k2, SPEC),
    }


@pytest.fixture(scope="module")
def rays():
    return create_rays(jnp.eye(4)[None], 4, 8, 4.0, 4.0, 3.5, 1.5, 0.1, 10.0).reshape(32)


def test_eval_render_outputs(params, rays):
    out = render_ray_bundle(params, rays, SMALL.for_eval(), full_outputs=True)
    assert out["rgb_fine"].shape == (32, 3)
    assert out["rgb_coarse"].shape == (32, 3)
    assert out["raw_coarse"].shape == (32, 8, 4)
    assert out["raw_fine"].shape == (32, 8 + 16, 4)
    assert out["z_std"].shape == (32,)
    for key, value in out.items():
        assert np.all(np.isfinite(np.asarray(value))), f"{key} not finite"
    rgb = np.asarray(out["rgb_fine"])
    assert np.all(rgb >= 0.0) and np.all(rgb <= 1.0)


def test_eval_render_deterministic(params, rays):
    a = render_ray_bundle(params, rays, SMALL.for_eval())
    b = render_ray_bundle(params, rays, SMALL.for_eval())
    np.testing.assert_allclose(np.asarray(a["rgb_fine"]), np.asarray(b["rgb_fine"]))


def test_train_render_uses_rng(params, rays):
    train = SMALL._replace(train=True, perturb=1.0, raw_noise_std=1.0)
    out1 = render_ray_bundle(params, rays, train, key=jax.random.PRNGKey(1))
    out2 = render_ray_bundle(params, rays, train, key=jax.random.PRNGKey(1))
    out3 = render_ray_bundle(params, rays, train, key=jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(out1["rgb_fine"]), np.asarray(out2["rgb_fine"]))
    assert not np.allclose(np.asarray(out1["rgb_fine"]), np.asarray(out3["rgb_fine"]))


def test_train_requires_key(params, rays):
    with pytest.raises(ValueError):
        render_ray_bundle(params, rays, SMALL._replace(train=True))


def test_coarse_only_mode(params, rays):
    # n_importance == 0 crashes the reference (undefined rgb_fine,
    # …inference_handler.py:234-268); here it's a supported extension.
    out = render_ray_bundle(params, rays, SMALL._replace(n_importance=0))
    assert "rgb_coarse" in out and "rgb_fine" not in out


def test_chunked_matches_unchunked(params):
    n = 50  # deliberately not a multiple of the chunk size
    rays = create_rays(jnp.eye(4)[None], 5, 10, 4.0, 4.0, 4.5, 2.0, 0.1, 10.0).reshape(50)
    full = render_ray_bundle(params, rays, SMALL.for_eval(), full_outputs=False)
    chunked = render_rays_chunked(params, rays, SMALL, chunk=16, full_outputs=False)
    assert chunked["rgb_fine"].shape == (n, 3)
    np.testing.assert_allclose(
        np.asarray(chunked["rgb_fine"]), np.asarray(full["rgb_fine"]), atol=1e-5
    )


def test_pipeline_is_jittable(params, rays):
    fn = jax.jit(
        lambda p, r: render_ray_bundle(p, r, SMALL.for_eval(), full_outputs=False)
    )
    out = fn(params, rays)
    assert out["rgb_fine"].shape == (32, 3)


def test_gradients_flow(params, rays):
    train = SMALL._replace(train=True, perturb=1.0, raw_noise_std=1.0)

    def loss_fn(p):
        out = render_ray_bundle(p, rays, train, key=jax.random.PRNGKey(0))
        return jnp.mean(out["rgb_fine"] ** 2) + jnp.mean(out["rgb_coarse"] ** 2)

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in flat)
    assert total > 0.0
