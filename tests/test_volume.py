"""Tests for volume compositing (raw2outputs equivalent)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_workspaces_explorer_tpu.render import composite_rays
from nerf_workspaces_explorer_tpu.render.volume import exclusive_cumprod


def test_exclusive_cumprod_matches_direct():
    x = jax.random.uniform(jax.random.PRNGKey(0), (7, 13), minval=0.1, maxval=1.0)
    log_version = exclusive_cumprod(x, use_logspace=True)
    direct = exclusive_cumprod(x, use_logspace=False)
    np.testing.assert_allclose(np.asarray(log_version), np.asarray(direct), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(log_version[:, 0]), 1.0, atol=1e-7)


def test_fully_opaque_first_sample():
    # A huge sigma at the first sample makes the ray's color that sample's rgb.
    n_rays, n_samples = 3, 8
    raw = np.zeros((n_rays, n_samples, 4), dtype=np.float32)
    raw[:, 0, :3] = [3.0, -3.0, 0.0]
    raw[:, 0, 3] = 1e8
    z_vals = np.broadcast_to(np.linspace(0.5, 2.0, n_samples), (n_rays, n_samples))
    rays_d = np.broadcast_to(np.array([0.0, 0.0, 1.0]), (n_rays, 3))
    out = composite_rays(jnp.asarray(raw), jnp.asarray(z_vals), jnp.asarray(rays_d))
    sig = 1.0 / (1.0 + np.exp(-np.array([3.0, -3.0, 0.0])))
    np.testing.assert_allclose(np.asarray(out.rgb), np.broadcast_to(sig, (n_rays, 3)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.depth), 0.5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.acc), 1.0, atol=1e-5)


def test_empty_space_accumulates_nothing():
    raw = np.zeros((2, 8, 4), dtype=np.float32)
    raw[..., 3] = -100.0  # relu(sigma) = 0 -> alpha = 0
    z_vals = np.broadcast_to(np.linspace(0.1, 10.0, 8), (2, 8))
    rays_d = np.broadcast_to(np.array([0.0, 0.0, 1.0]), (2, 3))
    out = composite_rays(jnp.asarray(raw), jnp.asarray(z_vals), jnp.asarray(rays_d))
    np.testing.assert_allclose(np.asarray(out.acc), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.rgb), 0.0, atol=1e-6)


def test_white_background():
    raw = np.zeros((2, 8, 4), dtype=np.float32)
    raw[..., 3] = -100.0
    z_vals = np.broadcast_to(np.linspace(0.1, 10.0, 8), (2, 8))
    rays_d = np.broadcast_to(np.array([0.0, 0.0, 1.0]), (2, 3))
    out = composite_rays(
        jnp.asarray(raw), jnp.asarray(z_vals), jnp.asarray(rays_d), white_background=True
    )
    np.testing.assert_allclose(np.asarray(out.rgb), 1.0, atol=1e-6)


def test_dir_norm_scales_distances():
    # Doubling |d| doubles effective dists -> higher alpha for the same sigma.
    raw = np.zeros((1, 8, 4), dtype=np.float32)
    raw[..., 3] = 1.0
    z_vals = np.broadcast_to(np.linspace(0.1, 2.0, 8), (1, 8))
    d1 = np.array([[0.0, 0.0, 1.0]])
    d2 = np.array([[0.0, 0.0, 2.0]])
    acc1 = composite_rays(jnp.asarray(raw), jnp.asarray(z_vals), jnp.asarray(d1)).weights
    acc2 = composite_rays(jnp.asarray(raw), jnp.asarray(z_vals), jnp.asarray(d2)).weights
    assert np.asarray(acc2)[0, 0] > np.asarray(acc1)[0, 0]


def test_weights_sum_at_most_one():
    key = jax.random.PRNGKey(3)
    raw = jax.random.normal(key, (16, 32, 4)) * 2.0
    z_vals = jnp.broadcast_to(jnp.linspace(0.1, 10.0, 32), (16, 32))
    rays_d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (16, 3))
    out = composite_rays(raw, z_vals, rays_d)
    assert np.all(np.asarray(out.acc) <= 1.0 + 1e-5)
    assert np.all(np.asarray(out.weights) >= 0.0)


def test_noise_requires_key_and_is_reproducible():
    raw = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 4))
    z_vals = jnp.broadcast_to(jnp.linspace(0.1, 10.0, 8), (4, 8))
    rays_d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (4, 3))
    out1 = composite_rays(
        raw, z_vals, rays_d, raw_noise_std=1.0, noise_key=jax.random.PRNGKey(7)
    )
    out2 = composite_rays(
        raw, z_vals, rays_d, raw_noise_std=1.0, noise_key=jax.random.PRNGKey(7)
    )
    np.testing.assert_allclose(np.asarray(out1.rgb), np.asarray(out2.rgb))
    out3 = composite_rays(
        raw, z_vals, rays_d, raw_noise_std=1.0, noise_key=jax.random.PRNGKey(8)
    )
    assert not np.allclose(np.asarray(out1.rgb), np.asarray(out3.rgb))


def test_endpoint_feature_compositing():
    raw = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 4 + 128))
    z_vals = jnp.broadcast_to(jnp.linspace(0.1, 10.0, 8), (4, 8))
    rays_d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (4, 3))
    out = composite_rays(raw, z_vals, rays_d, endpoint_feat=True)
    assert out.feature is not None and out.feature.shape == (4, 128)
