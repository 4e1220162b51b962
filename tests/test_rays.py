"""Tests for ray generation and depth sampling."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_workspaces_explorer_tpu.rays import (
    camera_ray_dirs,
    coarse_z_vals,
    create_rays,
    merge_sorted_z,
    pack_rays,
    sample_pdf,
    stratified_perturb,
    unpack_rays,
)


def test_camera_ray_dirs_opencv_convention():
    h, w, f = 4, 6, 10.0
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    dirs = camera_ray_dirs(h, w, f, f, cx, cy)
    assert dirs.shape == (h, w, 3)
    # x grows to the right, y grows downward, z is forward (+1).
    np.testing.assert_allclose(dirs[0, 0], [(0 - cx) / f, (0 - cy) / f, 1.0], atol=1e-7)
    np.testing.assert_allclose(dirs[3, 5], [(5 - cx) / f, (3 - cy) / f, 1.0], atol=1e-7)
    assert np.all(np.asarray(dirs[..., 2]) == 1.0)


def test_create_rays_identity_pose():
    h, w = 4, 4
    c2w = jnp.eye(4)[None]
    rays = create_rays(c2w, h, w, 2.0, 2.0, 1.5, 1.5, 0.1, 10.0)
    assert rays.origins.shape == (1, h * w, 3)
    np.testing.assert_allclose(rays.origins, 0.0)
    np.testing.assert_allclose(rays.near, 0.1)
    np.testing.assert_allclose(rays.far, 10.0)
    norms = jnp.linalg.norm(rays.viewdirs, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-6)


def test_create_rays_rotation_and_translation():
    h = w = 2
    c2w = np.eye(4, dtype=np.float32)
    # Rotate 90 deg about Y: camera +z (forward) maps to world +x.
    c2w[:3, :3] = [[0, 0, 1], [0, 1, 0], [-1, 0, 0]]
    c2w[:3, 3] = [1, 2, 3]
    rays = create_rays(jnp.asarray(c2w)[None], h, w, 1.0, 1.0, 0.5, 0.5, 0.1, 10.0)
    np.testing.assert_allclose(rays.origins[0, 0], [1, 2, 3], atol=1e-6)
    # Camera dir for pixel (0,0) is (-0.5, -0.5, 1) -> world (1, -0.5, 0.5).
    np.testing.assert_allclose(rays.dirs[0, 0], [1.0, -0.5, 0.5], atol=1e-6)


def test_pack_unpack_roundtrip():
    c2w = jnp.eye(4)[None]
    rays = create_rays(c2w, 3, 5, 2.0, 2.0, 2.0, 1.0, 0.1, 10.0)
    flat = pack_rays(rays)
    assert flat.shape == (1, 15, 11)
    rt = unpack_rays(flat)
    for a, b in zip(rays, rt):
        np.testing.assert_allclose(a, b)


def test_coarse_z_vals_linspace():
    near = jnp.full((5, 1), 0.1)
    far = jnp.full((5, 1), 10.0)
    z = coarse_z_vals(near, far, 64)
    assert z.shape == (5, 64)
    np.testing.assert_allclose(z[:, 0], 0.1, atol=1e-6)
    np.testing.assert_allclose(z[:, -1], 10.0, atol=1e-5)
    diffs = np.diff(np.asarray(z), axis=-1)
    np.testing.assert_allclose(diffs, np.broadcast_to(diffs[:, :1], diffs.shape), atol=1e-5)


def test_stratified_perturb_within_bins():
    z = jnp.broadcast_to(jnp.linspace(1.0, 2.0, 8), (10, 8))
    zp = stratified_perturb(z, jax.random.PRNGKey(0))
    assert zp.shape == z.shape
    mids = 0.5 * (z[:, 1:] + z[:, :-1])
    lower = np.concatenate([np.asarray(z[:, :1]), np.asarray(mids)], axis=-1)
    upper = np.concatenate([np.asarray(mids), np.asarray(z[:, -1:])], axis=-1)
    zp = np.asarray(zp)
    assert np.all(zp >= lower - 1e-6) and np.all(zp <= upper + 1e-6)


def test_sample_pdf_uniform_weights_deterministic():
    # With uniform weights the inverse CDF is ~linear, so deterministic
    # samples land near evenly spaced positions across the bins.
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 63), (4, 63))
    weights = jnp.ones((4, 62))
    samples = sample_pdf(bins, weights, 128, deterministic=True)
    assert samples.shape == (4, 128)
    s = np.asarray(samples)
    assert np.all(np.diff(s, axis=-1) >= -1e-6)  # monotone
    np.testing.assert_allclose(s[:, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(s[:, -1], 1.0, atol=1e-6)
    np.testing.assert_allclose(
        s, np.broadcast_to(np.linspace(0, 1, 128), s.shape), atol=0.02
    )


def test_sample_pdf_concentrates_on_heavy_bins():
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 63), (1, 63))
    weights = np.full((1, 62), 1e-8, dtype=np.float32)
    weights[0, 30] = 1.0  # all mass in one bin
    samples = sample_pdf(bins, jnp.asarray(weights), 64, deterministic=True)
    s = np.asarray(samples)
    lo, hi = bins[0, 30], bins[0, 31]
    frac_inside = np.mean((s >= lo - 1e-3) & (s <= hi + 1e-3))
    assert frac_inside > 0.9


def test_sample_pdf_stochastic_in_range():
    bins = jnp.broadcast_to(jnp.linspace(2.0, 3.0, 63), (8, 63))
    weights = jax.random.uniform(jax.random.PRNGKey(1), (8, 62))
    samples = sample_pdf(
        bins, weights, 128, deterministic=False, key=jax.random.PRNGKey(2)
    )
    s = np.asarray(samples)
    assert np.all(s >= 2.0 - 1e-5) and np.all(s <= 3.0 + 1e-5)


def test_merge_sorted_z():
    z = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 8), (2, 8))
    extra = jnp.broadcast_to(jnp.array([0.15, 0.55, 0.95]), (2, 3))
    merged = merge_sorted_z(z, extra)
    assert merged.shape == (2, 11)
    m = np.asarray(merged)
    assert np.all(np.diff(m, axis=-1) >= 0)
    assert set(np.round(m[0], 4)) == set(
        np.round(np.concatenate([np.asarray(z[0]), np.asarray(extra[0])]), 4)
    )
