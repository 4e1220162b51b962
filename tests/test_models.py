"""Tests for positional encoding and the NeRF MLP."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_workspaces_explorer_tpu.models import (
    NerfMLPSpec,
    apply_nerf_mlp,
    embedding_output_dim,
    init_nerf_params,
    positional_encoding,
)


def test_embedding_dims():
    # Reference …inference_handler.py:93-103: 3D -> 63, dirs -> 27.
    assert embedding_output_dim(10) == 63
    assert embedding_output_dim(4) == 27


def test_encoding_values_and_ordering():
    x = jnp.array([[0.5, -1.0, 2.0]])
    out = positional_encoding(x, num_freqs=2, scalar_factor=1.0)
    assert out.shape == (1, 3 * (1 + 2 * 2))
    np.testing.assert_allclose(out[0, 0:3], [0.5, -1.0, 2.0], atol=1e-7)
    # Per-frequency blocks are [sin_f, cos_f] (reference embedding.py:32-38).
    np.testing.assert_allclose(out[0, 3:6], np.sin([0.5, -1.0, 2.0]), atol=1e-6)
    np.testing.assert_allclose(out[0, 6:9], np.cos([0.5, -1.0, 2.0]), atol=1e-6)
    np.testing.assert_allclose(out[0, 9:12], np.sin([1.0, -2.0, 4.0]), atol=1e-6)
    np.testing.assert_allclose(out[0, 12:15], np.cos([1.0, -2.0, 4.0]), atol=1e-6)


def test_encoding_scalar_factor():
    # Input divided by the factor BEFORE encoding (reference embedding.py:48).
    x = jnp.array([[10.0, 0.0, 0.0]])
    out = positional_encoding(x, num_freqs=1, scalar_factor=10.0)
    np.testing.assert_allclose(out[0, 0], 1.0, atol=1e-7)
    np.testing.assert_allclose(out[0, 3], np.sin(1.0), atol=1e-6)


def test_mlp_param_shapes_with_skip():
    spec = NerfMLPSpec()
    params = init_nerf_params(jax.random.PRNGKey(0), spec)
    dims = [(p["w"].shape[0], p["w"].shape[1]) for p in params["pts"]]
    # Skip layout (reference nerf_model.py:32-34): layer index 5 of the list
    # consumes W + input_ch inputs.
    assert dims == [(63, 256)] + [(256, 256)] * 4 + [(319, 256)] + [(256, 256)] * 2
    assert params["alpha"]["w"].shape == (256, 1)
    assert params["feature"]["w"].shape == (256, 256)
    assert params["views"][0]["w"].shape == (256 + 27, 128)
    assert params["rgb"]["w"].shape == (128, 3)


def test_mlp_forward_shapes():
    spec = NerfMLPSpec()
    params = init_nerf_params(jax.random.PRNGKey(0), spec)
    pts = jax.random.normal(jax.random.PRNGKey(1), (17, 63))
    views = jax.random.normal(jax.random.PRNGKey(2), (17, 27))
    out = apply_nerf_mlp(params, spec, pts, views)
    assert out.shape == (17, 4)
    out_ep = apply_nerf_mlp(params, spec, pts, views, show_endpoint=True)
    assert out_ep.shape == (17, 4 + 128)
    # Endpoint block is the post-ReLU view-layer activations -> nonnegative.
    assert np.all(np.asarray(out_ep[:, 4:]) >= 0)
    # rgb/alpha block identical with and without endpoint.
    np.testing.assert_allclose(out, out_ep[:, :4], atol=1e-6)


def test_mlp_no_view_dirs_mode():
    spec = NerfMLPSpec(use_view_dirs=False, input_ch_views=0, output_ch=4)
    params = init_nerf_params(jax.random.PRNGKey(0), spec)
    assert "output" in params and "rgb" not in params
    pts = jax.random.normal(jax.random.PRNGKey(1), (5, 63))
    out = apply_nerf_mlp(params, spec, pts)
    assert out.shape == (5, 4)


def test_mlp_skip_uses_input_not_activations():
    # Zeroing the first-layer weights must still let encoded_pts reach the
    # deeper layers through the skip concat.
    spec = NerfMLPSpec(depth=6, skips=(2,))
    params = init_nerf_params(jax.random.PRNGKey(0), spec)
    pts = jax.random.normal(jax.random.PRNGKey(1), (3, 63))
    views = jax.random.normal(jax.random.PRNGKey(2), (3, 27))
    out_a = apply_nerf_mlp(params, spec, pts, views)
    out_b = apply_nerf_mlp(params, spec, pts * 1.5, views)
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))


def test_mlp_jit_and_vmap():
    spec = NerfMLPSpec()
    params = init_nerf_params(jax.random.PRNGKey(0), spec)
    fn = jax.jit(lambda p, x, v: apply_nerf_mlp(p, spec, x, v))
    pts = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 63))
    views = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 27))
    out = fn(params, pts, views)
    assert out.shape == (4, 8, 4)
