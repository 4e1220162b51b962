"""Numerical parity tests against the reference implementation.

These import the reference's torch code (mounted read-only at
/root/reference) and compare it against our JAX implementations on identical
inputs and weights. Skipped when the reference isn't mounted.
"""

import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE_ROOT, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

if reference_available():
    sys.path.insert(0, REFERENCE_ROOT)
    import torch

    torch.manual_seed(0)

import jax
import jax.numpy as jnp

from nerf_workspaces_explorer_tpu.camera import poses_from_coordinates
from nerf_workspaces_explorer_tpu.core import COORD
from nerf_workspaces_explorer_tpu.infer.checkpoint import (
    params_to_torch_state_dict,
    torch_state_dict_to_params,
)
from nerf_workspaces_explorer_tpu.models import (
    NerfMLPSpec,
    apply_nerf_mlp,
    init_nerf_params,
    positional_encoding,
)
from nerf_workspaces_explorer_tpu.rays import create_rays, pack_rays, sample_pdf
from nerf_workspaces_explorer_tpu.render import composite_rays


@pytest.fixture(scope="module")
def torch_mod():
    from nerf.models import embedding as ref_embedding
    from nerf.models import model_utils as ref_model_utils
    from nerf.models import nerf_model as ref_nerf_model
    from nerf.rays import rays as ref_rays
    from utils import camera_poses as ref_camera_poses

    return {
        "embedding": ref_embedding,
        "model_utils": ref_model_utils,
        "nerf_model": ref_nerf_model,
        "rays": ref_rays,
        "camera_poses": ref_camera_poses,
    }


def test_camera_pose_parity(torch_mod):
    ref_cp = torch_mod["camera_poses"]
    init = COORD(x=1.3, y=-0.5, z=0.7, yaw=12.0, pitch=-90.0, roll=4.0)
    views = [COORD(), COORD(yaw=-30.0, pitch=15.0), COORD(yaw=60.0), COORD(pitch=-45.0)]
    ref_poses = ref_cp.get_camera_poses_from_list_of_coordinates(init, views).numpy()
    ours = poses_from_coordinates(init, views)
    np.testing.assert_allclose(ours, ref_poses, atol=1e-5)


def test_create_rays_parity(torch_mod):
    ref_rays = torch_mod["rays"]
    init = COORD(x=0.4, y=-0.5, z=1.1, pitch=-90.0)
    poses = poses_from_coordinates(init, [COORD(yaw=-30.0)])
    h, w, fx, cx, cy = 12, 16, 8.0, 7.5, 5.5
    ref = ref_rays.create_rays(
        1, torch.tensor(poses), h, w, fx, fx, cx, cy, 0.1, 10.0, True
    ).numpy()
    ours = np.asarray(pack_rays(create_rays(jnp.asarray(poses), h, w, fx, fx, cx, cy, 0.1, 10.0)))
    assert ref.shape == ours.shape == (1, h * w, 11)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_embedding_parity(torch_mod):
    ref_embedding = torch_mod["embedding"]
    for num_freqs, factor in [(10, 10.0), (4, 1.0)]:
        emb = ref_embedding.Embedding(num_freqs=num_freqs, scalar_factor=factor)
        x = np.random.default_rng(1).normal(size=(50, 3)).astype(np.float32)
        ref = emb.embed(torch.tensor(x)).numpy()
        ours = np.asarray(positional_encoding(jnp.asarray(x), num_freqs, scalar_factor=factor))
        assert emb.output_dim == ours.shape[-1]
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_mlp_forward_parity(torch_mod):
    ref_nerf_model = torch_mod["nerf_model"]
    spec = NerfMLPSpec()
    params = init_nerf_params(jax.random.PRNGKey(0), spec)

    model = ref_nerf_model.NeRFModel(
        D=8, W=256, input_ch=63, input_ch_views=27, output_ch=5, use_view_dirs=True
    )
    state = {k: torch.tensor(v) for k, v in params_to_torch_state_dict(params).items()}
    model.load_state_dict(state)
    model.eval()

    rng = np.random.default_rng(2)
    pts = rng.normal(size=(64, 63)).astype(np.float32)
    views = rng.normal(size=(64, 27)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.tensor(np.concatenate([pts, views], axis=-1))).numpy()
    ours = np.asarray(apply_nerf_mlp(params, spec, jnp.asarray(pts), jnp.asarray(views)))
    np.testing.assert_allclose(ours, ref, atol=2e-5)

    # show_endpoint variant (reference nerf_model.py:72-81).
    with torch.no_grad():
        ref_ep = model(
            torch.tensor(np.concatenate([pts, views], axis=-1)), show_endpoint=True
        ).numpy()
    ours_ep = np.asarray(
        apply_nerf_mlp(params, spec, jnp.asarray(pts), jnp.asarray(views), show_endpoint=True)
    )
    np.testing.assert_allclose(ours_ep, ref_ep, atol=2e-5)


def test_torch_roundtrip_with_underscore_quirk(torch_mod):
    spec = NerfMLPSpec()
    params = init_nerf_params(jax.random.PRNGKey(3), spec)
    # Export WITHOUT underscores (like old reference checkpoints), convert
    # back, and check the `_`-requirk path reproduces identical params.
    state = params_to_torch_state_dict(params, underscore=False)
    restored = torch_state_dict_to_params(state, spec)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_raw2outputs_parity(torch_mod):
    ref_mu = torch_mod["model_utils"]
    rng = np.random.default_rng(4)
    n_rays, n_samples = 32, 64
    raw = rng.normal(size=(n_rays, n_samples, 4)).astype(np.float32) * 2.0
    z_vals = np.sort(rng.uniform(0.1, 10.0, size=(n_rays, n_samples))).astype(np.float32)
    rays_d = rng.normal(size=(n_rays, 3)).astype(np.float32)

    ref_rgb, ref_disp, ref_acc, ref_w, ref_depth, _ = ref_mu.raw2outputs(
        torch.tensor(raw), torch.tensor(z_vals), torch.tensor(rays_d),
        raw_noise_std=0, white_bkgd=False, endpoint_feat=False, cuda_enabled=False,
    )
    out = composite_rays(jnp.asarray(raw), jnp.asarray(z_vals), jnp.asarray(rays_d))
    np.testing.assert_allclose(np.asarray(out.rgb), ref_rgb.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.weights), ref_w.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.depth), ref_depth.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.disp), ref_disp.numpy(), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.acc), ref_acc.numpy(), atol=1e-5)


def test_sample_pdf_parity(torch_mod):
    ref_rays = torch_mod["rays"]
    rng = np.random.default_rng(5)
    bins = np.sort(rng.uniform(0.1, 10.0, size=(16, 63))).astype(np.float32)
    weights = rng.uniform(0.0, 1.0, size=(16, 62)).astype(np.float32)
    ref = ref_rays.sample_pdf(
        torch.tensor(bins), torch.tensor(weights), 128, det=True
    ).numpy()
    ours = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 128, deterministic=True))
    np.testing.assert_allclose(ours, ref, atol=1e-4)
