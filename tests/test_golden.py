"""Golden-image regression: fixed-seed render must stay bit-stable.

Guards every layer of the render stack (ray gen, encoding, MLP, sampling,
compositing) against silent numerical drift. The fixture was produced by
the fp32 jnp pipeline on the CPU backend (see the generation recipe in the
repo history); both the jnp pipeline and the fused kernel must reproduce it.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from nerf_workspaces_explorer_tpu.models import NerfMLPSpec, init_nerf_params
from nerf_workspaces_explorer_tpu.ops.pallas_render import render_rays_fused
from nerf_workspaces_explorer_tpu.rays import create_rays
from nerf_workspaces_explorer_tpu.render import RenderSettings, render_ray_bundle

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_render.npz")

SPEC = NerfMLPSpec(depth=4, width=64, input_ch=39, input_ch_views=15)
SETTINGS = RenderSettings(n_samples=16, n_importance=16, num_freqs_3d=6, num_freqs_2d=2)


def _setup():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1234))
    params = {"coarse": init_nerf_params(k1, SPEC), "fine": init_nerf_params(k2, SPEC)}
    for p in params.values():
        p["alpha"]["b"] = p["alpha"]["b"] + 1.5
    rays = create_rays(jnp.eye(4)[None], 12, 16, 8.0, 8.0, 7.5, 5.5, 0.5, 4.0).reshape(192)
    return params, rays


def test_jnp_pipeline_matches_golden():
    params, rays = _setup()
    out = render_ray_bundle(params, rays, SETTINGS.for_eval(), spec=SPEC, full_outputs=True)
    golden = np.load(GOLDEN)
    np.testing.assert_allclose(np.asarray(out["rgb_fine"]), golden["rgb_fine"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["rgb_coarse"]), golden["rgb_coarse"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["depth_fine"]), golden["depth_fine"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["acc_fine"]), golden["acc_fine"], atol=1e-5)


def test_fused_kernel_matches_golden():
    params, rays = _setup()
    rgb = np.asarray(
        render_rays_fused(params, rays, SETTINGS, spec=SPEC, ray_tile=192, interpret=True)
    )
    golden = np.load(GOLDEN)
    # bf16 weights bound the deviation.
    np.testing.assert_allclose(rgb, golden["rgb_fine"], atol=5e-3)
