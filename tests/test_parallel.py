"""Tests for multi-chip sharding on the simulated 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_workspaces_explorer_tpu.models import NerfMLPSpec, init_nerf_params
from nerf_workspaces_explorer_tpu.parallel import data_mesh, shard_render
from nerf_workspaces_explorer_tpu.rays import create_rays
from nerf_workspaces_explorer_tpu.render import RenderSettings, render_ray_bundle

SPEC = NerfMLPSpec(depth=4, width=64, input_ch=39, input_ch_views=15)
SETTINGS = RenderSettings(n_samples=8, n_importance=8, num_freqs_3d=6, num_freqs_2d=2)


@pytest.fixture(scope="module")
def params():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    return {"coarse": init_nerf_params(k1, SPEC), "fine": init_nerf_params(k2, SPEC)}


def test_data_mesh_shapes():
    mesh = data_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)
    small = data_mesh(4)
    assert small.devices.size == 4
    with pytest.raises(ValueError):
        data_mesh(100)


def test_shard_render_matches_single_device(params):
    rays = create_rays(jnp.eye(4)[None], 8, 16, 8.0, 8.0, 7.5, 3.5, 0.1, 6.0).reshape(128)
    mesh = data_mesh()
    sharded = shard_render(params, rays, SETTINGS, mesh, spec=SPEC, chunk=64)
    single = render_ray_bundle(params, rays, SETTINGS.for_eval(), spec=SPEC, full_outputs=False)
    np.testing.assert_allclose(
        np.asarray(sharded["rgb_fine"]), np.asarray(single["rgb_fine"]), atol=1e-5
    )


def test_shard_render_non_divisible_ray_count(params):
    # 100 rays over 8 devices forces edge padding.
    rays = create_rays(jnp.eye(4)[None], 10, 10, 5.0, 5.0, 4.5, 4.5, 0.1, 6.0).reshape(100)
    mesh = data_mesh()
    out = shard_render(params, rays, SETTINGS, mesh, spec=SPEC, chunk=64)
    assert out["rgb_fine"].shape == (100, 3)
    single = render_ray_bundle(params, rays, SETTINGS.for_eval(), spec=SPEC, full_outputs=False)
    np.testing.assert_allclose(
        np.asarray(out["rgb_fine"]), np.asarray(single["rgb_fine"]), atol=1e-5
    )


def test_shard_render_under_jit(params):
    rays = create_rays(jnp.eye(4)[None], 8, 16, 8.0, 8.0, 7.5, 3.5, 0.1, 6.0).reshape(128)
    mesh = data_mesh()
    fn = jax.jit(lambda p, r: shard_render(p, r, SETTINGS, mesh, spec=SPEC, chunk=64))
    out = fn(params, rays)
    assert out["rgb_fine"].shape == (128, 3)
    assert np.all(np.isfinite(np.asarray(out["rgb_fine"])))


def test_graft_entry_provisions_cpu_devices():
    """`__graft_entry__._provision_devices` must self-provision an n-device
    virtual CPU platform before first backend touch, even when the
    environment exports a single-chip platform (round-1 driver failure)."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # unknown platform -> must force CPU
    env.pop("XLA_FLAGS", None)
    code = (
        "import __graft_entry__ as g; g._provision_devices(4); import jax; "
        "ds = jax.devices(); assert len(ds) >= 4, ds; "
        "assert ds[0].platform == 'cpu', ds"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd="/root/repo",
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr


def test_shard_render_fused_kernel_interpret(params):
    """The production multi-chip path: fused Pallas kernel per ray shard
    (interpret mode on the CPU mesh)."""
    rays = create_rays(jnp.eye(4)[None], 8, 16, 8.0, 8.0, 7.5, 3.5, 0.5, 4.0).reshape(128)
    mesh = data_mesh()
    out = shard_render(
        params, rays, SETTINGS, mesh, spec=SPEC, use_pallas=True, interpret=True
    )
    assert out["rgb_fine"].shape == (128, 3)
    single = render_ray_bundle(params, rays, SETTINGS.for_eval(), spec=SPEC, full_outputs=False)
    np.testing.assert_allclose(
        np.asarray(out["rgb_fine"]), np.asarray(single["rgb_fine"]), atol=5e-3
    )


def test_shard_render_serving_config_int8_proposal(params):
    """The benchmarked serving configuration over the mesh: proposal coarse
    pass + full-int8 fused kernels per ray shard (bench.py; quant threaded
    through shard_render)."""
    from nerf_workspaces_explorer_tpu.ops.quantize import calibrate_model_quant
    from nerf_workspaces_explorer_tpu.render.proposal import proposal_spec

    k1, _ = jax.random.split(jax.random.PRNGKey(5))
    serve_params = {
        "proposal": init_nerf_params(k1, proposal_spec(6)),
        "fine": params["fine"],
    }
    for p in serve_params.values():
        p["alpha"]["b"] = p["alpha"]["b"] + 1.5
    settings = SETTINGS._replace(use_proposal=True, proposal_num_freqs=6)
    quant = calibrate_model_quant(serve_params, SPEC, box=4.0)
    assert all(q.int8_heads for q in quant.values())
    rays = create_rays(jnp.eye(4)[None], 8, 16, 8.0, 8.0, 7.5, 3.5, 0.5, 4.0).reshape(128)
    mesh = data_mesh()
    out = shard_render(
        serve_params, rays, settings, mesh, spec=SPEC,
        use_pallas=True, interpret=True, quant=quant,
    )
    assert out["rgb_fine"].shape == (128, 3)
    single = render_ray_bundle(
        serve_params, rays, settings.for_eval(), spec=SPEC, full_outputs=False
    )
    err = np.abs(np.asarray(out["rgb_fine"]) - np.asarray(single["rgb_fine"]))
    assert np.all(np.isfinite(err))
    assert err.mean() < 4e-3, err.mean()
    assert err.max() < 4e-2, err.max()
