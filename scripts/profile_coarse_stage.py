"""Sweep the proposal coarse pass (samples_per_step) and the importance
kernel (ray_tile) with the queue-draining protocol on the real TPU.

The proposal 2x64 density pass costs ~10x its MXU floor — per-sample
encoding VPU work and per-grid-step overhead dominate, so larger sample
groups may amortize; the importance kernel's earlier tile sweep used the
enqueue-ack-biased naive loop (CLAUDE.md timing note) and needs redoing.

Usage: python scripts/profile_coarse_stage.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from nerf_workspaces_explorer_tpu.models import init_nerf_params
from nerf_workspaces_explorer_tpu.ops.pallas_render import (
    _dists_from_z,
    nerf_render_pallas,
    prepare_kernel_params,
    ray_phase_vectors,
)
from nerf_workspaces_explorer_tpu.ops.pallas_sampling import importance_merge_pallas
from nerf_workspaces_explorer_tpu.ops.quantize import calibrate_trunk
from nerf_workspaces_explorer_tpu.rays import create_rays
from nerf_workspaces_explorer_tpu.rays.sampling import coarse_z_vals
from nerf_workspaces_explorer_tpu.render.proposal import proposal_spec

W, H = 640, 480


def timed(name, fn, *args, n=10):
    out = jax.block_until_ready(fn(*args))  # compile
    start = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(out)  # drain the in-order queue (see CLAUDE.md timing note)
    ms = (time.perf_counter() - start) / n * 1000.0
    print(f"{name:52s} {ms:8.2f} ms", flush=True)
    return ms


def main() -> None:
    pspec = proposal_spec()
    prop = init_nerf_params(jax.random.PRNGKey(3), pspec)
    prop["alpha"]["b"] = prop["alpha"]["b"] + 2.0
    quant = calibrate_trunk(prop, pspec)

    rays = create_rays(
        jnp.eye(4)[None], H, W, 320.0, 320.0, W / 2 - 0.5, H / 2 - 0.5, 0.1, 10.0
    ).reshape(H * W)
    origins = rays.origins.astype(jnp.float32)
    dirs = rays.dirs.astype(jnp.float32)
    dir_norm = jnp.linalg.norm(dirs, axis=-1)[None, :]
    o_ph, d_ph = ray_phase_vectors(origins, dirs, 6)
    z_c = coarse_z_vals(
        rays.near.astype(jnp.float32), rays.far.astype(jnp.float32), 64
    ).T

    kp = prepare_kernel_params(prop, pspec)
    kp8 = prepare_kernel_params(prop, pspec, quant=quant)

    def coarse(kparams, sub, tile=4096):
        def run(z):
            wts = nerf_render_pallas(
                kparams, o_ph, d_ph, z, _dists_from_z(z, dir_norm),
                density_only=True, early_stop_eps=1e-3,
                samples_per_step=sub, ray_tile=tile,
            )
            return wts.sum()

        return jax.jit(run)

    for sub in (8, 16, 32, 64):
        timed(f"proposal 2x64 bf16 sub={sub}", coarse(kp, sub), z_c)
    timed("proposal 2x64 int8 sub=16", coarse(kp8, 16), z_c)
    for tile in (2048, 8192):
        timed(f"proposal 2x64 bf16 sub=16 tile={tile}",
              coarse(kp, 16, tile), z_c)

    wts = jax.block_until_ready(
        nerf_render_pallas(
            kp, o_ph, d_ph, z_c, _dists_from_z(z_c, dir_norm),
            density_only=True, early_stop_eps=1e-3,
        )
    )

    def imp(tile):
        return jax.jit(
            lambda w_, z_: importance_merge_pallas(
                w_, z_, 128, ray_tile=tile
            ).sum()
        )

    for tile in (256, 512, 1024, 2048):
        timed(f"importance+merge fused tile={tile}", imp(tile), wts, z_c)


if __name__ == "__main__":
    main()
