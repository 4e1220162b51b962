"""Ablate the int8 fine pass against its MXU speed-of-light on the TPU.

The 192-sample int8-heads fine pass dominates the frame (~300 ms of
~362 ms at 640x480). Theoretical int8 floor (59M samples x ~0.66M MACs at
the measured 374 TOP/s) is ~208 ms. This isolates where the rest goes:
  - early termination gain: eps=1e-3 vs eps=0;
  - head cost: full pipeline vs density-only (trunk+sigma);
  - int8 speedup sanity: bf16 control.

Usage: python scripts/profile_fine_floor.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from nerf_workspaces_explorer_tpu.models import NerfMLPSpec, init_nerf_params
from nerf_workspaces_explorer_tpu.ops.pallas_render import (
    _dists_from_z,
    encode_viewdirs_kernel_order,
    nerf_render_pallas,
    prepare_kernel_params,
    ray_phase_vectors,
)
from nerf_workspaces_explorer_tpu.ops.pallas_sampling import importance_merge_pallas
from nerf_workspaces_explorer_tpu.ops.quantize import calibrate_trunk
from nerf_workspaces_explorer_tpu.rays import create_rays
from nerf_workspaces_explorer_tpu.rays.sampling import coarse_z_vals


def timed(name, fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))  # compile
    start = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    # Host fetch drains the in-order execution queue (axon block_until_ready
    # acks enqueue only; big kernels self-limit via back-pressure but the
    # drain makes the number exact either way).
    float(out)
    ms = (time.perf_counter() - start) / n * 1000.0
    print(f"{name:52s} {ms:8.1f} ms", flush=True)
    return ms


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    args = ap.parse_args()

    spec = NerfMLPSpec()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        "coarse": init_nerf_params(k1, spec),
        "fine": init_nerf_params(k2, spec),
    }
    for p in params.values():
        p["alpha"]["b"] = p["alpha"]["b"] + 2.0
    quant = {k: calibrate_trunk(v, spec) for k, v in params.items()}

    h, w = args.height, args.width
    rays = create_rays(
        jnp.eye(4)[None], h, w, 320.0, 320.0, w / 2 - 0.5, h / 2 - 0.5, 0.1, 10.0
    ).reshape(h * w)
    origins = rays.origins.astype(jnp.float32)
    dirs = rays.dirs.astype(jnp.float32)
    near, far = rays.near.astype(jnp.float32), rays.far.astype(jnp.float32)
    dir_norm = jnp.linalg.norm(dirs, axis=-1)[None, :]
    venc = encode_viewdirs_kernel_order(rays.viewdirs.astype(jnp.float32))

    kp_c8 = prepare_kernel_params(params["coarse"], spec, quant=quant["coarse"])
    kp_f = prepare_kernel_params(params["fine"], spec)
    kp_f8 = prepare_kernel_params(params["fine"], spec, quant=quant["fine"])

    o_ph, d_ph = ray_phase_vectors(origins, dirs)
    z_c = coarse_z_vals(near, far, 64).T

    wts_raw = jax.block_until_ready(
        nerf_render_pallas(
            kp_c8, o_ph, d_ph, z_c, _dists_from_z(z_c, dir_norm),
            density_only=True, early_stop_eps=1e-3,
        )
    )
    z_fine = jax.block_until_ready(
        jax.jit(lambda w_, z_: importance_merge_pallas(w_, z_, 128))(wts_raw, z_c)
    )

    def fine(kp, eps, density_only=False):
        def run(z):
            maps = nerf_render_pallas(
                kp, o_ph, d_ph, z, _dists_from_z(z, dir_norm),
                None if density_only else venc,
                density_only=density_only, early_stop_eps=eps,
            )
            return maps.sum()

        return jax.jit(run)

    timed("fine 192 int8-heads eps=1e-3 (control)", fine(kp_f8, 1e-3), z_fine)
    timed("fine 192 int8-heads eps=0 (no ET)", fine(kp_f8, 0.0), z_fine)
    timed("fine 192 int8 density-only eps=1e-3",
          fine(kp_f8, 1e-3, density_only=True), z_fine)
    timed("fine 192 int8 density-only eps=0",
          fine(kp_f8, 0.0, density_only=True), z_fine)
    timed("fine 192 bf16 eps=1e-3 (control)", fine(kp_f, 1e-3), z_fine)


if __name__ == "__main__":
    main()
