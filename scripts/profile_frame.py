"""Frame-time breakdown for the fused render kernel on the real TPU.

Times each stage of the coarse+fine frame at the flagship office config
(640x480, 8x256 MLP, 64 coarse + 128 importance samples) so perf work aims
at the right stage. Every timed quantity reduces to a scalar in-jit (the
axon host link is ~30 MB/s — materializing a frame would swamp the kernel).

Usage: python scripts/profile_frame.py [--width W] [--height H]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from nerf_workspaces_explorer_tpu.models import NerfMLPSpec, init_nerf_params
from nerf_workspaces_explorer_tpu.ops.pallas_render import (
    _dists_from_z,
    encode_viewdirs_kernel_order,
    nerf_render_pallas,
    prepare_kernel_params,
    ray_phase_vectors,
)
from nerf_workspaces_explorer_tpu.ops.quantize import calibrate_trunk
from nerf_workspaces_explorer_tpu.rays import create_rays
from nerf_workspaces_explorer_tpu.rays.sampling import (
    coarse_z_vals,
    merge_sorted_z,
    sample_pdf,
)
from nerf_workspaces_explorer_tpu.render.proposal import proposal_spec


def timed(name, fn, *args, n=5, **kw):
    out = jax.block_until_ready(fn(*args, **kw))  # compile
    start = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args, **kw))
    ms = (time.perf_counter() - start) / n * 1000.0
    print(f"{name:42s} {ms:8.1f} ms")
    return out, ms


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--eps", type=float, default=1e-3)
    args = ap.parse_args()

    spec = NerfMLPSpec()
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "coarse": init_nerf_params(k1, spec),
        "fine": init_nerf_params(k2, spec),
    }
    for p in params.values():
        p["alpha"]["b"] = p["alpha"]["b"] + 2.0
    quant_t = {k: calibrate_trunk(v, spec, heads=False) for k, v in params.items()}
    quant = {k: calibrate_trunk(v, spec) for k, v in params.items()}

    pspec = proposal_spec()
    prop_params = init_nerf_params(k3, pspec)
    prop_params["alpha"]["b"] = prop_params["alpha"]["b"] + 2.0

    h, w = args.height, args.width
    rays = create_rays(
        jnp.eye(4)[None], h, w, 320.0, 320.0, w / 2 - 0.5, h / 2 - 0.5, 0.1, 10.0
    ).reshape(h * w)
    origins = rays.origins.astype(jnp.float32)
    dirs = rays.dirs.astype(jnp.float32)
    near, far = rays.near.astype(jnp.float32), rays.far.astype(jnp.float32)
    dir_norm = jnp.linalg.norm(dirs, axis=-1)[None, :]
    venc = encode_viewdirs_kernel_order(rays.viewdirs.astype(jnp.float32))

    kp_c = prepare_kernel_params(params["coarse"], spec)
    kp_c8 = prepare_kernel_params(params["coarse"], spec, quant=quant["coarse"])
    kp_f = prepare_kernel_params(params["fine"], spec)
    kp_f8t = prepare_kernel_params(
        params["fine"], spec, quant=quant_t["fine"]
    )
    kp_f8 = prepare_kernel_params(params["fine"], spec, quant=quant["fine"])
    kp_p = prepare_kernel_params(prop_params, pspec)

    o_ph, d_ph = ray_phase_vectors(origins, dirs)
    o_ph_p, d_ph_p = ray_phase_vectors(origins, dirs, 6)
    z_c = coarse_z_vals(near, far, 64).T

    eps = args.eps

    # NOTE: all large arrays are jit ARGUMENTS — closure constants bake into
    # the HLO and blow past the axon remote-compile request limit (HTTP 413
    # at the fine pass's 236 MB z_fine).
    @jax.jit
    def coarse_bf16(z):
        wts = nerf_render_pallas(
            kp_c, o_ph, d_ph, z, _dists_from_z(z, dir_norm),
            density_only=True, early_stop_eps=eps,
        )
        return wts.sum()

    @jax.jit
    def coarse_int8(z):
        wts = nerf_render_pallas(
            kp_c8, o_ph, d_ph, z, _dists_from_z(z, dir_norm),
            density_only=True, early_stop_eps=eps,
        )
        return wts.sum()

    @jax.jit
    def coarse_proposal(z):
        wts = nerf_render_pallas(
            kp_p, o_ph_p, d_ph_p, z, _dists_from_z(z, dir_norm),
            density_only=True, early_stop_eps=eps,
        )
        return wts.sum()

    @jax.jit
    def importance(weights_t):
        weights = weights_t.T
        z = z_c.T
        z_mid = 0.5 * (z[..., 1:] + z[..., :-1])
        z_samples = sample_pdf(z_mid, weights[..., 1:-1], 128, deterministic=True)
        z_fine = merge_sorted_z(z, z_samples).T
        return z_fine

    def fine_fn(kp, sub=None):
        def run(z):
            maps = nerf_render_pallas(
                kp, o_ph, d_ph, z, _dists_from_z(z, dir_norm), venc,
                early_stop_eps=eps, samples_per_step=sub,
            )
            return maps.sum()

        return jax.jit(run)

    wts, _ = timed("coarse 64 density bf16", coarse_bf16, z_c)
    timed("coarse 64 density int8", coarse_int8, z_c)
    timed("coarse 64 density proposal-2x64-bf16", coarse_proposal, z_c)

    wts_raw = nerf_render_pallas(
        kp_c8, o_ph, d_ph, z_c, _dists_from_z(z_c, dir_norm),
        density_only=True, early_stop_eps=eps,
    )
    z_fine, _ = timed("importance sample+merge (XLA)", importance, wts_raw)
    z_fine = jax.block_until_ready(z_fine)

    timed("fine 192 full bf16", fine_fn(kp_f), z_fine)
    timed("fine 192 full int8-trunk", fine_fn(kp_f8t), z_fine)
    timed("fine 192 full int8-heads", fine_fn(kp_f8), z_fine)
    timed("fine 192 full int8-heads sub16", fine_fn(kp_f8, 16), z_fine)


if __name__ == "__main__":
    main()
