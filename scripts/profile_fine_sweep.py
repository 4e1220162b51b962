"""Sweep the fine-pass kernel grid shape (ray_tile x samples_per_step) in
the int8-heads serving mode on the real TPU.

The 192-sample int8 fine pass is the dominant frame stage (~310 ms of a
~390 ms 640x480 frame); this sweeps the two grid statics to find the best
overhead/early-termination-granularity trade. Also times the fused Pallas
importance+merge kernel (ops/pallas_sampling.py) vs its XLA equivalent.

Usage: python scripts/profile_fine_sweep.py [--width W] [--height H]
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


def timed(name, fn, *args, n=5, **kw):
    out = jax.block_until_ready(fn(*args, **kw))  # compile
    start = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    float(out)  # drain the in-order queue (CLAUDE.md timing note)
    ms = (time.perf_counter() - start) / n * 1000.0
    print(f"{name:46s} {ms:8.1f} ms", flush=True)
    return out, ms


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--eps", type=float, default=1e-3)
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
    kp_f8 = prepare_kernel_params(params["fine"], spec, quant=quant["fine"])

    o_ph, d_ph = ray_phase_vectors(origins, dirs)
    z_c = coarse_z_vals(near, far, 64).T

    eps = args.eps

    # Large arrays are jit ARGUMENTS (closure constants blow the axon
    # remote-compile 413 limit at frame scale).
    wts_raw = jax.block_until_ready(
        nerf_render_pallas(
            kp_c8, o_ph, d_ph, z_c, _dists_from_z(z_c, dir_norm),
            density_only=True, early_stop_eps=eps,
        )
    )

    z_fine = jax.block_until_ready(
        jax.jit(lambda w_, z_: importance_merge_pallas(w_, z_, 128))(wts_raw, z_c)
    )

    def fine_fn(tile, sub):
        def run(z):
            maps = nerf_render_pallas(
                kp_f8, o_ph, d_ph, z, _dists_from_z(z, dir_norm), venc,
                early_stop_eps=eps, ray_tile=tile, samples_per_step=sub,
            )
            return maps.sum()

        return jax.jit(run)

    for tile, sub in [(4096, 8), (4096, 16), (2048, 8), (2048, 16), (1024, 8)]:
        timed(f"fine 192 int8-heads tile={tile} sub={sub}",
              fine_fn(tile, sub), z_fine)


if __name__ == "__main__":
    main()
