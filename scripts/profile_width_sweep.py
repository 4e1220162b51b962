"""Fine-pass kernel time vs student net width (turbo work-reduction study).

The turbo arch probe measured 4x256@10f (219 ms) barely beating 6x192@10f
(212 ms) at 640x480 despite ~25% fewer MXU-effective MACs, and 4x128@8f
catastrophically SLOW (1290 ms). This isolates the fused fine pass per
(depth, width, freqs) with the drained-queue protocol: int8-heads, 96
importance samples, eps=0 (content-independent floor) and eps=1e-3.

Run on the TPU: python scripts/profile_width_sweep.py
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
from nerf_workspaces_explorer_tpu.models.encoding import embedding_output_dim
from nerf_workspaces_explorer_tpu.ops.pallas_render import (
    _dists_from_z,
    encode_viewdirs_kernel_order,
    nerf_render_pallas,
    prepare_kernel_params,
    ray_phase_vectors,
)
from nerf_workspaces_explorer_tpu.ops.quantize import calibrate_trunk
from nerf_workspaces_explorer_tpu.rays import create_rays
from nerf_workspaces_explorer_tpu.rays.sampling import coarse_z_vals


def timed(name, fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))  # compile
    start = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(out)  # drain the in-order queue (axon acks enqueue only)
    ms = (time.perf_counter() - start) / n * 1000.0
    print(f"{name:54s} {ms:8.1f} ms", flush=True)
    return ms


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--samples", type=int, default=96)
    ap.add_argument(
        "--specs", type=str,
        default="8x256@10,6x192@10,4x256@10,4x128@10,4x128@8",
    )
    ap.add_argument(
        "--ray-tile", type=str, default=None,
        help="comma list of kernel ray tiles to sweep (default 4096); "
        "narrow nets leave VMEM headroom for larger tiles",
    )
    ap.add_argument(
        "--sps", type=str, default=None,
        help="comma list of samples_per_step values to sweep (default 8); "
        "narrow nets raise the per-step fixed-cost share",
    )
    ap.add_argument(
        "--eps", type=str, default="0,1e-3",
        help="comma list of early-stop eps values to time",
    )
    ap.add_argument(
        "--bf16", action="store_true",
        help="also time the unquantized bf16 kernel: narrow trunks are "
        "VPU/requant-bound, not MXU-bound, so bf16 (no requant chain) "
        "may approach int8 speed while removing its quality cost",
    )
    args = ap.parse_args()

    h, w = args.height, args.width
    rays = create_rays(
        jnp.eye(4)[None], h, w, 320.0, 320.0, w / 2 - 0.5, h / 2 - 0.5, 0.1,
        10.0,
    ).reshape(h * w)
    origins = rays.origins.astype(jnp.float32)
    dirs = rays.dirs.astype(jnp.float32)
    near, far = rays.near.astype(jnp.float32), rays.far.astype(jnp.float32)
    dir_norm = jnp.linalg.norm(dirs, axis=-1)[None, :]
    venc = encode_viewdirs_kernel_order(rays.viewdirs.astype(jnp.float32))
    z = coarse_z_vals(near, far, args.samples).T

    for tok in args.specs.split(","):
        arch, freqs = tok.strip().split("@")
        d, wd = (int(v) for v in arch.split("x"))
        freqs = int(freqs)
        spec = NerfMLPSpec(
            depth=d, width=wd, input_ch=embedding_output_dim(freqs),
        )
        params = init_nerf_params(jax.random.PRNGKey(0), spec)
        params["alpha"]["b"] = params["alpha"]["b"] + 2.0
        quant = calibrate_trunk(params, spec)
        kps = {"int8": prepare_kernel_params(params, spec, quant=quant)}
        if args.bf16:
            kps["bf16"] = prepare_kernel_params(params, spec, quant=None)
        o_ph, d_ph = ray_phase_vectors(
            origins, dirs, kps["int8"].pts_freqs
        )

        tiles = (
            [int(v) for v in args.ray_tile.split(",")]
            if args.ray_tile else [None]
        )
        spss = (
            [int(v) for v in args.sps.split(",")] if args.sps else [None]
        )
        eps_list = [float(v) for v in args.eps.split(",")]

        def fine(kp, eps, kw):
            def run(z_):
                maps = nerf_render_pallas(
                    kp, o_ph, d_ph, z_, _dists_from_z(z_, dir_norm), venc,
                    early_stop_eps=eps, **kw,
                )
                return maps.sum()

            return jax.jit(run)

        for tile in tiles:
            for sps in spss:
                kw, tag = {}, ""
                if tile is not None:
                    kw["ray_tile"] = tile
                    tag += f" tile={tile}"
                if sps is not None:
                    kw["samples_per_step"] = sps
                    tag += f" sps={sps}"
                for prec, kp in kps.items():
                    for eps in eps_list:
                        timed(
                            f"{tok} {prec} {args.samples}s{tag} eps={eps:g}",
                            fine(kp, eps, kw), z,
                        )


if __name__ == "__main__":
    main()
