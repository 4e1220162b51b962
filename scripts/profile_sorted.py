"""Measure saturation-ordered ray sorting (render_rays_fused sort_rays=True)
on the real TPU.

Sorting only changes XLA-level argsort + gathers around the SAME fine-pass
kernel, so this compiles the kernel once and times the full coarse+fine
frame with and without sorting. Uses a density field with strong depth
variation (near-plane occluder over half the image) so saturation depth
actually varies across rays — the case sorting is for; random-init uniform
density saturates uniformly and shows ~0 gain by construction.

Usage: python scripts/profile_sorted.py [--width W] [--height H]
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
from nerf_workspaces_explorer_tpu.ops.pallas_render import render_rays_fused
from nerf_workspaces_explorer_tpu.ops.quantize import calibrate_model_quant
from nerf_workspaces_explorer_tpu.rays import create_rays
from nerf_workspaces_explorer_tpu.render import RenderSettings


def timed(name, fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))  # compile
    start = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    ms = (time.perf_counter() - start) / n * 1000.0
    print(f"{name:42s} {ms:8.1f} ms")
    return out, ms


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
    # Depth-varying density: boost the density bias AND the first-layer
    # weights acting on the raw-xyz rows so sigma depends strongly on
    # position -> rays saturate at very different depths.
    for p in params.values():
        p["alpha"]["b"] = p["alpha"]["b"] + 2.0
        w0 = p["pts"][0]["w"]
        p["pts"][0]["w"] = w0.at[:3].set(w0[:3] * 8.0)
    quant = calibrate_model_quant(params, spec)

    h, w = args.height, args.width
    rays = create_rays(
        jnp.eye(4)[None], h, w, 320.0, 320.0, w / 2 - 0.5, h / 2 - 0.5, 0.1, 10.0
    ).reshape(h * w)
    settings = RenderSettings()  # office config: 64 + 128

    def frame(sort):
        return jax.jit(
            lambda: render_rays_fused(
                params, rays, settings, spec=spec, quant=quant,
                early_stop_eps=1e-3, sort_rays=sort,
            ).sum()
        )

    timed("frame int8 unsorted", frame(False))
    timed("frame int8 sorted", frame(True))


if __name__ == "__main__":
    main()
