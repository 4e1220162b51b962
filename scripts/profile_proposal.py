"""Measure proposal-mode full-frame serving on the real TPU.

Compares the 640x480 int8 frame with the standard 8x256 coarse pass against
the proposal-mode frame (2x64 density-only proposal net guiding importance
sampling — render/proposal.py), with the proposal net in bf16 and in int8.
The fine pass (192 samples, int8 trunk+heads) is identical in all three, so
the delta isolates the coarse/proposal leg.

Usage: python scripts/profile_proposal.py [--width W] [--height H]
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
from nerf_workspaces_explorer_tpu.render.proposal import proposal_spec


def timed(name, fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))  # compile
    start = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    ms = (time.perf_counter() - start) / n * 1000.0
    print(f"{name:46s} {ms:8.1f} ms", flush=True)
    return out, ms


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    args = ap.parse_args()

    spec = NerfMLPSpec()
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "coarse": init_nerf_params(k1, spec),
        "fine": init_nerf_params(k2, spec),
        "proposal": init_nerf_params(k3, proposal_spec(6)),
    }
    for p in params.values():
        p["alpha"]["b"] = p["alpha"]["b"] + 2.0
    quant = calibrate_model_quant(params, spec)
    quant_noprop = {k: v for k, v in quant.items() if k != "proposal"}

    h, w = args.height, args.width
    rays = create_rays(
        jnp.eye(4)[None], h, w, 320.0, 320.0, w / 2 - 0.5, h / 2 - 0.5, 0.1, 10.0
    ).reshape(h * w)
    settings = RenderSettings()  # office config: 64 + 128
    settings_prop = settings._replace(use_proposal=True, proposal_num_freqs=6)

    # Pass params/rays as jit ARGUMENTS (zero-arg closures constant-fold).
    def frame(s, q):
        return jax.jit(
            lambda p, r: render_rays_fused(
                p, r, s, spec=spec, quant=q, early_stop_eps=1e-3
            ).sum()
        )

    timed("frame int8 coarse 8x256", frame(settings, quant_noprop),
          params, rays)
    timed("frame proposal-bf16 + int8 fine",
          frame(settings_prop, quant_noprop), params, rays)
    timed("frame proposal-int8 + int8 fine",
          frame(settings_prop, quant), params, rays)


if __name__ == "__main__":
    main()
