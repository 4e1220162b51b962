"""Frame-time scaling across resolutions for the serving configuration
(proposal coarse + full-int8 fused kernels) on the real TPU.

Each resolution is one NeRFRenderer uint8 frame, end-to-end (pose math,
kernels, on-device quantization, host fetch) — the same path bench.py
times at 640x480.

Usage: python scripts/profile_resolutions.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from nerf_workspaces_explorer_tpu.camera.poses import poses_from_coordinates
from nerf_workspaces_explorer_tpu.core import COORD
from nerf_workspaces_explorer_tpu.core.config import (
    ExperimentConfig,
    FrameworkConfig,
)
from nerf_workspaces_explorer_tpu.infer.renderer import NeRFRenderer
from nerf_workspaces_explorer_tpu.models import NerfMLPSpec, init_nerf_params
from nerf_workspaces_explorer_tpu.render.proposal import proposal_spec


def main() -> None:
    spec = NerfMLPSpec()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        "proposal": init_nerf_params(k1, proposal_spec()),
        "fine": init_nerf_params(k2, spec),
    }
    for p in params.values():
        p["alpha"]["b"] = p["alpha"]["b"] + 2.0

    init = COORD(x=1.0, y=-0.5, z=0.5, pitch=-90.0)
    for w, h in ((160, 120), (320, 240), (640, 480), (1280, 960)):
        cfg = FrameworkConfig(
            experiment=ExperimentConfig(image_width=w, image_height=h)
        )
        r = NeRFRenderer(
            "office_tokyo", None, config=cfg, precision="int8",
            use_pallas=True, use_proposal=True,
        )
        r.set_params(params)
        pose = poses_from_coordinates(init, [COORD(yaw=-30.0)])[0]
        np.asarray(r.render_pose_uint8(pose))  # compile
        start = time.perf_counter()
        n = 5
        for i in range(n):
            np.asarray(
                r.render_pose_uint8(
                    poses_from_coordinates(init, [COORD(yaw=-30.0 + i)])[0]
                )
            )
        ms = (time.perf_counter() - start) / n * 1000.0
        rays = w * h
        print(
            f"{w}x{h}: {ms:8.1f} ms/frame  ({rays / ms * 1000.0 / 1e6:.2f} "
            f"Mrays/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
