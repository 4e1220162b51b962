"""Time the strip-pipelined blocking frame vs the plain blocking frame.

The blocking 640x480 turbo frame pays ~26 ms dispatch + ~30 ms uint8 host
fetch through the axon tunnel on top of ~66 ms device time.
`render_pose_uint8_pipelined` renders the frame as row strips enqueued
back to back, overlapping strip k's host download with strip k+1's
compute (the single-frame analog of the streamed tour path).

Run on the TPU: python scripts/profile_pipelined.py [--strips 4,6,8,10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "assets", "bench",
    "synth_proposal.npz",
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--strips", type=str, default="4,6,8,10")
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--frames", type=int, default=5)
    args = ap.parse_args()

    from nerf_workspaces_explorer_tpu.camera.poses import poses_from_coordinates
    from nerf_workspaces_explorer_tpu.core import COORD
    from nerf_workspaces_explorer_tpu.core.config import (
        ExperimentConfig,
        FrameworkConfig,
        RenderingConfig,
    )
    from nerf_workspaces_explorer_tpu.infer.checkpoint import load_checkpoint
    from nerf_workspaces_explorer_tpu.infer.renderer import NeRFRenderer

    print(f"backend: {jax.devices()[0].platform}", flush=True)
    _, _, _, meta = load_checkpoint(FIXTURE)
    cfg = FrameworkConfig(
        experiment=ExperimentConfig(
            image_width=args.width, image_height=args.height
        ),
        rendering=RenderingConfig(
            depth_range=tuple(meta.get("depth_range", (0.1, 6.0)))
        ),
    )
    r = NeRFRenderer(
        "office_tokyo", FIXTURE, config=cfg, precision="int8",
        use_pallas=True, preset="turbo",
    )
    r.initialize_models()
    pose = poses_from_coordinates(
        COORD(x=1.0, y=-0.5, z=0.5, pitch=-90.0), [COORD(yaw=-30.0)]
    )[0]

    def timeit(name, fn):
        for _ in range(2):
            fn()
        t0 = time.perf_counter()
        for _ in range(args.frames):
            fn()
        ms = (time.perf_counter() - t0) / args.frames * 1000.0
        print(f"{name:40s} {ms:8.1f} ms", flush=True)
        return ms

    timeit("blocking render_pose_uint8", lambda: np.asarray(r.render_pose_uint8(pose)))
    base = np.asarray(r.render_pose_uint8(pose))
    for n in (int(v) for v in args.strips.split(",")):
        piped = r.render_pose_uint8_pipelined(pose, n_strips=n)
        same = np.array_equal(piped, base)
        timeit(
            f"pipelined n_strips={n} (identical={same})",
            lambda n=n: r.render_pose_uint8_pipelined(pose, n_strips=n),
        )


if __name__ == "__main__":
    main()
