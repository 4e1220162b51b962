"""Frame-time effect of proposal_subsample on the turbo serving preset.

The trained-student stage breakdown (profile_turbo_frame.py, 2026-08-18)
puts the proposal coarse pass at ~27 ms and the fused importance sampler at
~7 ms of the ~86 ms 640x480 device frame. proposal_subsample=s runs both on
an s-strided ray lattice (RenderSettings docs) — ~s^2 less placement work.
This times the end-to-end uint8 turbo frame (bench.py protocol) at strides
1/2/4 on the checked-in trained sidecar.

Run on the TPU, serialized with nothing else:
    python scripts/profile_subsample.py [--width 640 --height 480]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--strides", type=str, default="1,2,4")
    ap.add_argument(
        "--teacher", type=str,
        default=os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", "assets",
            "bench", "synth_proposal.npz",
        ),
    )
    args = ap.parse_args()

    from nerf_workspaces_explorer_tpu.camera.poses import poses_from_coordinates
    from nerf_workspaces_explorer_tpu.core import COORD
    from nerf_workspaces_explorer_tpu.core.config import (
        ExperimentConfig,
        FrameworkConfig,
        RenderingConfig,
    )
    from nerf_workspaces_explorer_tpu.infer.renderer import NeRFRenderer

    print(f"backend: {jax.devices()[0].platform}", flush=True)
    cfg = FrameworkConfig(
        experiment=ExperimentConfig(
            image_width=args.width, image_height=args.height
        ),
        rendering=RenderingConfig(depth_range=(0.1, 6.0)),
    )
    pose = poses_from_coordinates(
        COORD(x=1.0, y=-0.5, z=0.5, pitch=-90.0), [COORD(yaw=-30.0)]
    )[0]

    imgs = {}
    for s in (int(v) for v in args.strides.split(",")):
        r = NeRFRenderer(
            "office_tokyo", args.teacher, config=cfg, precision="int8",
            use_pallas=True, preset="turbo", proposal_subsample=s,
        )
        r.initialize_models()
        np.asarray(r.render_pose_uint8(pose))  # compile
        np.asarray(r.render_pose_uint8(pose))
        start = time.perf_counter()
        n = 5
        for _ in range(n):
            img = np.asarray(r.render_pose_uint8(pose))
        ms = (time.perf_counter() - start) / n * 1000.0
        imgs[s] = img.astype(np.int32)
        extra = ""
        if 1 in imgs and s != 1:
            d = np.abs(imgs[s] - imgs[1])
            extra = (
                f"  |d| vs exact: mean {d.mean():.3f} p99 "
                f"{np.percentile(d, 99):.0f} max {d.max()}"
            )
        print(
            f"turbo {args.width}x{args.height} uint8 frame, "
            f"prop_subsample={s}: {ms:8.1f} ms{extra}",
            flush=True,
        )


if __name__ == "__main__":
    main()
