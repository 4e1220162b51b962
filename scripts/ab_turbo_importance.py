"""Back-to-back same-process A/B of the turbo preset's serving importance
count (48 vs 64) at 640x480 on the trained fixture.

Absolute blocking numbers through the tunnel drift ~2-3 ms day to day
(ROADMAP.md), so serving-config decisions must come from one process with
interleaved timings — this script, not two bench.py runs on different days.

Run on the TPU:  python scripts/ab_turbo_importance.py [--counts 48 64]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--counts", type=int, nargs="+", default=[48, 64])
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=3,
                    help="interleaved timing rounds per count")
    args = ap.parse_args()

    from nerf_workspaces_explorer_tpu.camera.poses import poses_from_coordinates
    from nerf_workspaces_explorer_tpu.core import COORD
    from nerf_workspaces_explorer_tpu.core.config import (
        ExperimentConfig,
        FrameworkConfig,
        RenderingConfig,
    )
    from nerf_workspaces_explorer_tpu.infer.renderer import NeRFRenderer

    fixture = os.path.join(
        os.path.dirname(__file__), "..", "assets", "bench", "synth_proposal.npz"
    )
    config = FrameworkConfig(
        experiment=ExperimentConfig(image_width=640, image_height=480),
        rendering=RenderingConfig(depth_range=(0.1, 6.0)),
    )
    pose = poses_from_coordinates(
        COORD(x=1.0, y=-0.5, z=0.5, pitch=-90.0), [COORD(yaw=-30.0)]
    )[0]

    renderers = {}
    for n in args.counts:
        r = NeRFRenderer(
            "office_tokyo", fixture, config=config, precision="int8",
            use_pallas=True, preset="turbo", n_importance=n,
        )
        r.initialize_models()
        np.asarray(r.render_pose_uint8(pose))  # compile + warm
        renderers[n] = r

    times = {n: [] for n in args.counts}
    for _ in range(args.rounds):
        for n in args.counts:
            r = renderers[n]
            # Drain any queued work, then time by enqueueing all frames and
            # fetching ONE byte at the end (CLAUDE.md timing protocol): the
            # in-order queue makes that fetch wait for every frame, without
            # paying the ~30 ms full-frame tunnel transfer per iteration.
            float(r.render_pose_uint8(pose)[0, 0, 0])
            start = time.perf_counter()
            out = None
            for _ in range(args.frames):
                out = r.render_pose_uint8(pose)
            float(out[0, 0, 0])  # one scalar fetch drains the queue
            times[n].append(
                (time.perf_counter() - start) / args.frames * 1000.0
            )

    for n in args.counts:
        ts = times[n]
        print(f"n_importance={n}: min {min(ts):.2f} ms  "
              f"mean {sum(ts)/len(ts):.2f} ms  rounds {['%.2f' % t for t in ts]}")


if __name__ == "__main__":
    main()
