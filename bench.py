"""Benchmark: full-frame NeRF render throughput on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Primary metric (per BASELINE.json): ms/frame at 640x480 for the shipped
office configuration (8x256 coarse+fine MLP, 64 coarse + 128 importance
samples/ray -> ~5.9M ray-samples/frame). The reference publishes no latency
numbers (BASELINE.md), so vs_baseline is reported against the north-star
target of 100 ms/frame (BASELINE.json: v4-8); values > 1.0 beat the target.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

WIDTH, HEIGHT = 640, 480
TARGET_MS = 100.0
WARMUP_FRAMES = 2
TIMED_FRAMES = 5


def main() -> None:
    from nerf_workspaces_explorer_tpu.camera.poses import poses_from_coordinates
    from nerf_workspaces_explorer_tpu.core import COORD
    from nerf_workspaces_explorer_tpu.core.config import (
        ExperimentConfig,
        FrameworkConfig,
    )
    from nerf_workspaces_explorer_tpu.infer.renderer import NeRFRenderer
    from nerf_workspaces_explorer_tpu.models import NerfMLPSpec, init_nerf_params

    config = FrameworkConfig(
        experiment=ExperimentConfig(image_width=WIDTH, image_height=HEIGHT)
    )
    use_pallas = jax.devices()[0].platform != "cpu"
    renderer = NeRFRenderer(
        "office_tokyo", None, config=config, precision="fast", use_pallas=use_pallas
    )
    # Random params with boosted density so the workload composites real
    # content (pretrained checkpoints are not in this environment).
    spec = NerfMLPSpec()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        "coarse": init_nerf_params(k1, spec),
        "fine": init_nerf_params(k2, spec),
    }
    for p in params.values():
        p["alpha"]["b"] = p["alpha"]["b"] + 2.0
    renderer.set_params(params)

    pose = poses_from_coordinates(
        COORD(x=1.0, y=-0.5, z=0.5, pitch=-90.0), [COORD(yaw=-30.0)]
    )[0]

    for _ in range(WARMUP_FRAMES):
        np.asarray(renderer.render_pose(pose))

    start = time.perf_counter()
    for _ in range(TIMED_FRAMES):
        np.asarray(renderer.render_pose(pose))
    elapsed = time.perf_counter() - start

    ms_per_frame = elapsed / TIMED_FRAMES * 1000.0
    rays_per_sec = WIDTH * HEIGHT / (elapsed / TIMED_FRAMES)
    n_chips = jax.device_count()

    print(
        json.dumps(
            {
                "metric": "ms_per_frame_640x480",
                "value": round(ms_per_frame, 2),
                "unit": "ms",
                "vs_baseline": round(TARGET_MS / ms_per_frame, 4),
                "rays_per_sec_per_chip": round(rays_per_sec / n_chips),
                "n_chips": n_chips,
                "samples_per_ray": 64 + 128,
                "device": str(jax.devices()[0].device_kind),
            }
        )
    )


if __name__ == "__main__":
    main()
