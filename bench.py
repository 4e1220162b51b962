"""Benchmark: full-frame NeRF render throughput on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Primary metric (per BASELINE.json): ms/frame at 640x480 for the serving
configuration: 8x256 fine MLP at 64 coarse + 128 importance samples/ray
(192 fine samples -> ~5.9M fine ray-samples/frame, identical to the
reference's), with the coarse density pass served by the 2x64 proposal net
(render/proposal.py) and every per-sample matmul in int8 — both
quality-gated by scripts/validate_quality.py --proposal. The reference
publishes no latency numbers (BASELINE.md), so vs_baseline is reported
against the north-star target of 100 ms/frame (BASELINE.json: v4-8);
values > 1.0 beat the target.
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
    # Serving configuration (both legs quality-gated on trained scenes by
    # scripts/validate_quality.py --proposal):
    #  - int8 mode: every per-sample matmul (trunk + heads) runs int8 on
    #    the MXU at 2x bf16 throughput (ops/quantize.py); fused-int8 vs
    #    fp32-jnp SSIM >= 0.99 measured.
    #  - proposal coarse pass: the 2x64 density-only proposal net replaces
    #    the 8x256 coarse network for importance sampling
    #    (render/proposal.py); fine pass unchanged at 64+128=192 samples.
    precision = "int8" if use_pallas else "fast"
    renderer = NeRFRenderer(
        "office_tokyo", None, config=config, precision=precision,
        use_pallas=use_pallas, use_proposal=True,
    )
    # Random params with boosted density so the workload composites real
    # content (pretrained checkpoints are not in this environment).
    from nerf_workspaces_explorer_tpu.render.proposal import proposal_spec

    spec = NerfMLPSpec()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        "proposal": init_nerf_params(k1, proposal_spec()),
        "fine": init_nerf_params(k2, spec),
    }
    for p in params.values():
        p["alpha"]["b"] = p["alpha"]["b"] + 2.0
    renderer.set_params(params)

    pose = poses_from_coordinates(
        COORD(x=1.0, y=-0.5, z=0.5, pitch=-90.0), [COORD(yaw=-30.0)]
    )[0]

    # Time the uint8 product path (what the GUI/CLI consume): quantization
    # happens on device, so each frame crosses the host link once, 1 B/chan.
    for _ in range(WARMUP_FRAMES):
        np.asarray(renderer.render_pose_uint8(pose))

    start = time.perf_counter()
    for _ in range(TIMED_FRAMES):
        np.asarray(renderer.render_pose_uint8(pose))
    elapsed = time.perf_counter() - start

    ms_per_frame = elapsed / TIMED_FRAMES * 1000.0

    # Tour/video throughput: the pipelined stream overlaps device compute
    # with the host download (render_poses_uint8_stream).
    tour = poses_from_coordinates(
        COORD(x=1.0, y=-0.5, z=0.5, pitch=-90.0),
        [COORD(yaw=a) for a in np.linspace(-90.0, 90.0, 8)],
    )
    start = time.perf_counter()
    n_streamed = sum(1 for _ in renderer.render_poses_uint8_stream(tour, lookahead=3))
    ms_per_frame_streamed = (time.perf_counter() - start) / n_streamed * 1000.0
    rays_per_sec = WIDTH * HEIGHT / (elapsed / TIMED_FRAMES)
    n_chips = jax.device_count()

    # Training throughput at the shipped office config (1024 rays/step,
    # 64+128 samples, full 8x256 coarse+fine with backward + Adam).
    train_steps_per_sec = _bench_train_step()
    train_steps_per_sec_fused = _bench_train_step(field_impl="pallas")

    print(
        json.dumps(
            {
                "metric": "ms_per_frame_640x480",
                "value": round(ms_per_frame, 2),
                "unit": "ms",
                "vs_baseline": round(TARGET_MS / ms_per_frame, 4),
                "rays_per_sec_per_chip": round(rays_per_sec / n_chips),
                "ms_per_frame_streamed": round(ms_per_frame_streamed, 2),
                "train_steps_per_sec": round(train_steps_per_sec, 2),
                "train_steps_per_sec_fused": round(train_steps_per_sec_fused, 2),
                "n_chips": n_chips,
                "samples_per_ray": 64 + 128,
                "coarse_net": "proposal-2x64",
                "precision": precision,
                "device": str(jax.devices()[0].device_kind),
            }
        )
    )


def _bench_train_step(n_steps: int = 30, field_impl: str = "xla") -> float:
    import jax.numpy as jnp

    from nerf_workspaces_explorer_tpu.models import NerfMLPSpec
    from nerf_workspaces_explorer_tpu.rays import create_rays
    from nerf_workspaces_explorer_tpu.render import RenderSettings
    from nerf_workspaces_explorer_tpu.train import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    spec = NerfMLPSpec()
    settings = RenderSettings()  # office config
    optimizer = make_optimizer()
    state = init_train_state(jax.random.PRNGKey(0), spec, optimizer)
    poses = jnp.stack([jnp.eye(4)] * 4)
    rays = create_rays(poses, 240, 320, 160.0, 160.0, 159.5, 119.5, 0.1, 10.0)
    rgbs = jax.random.uniform(jax.random.PRNGKey(1), (4, 240 * 320, 3))
    step = make_train_step(settings, spec, optimizer, n_rays=1024, field_impl=field_impl)
    key = jax.random.PRNGKey(2)
    state, metrics = step(state, rays, rgbs, key)  # compile
    float(metrics["total_loss"])
    start = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, rays, rgbs, key)
    float(metrics["total_loss"])
    return n_steps / (time.perf_counter() - start)


if __name__ == "__main__":
    main()
