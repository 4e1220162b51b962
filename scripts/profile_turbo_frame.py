"""Stage-level breakdown of the TURBO serving frame on the real TPU.

The e2e turbo frame (6x192 student) measured 212 ms at 640x480 while the
isolated fine kernel floor is 132 ms (eps=0) / 59 ms (eps=1e-3, random
weights) — this attributes the gap on the TRAINED student weights from the
checked-in sidecar: proposal coarse pass, fused importance sampling, fine
pass (eps 0 and 1e-3), whole-frame device time (scalar reduce, no fetch),
and the uint8 frame with the host fetch the product path pays.

Timing protocol per CLAUDE.md: N calls then ONE host scalar fetch to drain
the in-order queue (axon block_until_ready acks enqueue only).

Usage (on the TPU, serialized with nothing else):
    python scripts/profile_turbo_frame.py [--sidecar PATH] [--width 640]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timed(name, fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))  # compile
    start = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    # One scalar fetch drains the in-order queue.
    np.asarray(out).ravel()[:1]
    ms = (time.perf_counter() - start) / n * 1000.0
    print(f"{name:52s} {ms:8.1f} ms", flush=True)
    return ms


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sidecar", type=str,
        default=os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", "assets",
            "bench", "synth_proposal.turbo.npz",
        ),
    )
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    args = ap.parse_args()

    from nerf_workspaces_explorer_tpu.camera.poses import poses_from_coordinates
    from nerf_workspaces_explorer_tpu.core import COORD
    from nerf_workspaces_explorer_tpu.core.config import (
        ExperimentConfig,
        FrameworkConfig,
        RenderingConfig,
    )
    from nerf_workspaces_explorer_tpu.infer.renderer import NeRFRenderer
    from nerf_workspaces_explorer_tpu.ops.pallas_render import (
        _dists_from_z,
        encode_viewdirs_kernel_order,
        nerf_render_pallas,
        prepare_kernel_params,
        ray_phase_vectors,
    )
    from nerf_workspaces_explorer_tpu.ops.pallas_sampling import (
        importance_merge_pallas,
    )
    from nerf_workspaces_explorer_tpu.ops.quantize import calibrate_model_quant
    from nerf_workspaces_explorer_tpu.rays import create_rays
    from nerf_workspaces_explorer_tpu.rays.sampling import coarse_z_vals
    from nerf_workspaces_explorer_tpu.render.proposal import proposal_spec
    from nerf_workspaces_explorer_tpu.train.distill import (
        load_turbo_checkpoint,
        read_turbo_metadata,
        student_spec_from_meta,
    )

    print(f"backend: {jax.devices()[0].platform}", flush=True)
    params, meta = load_turbo_checkpoint(args.sidecar)
    spec, student = student_spec_from_meta(read_turbo_metadata(args.sidecar))
    n_coarse = int(student.get("n_samples", 64))
    n_imp = int(student["n_importance"])
    prop_freqs = int(student.get("proposal_num_freqs", 6))
    near, far = 0.1, 6.0
    print(
        f"student {spec.depth}x{spec.width} input_ch={spec.input_ch} | "
        f"coarse {n_coarse} + importance {n_imp}",
        flush=True,
    )

    h, w = args.height, args.width
    quant = calibrate_model_quant(params, spec)
    kp_p = prepare_kernel_params(
        params["proposal"], proposal_spec(prop_freqs),
        quant=quant.get("proposal"),
    )
    kp_f = prepare_kernel_params(params["fine"], spec, quant=quant["fine"])

    rays = create_rays(
        jnp.eye(4)[None], h, w, 320.0, 320.0, w / 2 - 0.5, h / 2 - 0.5,
        near, far,
    ).reshape(h * w)
    origins = rays.origins.astype(jnp.float32)
    dirs = rays.dirs.astype(jnp.float32)
    nr, fr = rays.near.astype(jnp.float32), rays.far.astype(jnp.float32)
    dir_norm = jnp.linalg.norm(dirs, axis=-1)[None, :]
    venc = encode_viewdirs_kernel_order(
        rays.viewdirs.astype(jnp.float32), num_freqs=kp_f.view_freqs
    )
    o_ph_p, d_ph_p = ray_phase_vectors(origins, dirs, kp_p.pts_freqs)
    o_ph_f, d_ph_f = ray_phase_vectors(origins, dirs, kp_f.pts_freqs)
    z_c = coarse_z_vals(nr, fr, n_coarse).T

    @jax.jit
    def proposal_pass(z):
        wts = nerf_render_pallas(
            kp_p, o_ph_p, d_ph_p, z, _dists_from_z(z, dir_norm),
            density_only=True, early_stop_eps=1e-3,
        )
        return wts

    @jax.jit
    def proposal_sum(z):
        return proposal_pass(z).sum()

    @jax.jit
    def importance(wts, z):
        return importance_merge_pallas(wts, z, n_imp, ray_tile=256, merge=False)

    @jax.jit
    def importance_sum(wts, z):
        return importance(wts, z).sum()

    def fine_fn(eps):
        def run(z):
            maps = nerf_render_pallas(
                kp_f, o_ph_f, d_ph_f, z, _dists_from_z(z, dir_norm), venc,
                early_stop_eps=eps,
            )
            return maps.sum()

        return jax.jit(run)

    wts = jax.block_until_ready(proposal_pass(z_c))
    z_fine = jax.block_until_ready(importance(wts, z_c))

    timed("proposal coarse density (int8)", proposal_sum, z_c)
    timed("importance+merge pallas", importance_sum, wts, z_c)
    timed(f"fine {n_imp}s trained eps=0", fine_fn(0.0), z_fine)
    timed(f"fine {n_imp}s trained eps=1e-3", fine_fn(1e-3), z_fine)

    # Whole-frame device time via the real renderer body, reduced in-jit.
    cfg = FrameworkConfig(
        experiment=ExperimentConfig(image_width=w, image_height=h),
        rendering=RenderingConfig(depth_range=(near, far)),
    )
    teacher = args.sidecar.replace(".turbo.npz", ".npz")
    r = NeRFRenderer(
        "office_tokyo", teacher, config=cfg, precision="int8",
        use_pallas=True, preset="turbo",
    )
    r.initialize_models()
    pose = poses_from_coordinates(
        COORD(x=1.0, y=-0.5, z=0.5, pitch=-90.0), [COORD(yaw=-30.0)]
    )[0]
    body = r._frozen_batch_body()
    pose_j = jnp.asarray(pose, dtype=jnp.float32)

    @jax.jit
    def frame_device(p, c2w):
        return body(p, c2w[None]).sum()

    timed("whole frame device (scalar reduce)", frame_device, r._params, pose_j)

    # Product path: uint8 frame + host fetch (what bench.py times).
    def frame_fetch(c2w):
        return np.asarray(r.render_pose_uint8(c2w))

    frame_fetch(pose)
    start = time.perf_counter()
    for _ in range(5):
        frame_fetch(pose)
    print(
        f"{'uint8 frame + host fetch (bench protocol)':52s} "
        f"{(time.perf_counter() - start) / 5 * 1000.0:8.1f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
