"""Probe turbo sample-count reduction: uniform proposal-pass samples
(64 -> 48) and serving importance samples (96 -> 64) on the default
4x128@8f student.

Motivation (reports/turbo_arch_probe.md): the turbo frame's device time
splits ~25 ms proposal coarse + ~8 ms importance + ~85 ms fine at
640x480, so both sample counts are first-class work-reduction levers.
A student distilled at `n_samples` trains its proposal net on exactly
the uniform count it serves with; the fine net is shared across serving
importance counts (n_importance_serving is sidecar metadata only), so
each n_samples value distills once and every (n_samples, n_importance)
cell re-times serving and re-scores held-out fidelity at ITS OWN
serving placement.

Run ON THE TPU (timings are the point); each grid cell pays a Pallas
serving compile at 640x480:

    python scripts/turbo_sample_probe.py [--steps 6000]
        [--grid 64:96,48:96,64:64,48:64]
        [--out reports/turbo_sample_probe.md]
"""

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

TEACHER = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "assets", "bench",
    "synth_proposal.npz",
)


def time_renderer(renderer, pose, frames=5):
    for _ in range(2):
        np.asarray(renderer.render_pose_uint8(pose))
    t0 = time.perf_counter()
    for _ in range(frames):
        np.asarray(renderer.render_pose_uint8(pose))
    return (time.perf_counter() - t0) / frames * 1000.0


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--steps", type=int, default=6000)
    parser.add_argument("--grid", type=str, default="64:96,48:96,64:64,48:64",
                        help="comma list of n_samples:n_importance cells")
    parser.add_argument("--depth", type=int, default=4)
    parser.add_argument("--width", type=int, default=128)
    parser.add_argument("--freqs", type=int, default=8)
    parser.add_argument(
        "--out", type=str,
        default=os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", "reports",
            "turbo_sample_probe.md",
        ),
    )
    args = parser.parse_args()

    import jax

    from nerf_workspaces_explorer_tpu.camera.poses import poses_from_coordinates
    from nerf_workspaces_explorer_tpu.core import COORD
    from nerf_workspaces_explorer_tpu.core.config import (
        ExperimentConfig,
        FrameworkConfig,
        RenderingConfig,
    )
    from nerf_workspaces_explorer_tpu.data import make_synthetic_scene
    from nerf_workspaces_explorer_tpu.infer.checkpoint import load_checkpoint
    from nerf_workspaces_explorer_tpu.infer.renderer import (
        NeRFRenderer,
        settings_from_config,
        spec_from_config,
    )
    from nerf_workspaces_explorer_tpu.train.distill import (
        distill_student,
        render_student_views,
        render_teacher_views,
        save_turbo_checkpoint,
        turbo_sidecar_path,
    )

    print(f"backend: {jax.devices()[0].platform}", flush=True)
    cells = []
    for tok in args.grid.split(","):
        ns, ni = tok.strip().split(":")
        cells.append((int(ns), int(ni)))

    teacher_params, _, _, meta = load_checkpoint(TEACHER)
    near, far = tuple(meta.get("depth_range", (0.1, 6.0)))
    h, w = 96, 128
    cfg = FrameworkConfig(
        experiment=ExperimentConfig(image_width=w, image_height=h),
        rendering=RenderingConfig(depth_range=(near, far)),
    )
    teacher_spec = spec_from_config(cfg)
    teacher_settings = settings_from_config(cfg).for_eval()._replace(
        use_proposal=True
    )
    train, test, _ = make_synthetic_scene(n_train=12, n_test=3, height=h, width=w)
    poses = np.concatenate([train.camera_pose, test.camera_pose], axis=0)
    n_holdout = 3

    print(f"[teacher] rendering {poses.shape[0]} views once...", flush=True)
    t0 = time.time()
    teacher_rgb = render_teacher_views(
        teacher_params, teacher_spec, teacher_settings, poses, h, w,
        near=near, far=far,
    )
    print(f"[teacher] {time.time() - t0:.0f}s", flush=True)

    workdir = "/tmp/turbo_sample_probe"
    os.makedirs(workdir, exist_ok=True)
    pose = poses_from_coordinates(
        COORD(x=1.0, y=-0.5, z=0.5, pitch=-90.0), [COORD(yaw=-30.0)]
    )[0]

    students = {}  # n_samples -> (params, cfg, spec)
    rows = []
    for ns, ni in cells:
        name = f"s{ns}i{ni}"
        if ns not in students:
            t0 = time.time()
            sp, sc, _ = distill_student(
                teacher_params, teacher_spec, teacher_settings, poses,
                height=h, width=w, near=near, far=far, steps=args.steps,
                depth=args.depth, net_width=args.width,
                num_freqs_3d=args.freqs, n_holdout=n_holdout,
                name=f"probe_s{ns}", teacher_rgb=teacher_rgb, n_samples=ns,
            )
            print(f"[s{ns}] distilled in {time.time() - t0:.0f}s", flush=True)
            students[ns] = (sp, sc)
        sp, sc = students[ns]

        # Held-out fidelity at THIS serving placement (proposal pass at ns
        # uniform depths, importance-only fine pass at ni samples).
        serve_settings = settings_from_config(sc, train=False).for_eval()._replace(
            use_proposal=True, merge_coarse=False,
            n_samples=ns, n_importance=ni,
        )
        student_rgb = render_student_views(
            sp, spec_from_config(sc), serve_settings, poses[-n_holdout:],
            h, w, near=near, far=far,
        )
        mses = np.mean(
            (student_rgb - teacher_rgb[-n_holdout:]) ** 2, axis=(1, 2, 3)
        )
        psnrs = -10.0 * np.log10(np.maximum(mses, 1e-12))

        teacher_copy = os.path.join(workdir, f"teacher_{name}.npz")
        shutil.copy(TEACHER, teacher_copy)
        save_turbo_checkpoint(
            turbo_sidecar_path(teacher_copy), sp, sc,
            n_importance_serving=ni,
            report={"psnr_vs_teacher": float(np.mean(psnrs))},
            teacher=teacher_copy, step=args.steps,
        )
        rcfg = FrameworkConfig(
            experiment=ExperimentConfig(image_width=640, image_height=480),
            rendering=RenderingConfig(depth_range=(near, far)),
        )
        r = NeRFRenderer(
            "office_tokyo", teacher_copy, config=rcfg, precision="int8",
            use_pallas=True, preset="turbo",
        )
        r.initialize_models()
        ms = time_renderer(r, pose)
        rows.append((name, ns, ni, float(np.mean(psnrs)), float(np.min(psnrs)), ms))
        print(
            f"[{name}] psnr_vs_teacher {np.mean(psnrs):.2f} "
            f"(min {np.min(psnrs):.2f}) | 640x480 {ms:.1f} ms",
            flush=True,
        )

    with open(args.out, "w") as f:
        f.write(
            "# Turbo sample-count probe\n\n"
            f"Student {args.depth}x{args.width}@{args.freqs}f distilled "
            f"{args.steps} steps per n_samples value from "
            "`assets/bench/synth_proposal.npz`; PSNR vs teacher on 3 "
            "held-out views at each cell's OWN serving placement; int8 "
            "turbo serving, bench.py timing protocol, one v5e at "
            "640x480.\n\n"
            "| n_samples | n_importance | PSNR vs teacher | min | ms |\n"
            "|---|---|---|---|---|\n"
        )
        for name, ns, ni, p, pmin, ms in rows:
            f.write(f"| {ns} | {ni} | {p:.2f} | {pmin:.2f} | {ms:.1f} |\n")
    print(f"report -> {args.out}", flush=True)


if __name__ == "__main__":
    main()
