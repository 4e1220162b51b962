"""Probe turbo student architectures: distill each candidate from the bench
teacher and time the turbo serving path on the TPU.

Motivation (ROADMAP round 3): the default 6x192 student pads 192-wide
matmuls to 2x128 MXU tiles (~33% padded MACs) and pays 6 activation-requant
stages; a 4x256 student is MXU-aligned with 4 stages — potentially faster
AND higher int8 fidelity at similar nominal MACs. The teacher views are
rendered once (distill_student(teacher_rgb=...)) so candidates only pay
their own training + serving compiles.

Run ON THE TPU (serving timings are the point); ~15 min per candidate,
dominated by Pallas AOT compiles at the two serving resolutions:

    python scripts/turbo_arch_probe.py [--steps 6000]
        [--candidates 4x256@10,4x128@8] [--out reports/turbo_arch_probe.md]

Each row reports student PSNR vs its teacher on held-out views (the
validate_quality --turbo gate quantity) and int8 turbo ms/frame at 640x480
and 320x240 (bench.py protocol: warmup then mean of 5 host-fetched frames).
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


def parse_candidates(text):
    out = []
    for tok in text.split(","):
        arch, freqs = tok.strip().split("@")
        d, w = arch.split("x")
        out.append((int(d), int(w), int(freqs)))
    return out


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
    parser.add_argument("--candidates", type=str, default="4x256@10,4x128@8")
    parser.add_argument(
        "--reuse", action="store_true",
        help="skip distillation when a candidate's sidecar already exists "
        "in /tmp/turbo_probe (retime serving only)",
    )
    parser.add_argument(
        "--n-samples", type=int, default=None,
        help="uniform proposal-pass samples the student trains and serves "
        "with (default: teacher's 64)",
    )
    parser.add_argument(
        "--n-importance", type=int, default=64,
        help="importance samples the student serves with",
    )
    parser.add_argument(
        "--out", type=str,
        default=os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", "reports",
            "turbo_arch_probe.md",
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
        render_teacher_views,
        save_turbo_checkpoint,
        turbo_sidecar_path,
    )

    print(f"backend: {jax.devices()[0].platform}", flush=True)
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

    candidates = parse_candidates(args.candidates)
    samp_tag = (
        f"_s{args.n_samples}i{args.n_importance}"
        if (args.n_samples, args.n_importance) != (None, 96) else ""
    )
    need_distill = [
        (d, wd, fq) for d, wd, fq in candidates
        if not (
            args.reuse
            and os.path.exists(
                turbo_sidecar_path(
                    os.path.join(
                        "/tmp/turbo_probe",
                        f"teacher_{d}x{wd}x{fq}{samp_tag}.npz",
                    )
                )
            )
        )
    ]
    teacher_rgb = None
    if need_distill:
        print(f"[teacher] rendering {poses.shape[0]} views once...", flush=True)
        t0 = time.time()
        teacher_rgb = render_teacher_views(
            teacher_params, teacher_spec, teacher_settings, poses, h, w,
            near=near, far=far,
        )
        print(f"[teacher] {time.time() - t0:.0f}s", flush=True)

    workdir = "/tmp/turbo_probe"
    os.makedirs(workdir, exist_ok=True)

    pose = poses_from_coordinates(
        COORD(x=1.0, y=-0.5, z=0.5, pitch=-90.0), [COORD(yaw=-30.0)]
    )[0]
    rows = []
    for depth, width, freqs in candidates:
        name = f"{depth}x{width}@{freqs}f"
        print(f"=== candidate {name} ===", flush=True)
        # One teacher copy per candidate: the renderer derives the sidecar
        # path from the checkpoint path, and persisting every candidate's
        # sidecar lets --reuse retime without redistilling.
        teacher_copy = os.path.join(
            workdir, f"teacher_{depth}x{width}x{freqs}{samp_tag}.npz"
        )
        shutil.copy(TEACHER, teacher_copy)
        sidecar = turbo_sidecar_path(teacher_copy)
        if args.reuse and os.path.exists(sidecar):
            from nerf_workspaces_explorer_tpu.train.distill import (
                read_turbo_metadata,
            )

            report = read_turbo_metadata(sidecar).get("distill_report", {})
            report.setdefault("psnr_vs_teacher", float("nan"))
            report.setdefault("psnr_vs_teacher_min", float("nan"))
            t_distill = 0.0
            print(f"[{name}] reusing {sidecar}", flush=True)
        else:
            t0 = time.time()
            student_params, student_cfg, report = distill_student(
                teacher_params, teacher_spec, teacher_settings, poses,
                height=h, width=w, near=near, far=far, steps=args.steps,
                depth=depth, net_width=width, num_freqs_3d=freqs,
                n_holdout=3, name=f"probe_{depth}x{width}",
                teacher_rgb=teacher_rgb, n_samples=args.n_samples,
            )
            save_turbo_checkpoint(
                sidecar, student_params, student_cfg,
                n_importance_serving=args.n_importance, report=report,
                teacher=teacher_copy,
                step=args.steps,
            )
            t_distill = time.time() - t0

        ms = {}
        for rw, rh in ((640, 480), (320, 240)):
            rcfg = FrameworkConfig(
                experiment=ExperimentConfig(image_width=rw, image_height=rh),
                rendering=RenderingConfig(depth_range=(near, far)),
            )
            r = NeRFRenderer(
                "office_tokyo", teacher_copy, config=rcfg, precision="int8",
                use_pallas=True, preset="turbo",
            )
            r.initialize_models()
            ms[(rw, rh)] = time_renderer(r, pose)
        rows.append(
            (name, report["psnr_vs_teacher"], report["psnr_vs_teacher_min"],
             ms[(640, 480)], ms[(320, 240)], t_distill)
        )
        print(
            f"[{name}] psnr_vs_teacher {report['psnr_vs_teacher']:.2f} "
            f"(min {report['psnr_vs_teacher_min']:.2f}) | 640x480 "
            f"{ms[(640, 480)]:.1f} ms | 320x240 {ms[(320, 240)]:.1f} ms "
            f"| distill {t_distill:.0f}s",
            flush=True,
        )

    with open(args.out, "w") as f:
        f.write(
            "# Turbo student architecture probe\n\n"
            f"Teacher: `assets/bench/synth_proposal.npz` (proposal 2x64 + "
            f"fine 8x256, trained synthetic). Distill {args.steps} steps on "
            f"{poses.shape[0] - 3} teacher views, 3 held out; serving = int8 "
            f"turbo preset (proposal placement at "
            f"{args.n_samples or 64} uniform samples, importance-only "
            f"{args.n_importance} samples), "
            "bench.py timing protocol on one v5e. Baseline from BENCH: "
            "6x192@10f = 212.0 ms @ 640x480, 76.7 ms @ 320x240, "
            "28.95 dB vs teacher (8k-step distill).\n\n"
            "| student | PSNR vs teacher (dB) | min | 640x480 ms | "
            "320x240 ms | distill s |\n|---|---|---|---|---|---|\n"
        )
        for name, p, pmin, m6, m3, td in rows:
            f.write(
                f"| {name} | {p:.2f} | {pmin:.2f} | {m6:.1f} | {m3:.1f} "
                f"| {td:.0f} |\n"
            )
    print(f"report -> {args.out}", flush=True)


if __name__ == "__main__":
    main()
