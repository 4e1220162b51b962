"""Distill a trained office checkpoint into a narrow turbo student.

Dataset-free model compression (train/distill.py): renders the teacher
checkpoint at poses covering the office's reachable view space (the same
calibration a GUI click goes through, reference
application/workspace.py:71-196), trains a narrow proposal-mode student on
those renders, and writes a `.turbo.npz` sidecar next to the teacher.
`NeRFRenderer(preset="turbo")` then serves the student.

The reference has no analog — it always serves the full 19.7M-eval
pipeline (…inference_handler.py:166-277). Quality gate:
scripts/validate_quality.py --turbo.

Usage:
    python -m nerf_workspaces_explorer_tpu.cli.distill --office tokyo \
        [--ckpt path] [--steps 50000] [--width 192 --depth 6 --freqs 10]
"""

from __future__ import annotations

import argparse
import os
import time

OFFICES = ("tokyo", "new_york", "geneve", "belgrade")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--office", type=str, default="tokyo", choices=OFFICES)
    parser.add_argument(
        "--ckpt", type=str, default=None,
        help="teacher checkpoint (.npz or torch .ckpt); default: the "
        "office's shipped final model",
    )
    # Student arch defaults = train.distill.DEFAULT_STUDENT (6x192@10f at
    # a 50k budget): the recipe measured to hold INTERIOR scenes — which
    # is what the shipped offices are. The 4x128@8f orbit-probe winner
    # FAILS the room probe-grid gate (-2.38 dB vs teacher,
    # reports/quality_gate_room_turbo_fix.md); pass
    # `--depth 4 --width 128 --freqs 8` explicitly for the speed student
    # and gate it per scene (validate_quality.py --turbo).
    from nerf_workspaces_explorer_tpu.train.distill import (
        DEFAULT_DISTILL_STEPS,
        DEFAULT_STUDENT,
    )

    parser.add_argument("--steps", type=int, default=DEFAULT_DISTILL_STEPS)
    parser.add_argument("--depth", type=int,
                        default=DEFAULT_STUDENT["depth"])
    parser.add_argument("--width", type=int,
                        default=DEFAULT_STUDENT["width"])
    parser.add_argument("--freqs", type=int,
                        default=DEFAULT_STUDENT["num_freqs_3d"],
                        help="student positional-encoding frequencies")
    parser.add_argument("--grid", type=int, default=4,
                        help="floor-plan lattice per axis for teacher views")
    parser.add_argument("--yaw-step", type=float, default=45.0)
    parser.add_argument("--view-scale", type=int, default=1,
                        help="divide the config H/W by this for teacher views")
    # 48 serving importance samples: 20k-step gate passes at -0.63 dB vs
    # the teacher's merged render, allowed 1.0, and ABOVE the 64-sample
    # gate's PSNR (reports/quality_gate_turbo48_20k.md, _turbo4x128_20k.md);
    # each 96 -> 64 -> 48 step cuts the fine pass proportionally
    # (reports/turbo_sample_probe.md, turbo_arch_probe_48imp.md).
    parser.add_argument("--n-importance-serving", type=int, default=48,
                        help="importance samples the turbo preset serves with")
    # Stride-4 coarse/importance lattice: 20k-step gate passes at -0.00 dB
    # vs exact placement (reports/quality_gate_subsample4_20k.md).
    parser.add_argument("--prop-subsample-serving", type=int, default=4,
                        help="coarse/importance ray-lattice stride the turbo "
                        "preset serves with (gate: validate_quality.py "
                        "--prop-subsample)")
    parser.add_argument("--n-samples", type=int, default=None,
                        help="uniform proposal-pass samples the student "
                        "trains AND serves with (default: the teacher "
                        "config's n_samples)")
    parser.add_argument("--out", type=str, default=None,
                        help="sidecar path (default: <ckpt>.turbo.npz)")
    return parser


def main(argv=None) -> str:
    args = build_parser().parse_args(argv)

    from nerf_workspaces_explorer_tpu.app.workspace import _find_checkpoint
    from nerf_workspaces_explorer_tpu.core.config import load_config
    from nerf_workspaces_explorer_tpu.infer.checkpoint import (
        load_checkpoint,
        load_torch_checkpoint,
    )
    from nerf_workspaces_explorer_tpu.infer.renderer import (
        settings_from_config,
        spec_from_config,
    )
    from nerf_workspaces_explorer_tpu.train.distill import (
        distill_student,
        office_distill_poses,
        save_turbo_checkpoint,
        turbo_sidecar_path,
    )

    ckpt = args.ckpt or _find_checkpoint(args.office)
    if not os.path.exists(ckpt):
        raise RuntimeError(f"teacher checkpoint not found: {ckpt}")
    cfg = load_config(office_name=args.office)
    if ckpt.endswith(".ckpt"):
        coarse, fine, _ = load_torch_checkpoint(ckpt)
        teacher_params = {"coarse": coarse, "fine": fine}
    else:
        teacher_params, _, _, _ = load_checkpoint(ckpt)
    teacher_spec = spec_from_config(cfg)
    teacher_settings = settings_from_config(cfg).for_eval()
    if "proposal" in teacher_params:
        teacher_settings = teacher_settings._replace(use_proposal=True)

    h = cfg.experiment.image_height // args.view_scale
    w = cfg.experiment.image_width // args.view_scale
    near, far = cfg.rendering.depth_range
    poses = office_distill_poses(
        args.office, grid=args.grid, yaw_step_degrees=args.yaw_step
    )
    print(
        f"[distill] office={args.office} teacher={ckpt} "
        f"{poses.shape[0]} views at {w}x{h}, student "
        f"{args.depth}x{args.width} @ {args.freqs} freqs, {args.steps} steps",
        flush=True,
    )
    t0 = time.time()
    student_params, student_cfg, report = distill_student(
        teacher_params, teacher_spec, teacher_settings, poses,
        height=h, width=w, near=near, far=far, steps=args.steps,
        depth=args.depth, net_width=args.width, num_freqs_3d=args.freqs,
        name=f"distill_{args.office}", n_samples=args.n_samples,
    )
    out = args.out or turbo_sidecar_path(ckpt)
    save_turbo_checkpoint(
        out, student_params, student_cfg,
        n_importance_serving=args.n_importance_serving,
        proposal_subsample_serving=args.prop_subsample_serving,
        report=report, teacher=ckpt, step=args.steps,
    )
    print(
        f"[distill] done in {time.time() - t0:.0f}s: psnr_vs_teacher "
        f"{report['psnr_vs_teacher']:.2f} dB -> {out}",
        flush=True,
    )
    return out


if __name__ == "__main__":
    main()
