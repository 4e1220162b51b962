"""Train the bench.py weight fixtures on the synthetic scene.

Round-2 VERDICT: the benchmark rendered RANDOM-init weights (density
everywhere), so early-termination behavior and int8 calibration statistics
were not those of a trained scene with free space. This script trains two
small checkpoints on a synthetic scene and saves them as repo fixtures
(`synth_*` for the legacy orbit scene; `room_*` with --scene room — the
interior fixture bench.py PREFERS when present, since the product renders
Replica interiors):

  assets/bench/<scene>_proposal.npz — proposal(2x64) + fine(8x256), the
                                     serving configuration bench.py times;
  assets/bench/<scene>_hier.npz     — coarse+fine 8x256 (reference placement);
  assets/bench/<scene>_proposal.turbo.npz — narrow student (default
                                     6x192@10f, train/distill.py
                                     DEFAULT_STUDENT) distilled from the
                                     proposal fixture, the turbo preset
                                     bench.py times when present.

The teachers train at the shipped office model config (8x256, 64+128
samples, 1024 rays/step) on the 96x128 synthetic scene; bench.py renders
them at 640x480 with the scene's depth range (0.1, 6.0). Run on the TPU:

  python scripts/make_bench_fixture.py [--steps 3000] [--skip-teachers]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "..", "assets", "bench")


def build_scene(scene_kind, h, w):
    """(train, test, depth_range, scene_tag) for either synthetic scene."""
    if scene_kind == "room":
        from nerf_workspaces_explorer_tpu.data.synthetic import (
            make_room_scene_splits,
        )

        near, far = 0.1, 8.0
        train, test, _ = make_room_scene_splits(
            height=h, width=w, near=near, far=far,
            cache_dir="/tmp/room_scene_cache",
        )
        return train, test, (near, far), f"room-{h}x{w}"
    from nerf_workspaces_explorer_tpu.data import make_synthetic_scene

    train, test, _ = make_synthetic_scene(n_train=12, n_test=3, height=h, width=w)
    return train, test, (0.1, 6.0), f"synthetic-{h}x{w}"


def train_one(name, use_proposal, steps, out_dir, scene_kind="orbit"):
    from nerf_workspaces_explorer_tpu.core.config import (
        ExperimentConfig,
        FrameworkConfig,
        LoggingConfig,
        RenderingConfig,
    )
    from nerf_workspaces_explorer_tpu.infer.checkpoint import save_checkpoint
    from nerf_workspaces_explorer_tpu.train import Trainer

    h, w = 96, 128
    train, test, depth_range, scene_tag = build_scene(scene_kind, h, w)
    cfg = FrameworkConfig(
        experiment=ExperimentConfig(image_width=w, image_height=h),
        rendering=RenderingConfig(depth_range=depth_range),
        logging=LoggingConfig(
            step_log_print=0,
            step_log_tensorboard=2**31 - 1,
            step_save_ckpt=0,
            step_render_test=0,
            step_render_train=0,
        ),
    )
    trainer = Trainer(
        f"bench_fixture_{name}",
        cfg,
        train_data=train,
        test_data=test,
        save_dir=os.path.join("/tmp/bench_fixture", name),
        enable_tensorboard=False,
        use_proposal=use_proposal,
    )
    trainer.setup()
    for i in range(steps):
        metrics = trainer.step(i)
        if i % 500 == 0:
            print(
                f"[{name}] step {i}: loss {float(metrics['total_loss']):.5f} "
                f"psnr_fine {float(metrics['psnr_fine']):.2f}",
                flush=True,
            )
    prefix = "room" if scene_kind == "room" else "synth"
    path = os.path.join(out_dir, f"{prefix}_{name}.npz")
    save_checkpoint(
        path,
        trainer.params,
        step=steps,
        metadata={
            "scene": scene_tag,
            "depth_range": list(depth_range),
            "use_proposal": bool(use_proposal),
        },
    )
    size_mb = os.path.getsize(path) / 1e6
    print(f"[{name}] saved {path} ({size_mb:.1f} MB)")


def distill_turbo(steps, out_dir, *, depth, width, freqs,
                  n_importance_serving=48, n_samples=None,
                  proposal_subsample_serving=4, scene_kind="orbit"):
    """Distill the proposal teacher fixture into the turbo sidecar
    bench.py times (NeRFRenderer preset='turbo')."""
    from nerf_workspaces_explorer_tpu.core.config import (
        ExperimentConfig,
        FrameworkConfig,
        RenderingConfig,
    )
    from nerf_workspaces_explorer_tpu.infer.checkpoint import load_checkpoint
    from nerf_workspaces_explorer_tpu.infer.renderer import (
        settings_from_config,
        spec_from_config,
    )
    from nerf_workspaces_explorer_tpu.train.distill import (
        distill_student,
        save_turbo_checkpoint,
        turbo_sidecar_path,
    )

    prefix = "room" if scene_kind == "room" else "synth"
    teacher_path = os.path.join(out_dir, f"{prefix}_proposal.npz")
    teacher_params, _, _, _ = load_checkpoint(teacher_path)
    h, w = 96, 128
    train, test, depth_range, _ = build_scene(scene_kind, h, w)
    cfg = FrameworkConfig(
        experiment=ExperimentConfig(image_width=w, image_height=h),
        rendering=RenderingConfig(depth_range=depth_range),
    )
    if scene_kind == "room":
        # Distill on the walkthrough tour PLUS the off-tour coverage grid
        # (tour-only distillation collapses off-tour on interiors:
        # reports/quality_gate_room_20k.md); hold out the probe grid
        # entirely (the hardened gate geometry,
        # validate_quality.py --scene room).
        from nerf_workspaces_explorer_tpu.data.synthetic import (
            room_coverage_poses,
            room_grid_poses,
            room_scene,
        )

        half = np.asarray(room_scene().half)
        grid = room_grid_poses(half=half)
        poses = np.concatenate(
            [train.camera_pose, room_coverage_poses(half), grid], axis=0
        )
        n_holdout = len(grid)
    else:
        poses = np.concatenate([train.camera_pose, test.camera_pose], axis=0)
        n_holdout = 3
    near, far = depth_range
    student_params, student_cfg, report = distill_student(
        teacher_params,
        spec_from_config(cfg),
        settings_from_config(cfg).for_eval()._replace(use_proposal=True),
        poses,
        height=h, width=w, near=near, far=far, steps=steps,
        depth=depth, net_width=width, num_freqs_3d=freqs,
        n_holdout=n_holdout, name="bench_turbo", n_samples=n_samples,
    )
    sidecar = turbo_sidecar_path(teacher_path)
    save_turbo_checkpoint(
        sidecar, student_params, student_cfg,
        n_importance_serving=n_importance_serving,
        proposal_subsample_serving=proposal_subsample_serving,
        report=report, teacher=teacher_path, step=steps,
    )
    print(
        f"[turbo] saved {sidecar} ({os.path.getsize(sidecar) / 1e6:.1f} MB), "
        f"psnr_vs_teacher {report['psnr_vs_teacher']:.2f} dB"
    )


def build_parser():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--out", type=str, default=FIXTURE_DIR)
    parser.add_argument(
        "--skip-teachers", action="store_true",
        help="only distill the turbo sidecar from the existing proposal "
        "fixture",
    )
    # Student defaults = train.distill.DEFAULT_STUDENT / _DISTILL_STEPS
    # (interior-robust 6x192@10f @ 50k; 4x128@8f FAILS interiors —
    # reports/quality_gate_room_turbo_fix.md).
    from nerf_workspaces_explorer_tpu.train.distill import (
        DEFAULT_DISTILL_STEPS,
        DEFAULT_STUDENT,
    )

    parser.add_argument("--turbo-steps", type=int,
                        default=DEFAULT_DISTILL_STEPS,
                        help="distillation steps")
    parser.add_argument("--turbo-depth", type=int,
                        default=DEFAULT_STUDENT["depth"])
    parser.add_argument("--turbo-width", type=int,
                        default=DEFAULT_STUDENT["width"])
    parser.add_argument("--turbo-freqs", type=int,
                        default=DEFAULT_STUDENT["num_freqs_3d"])
    parser.add_argument("--turbo-n-samples", type=int, default=None,
                        help="uniform proposal-pass samples the student "
                        "trains and serves with")
    parser.add_argument("--turbo-n-importance", type=int, default=48,
                        help="importance samples the turbo preset serves")
    parser.add_argument("--turbo-prop-subsample", type=int, default=4,
                        help="coarse/importance ray-lattice stride the "
                        "turbo preset serves with (stride 4 gated at "
                        "-0.00 dB, reports/quality_gate_subsample4_20k.md)")
    parser.add_argument("--scene", choices=("orbit", "room"), default="orbit",
                        help="training scene: orbit (legacy 12-view blob "
                        "orbit) or room (reference-scale interior "
                        "walkthrough, data/synthetic.py RoomScene)")
    return parser


def main():
    args = build_parser().parse_args()
    out = os.path.abspath(args.out)
    os.makedirs(out, exist_ok=True)
    if not args.skip_teachers:
        train_one("proposal", True, args.steps, out, scene_kind=args.scene)
        train_one("hier", False, args.steps, out, scene_kind=args.scene)
    distill_turbo(
        args.turbo_steps, out,
        depth=args.turbo_depth, width=args.turbo_width,
        freqs=args.turbo_freqs, n_samples=args.turbo_n_samples,
        n_importance_serving=args.turbo_n_importance,
        proposal_subsample_serving=args.turbo_prop_subsample,
        scene_kind=args.scene,
    )


if __name__ == "__main__":
    main()
