"""End-to-end quality validation: train -> render -> PSNR/SSIM.

Trains a NeRF on a synthetic scene at the shipped office configuration
(8x256 coarse+fine, 64+128 samples, 1024 rays/step), renders held-out test
views with the fused Pallas kernel, and reports:
  - test PSNR/SSIM vs ground truth (training quality),
  - SSIM between the fused-kernel render and the jnp reference pipeline on
    the same trained weights (the BASELINE.md >= 99% SSIM fidelity target),
  - the same two checks for the int8 serving mode (trunk + heads).

With --proposal a second model trains in proposal mode (2x64 density net
guiding importance sampling, render/proposal.py) and must hold the same
fidelity bars PLUS test PSNR within --max-psnr-drop of the hierarchical
run — the gate that justifies serving/benchmarking with the proposal
coarse pass.

With --turbo the gated leg's trained model is additionally distilled into a
narrow student (train/distill.py — the `preset="turbo"` serving path) which
must hold test-vs-ground-truth PSNR within --max-turbo-psnr-drop of its
teacher's merged render.

Run on the TPU:  python scripts/validate_quality.py [--steps 3000] [--proposal]
(Reference quality context: the reference reaches 23-39 dB test PSNR on the
four Replica offices after 200k steps — BASELINE.md.)

This script is a GATE: it exits nonzero when any threshold fails.
Measured on the v5e (3000 steps, 96x128 synthetic scene, 2026-08-16):
test PSNR ~27-29 dB, fused-vs-jnp SSIM > 0.999; thresholds sit below the
observed run-to-run spread.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run_leg(name, use_proposal, train, test, cfg, args):
    """Train one model and measure quality + fused/int8 fidelity."""
    from nerf_workspaces_explorer_tpu.ops.pallas_render import render_rays_fused
    from nerf_workspaces_explorer_tpu.ops.quantize import calibrate_model_quant
    from nerf_workspaces_explorer_tpu.rays.raygen import RayBundle
    from nerf_workspaces_explorer_tpu.render import render_rays_chunked
    from nerf_workspaces_explorer_tpu.train import Trainer
    from nerf_workspaces_explorer_tpu.utils.metrics import ssim, to8b

    h, w = args.height, args.width
    trainer = Trainer(
        f"office_synth_validation_{name}",
        cfg,
        train_data=train,
        test_data=test,
        save_dir=os.path.join(args.out, f"run_{name}"),
        enable_tensorboard=False,
        use_proposal=use_proposal,
    )
    trainer.setup()

    start = time.time()
    for i in range(args.steps):
        metrics = trainer.step(i)
        if i % 500 == 0:
            print(
                f"[{name}] step {i}: loss {float(metrics['total_loss']):.5f} "
                f"psnr_fine {float(metrics['psnr_fine']):.2f}",
                flush=True,
            )
    train_time = time.time() - start
    print(f"[{name}] trained {args.steps} steps in {train_time:.0f}s "
          f"({args.steps / train_time:.1f} steps/s)")

    eval_settings = trainer._settings.for_eval()
    psnrs, ssims = [], []
    rgb = gt = image_rays = None
    for i in range(len(test)):
        image_rays = RayBundle(*(f[i] for f in trainer.rays_test))
        rgb = np.asarray(
            render_rays_fused(
                trainer.params, image_rays, eval_settings, spec=trainer._spec
            )
        ).reshape(h, w, 3)
        gt = test.rgb[i]
        mse = float(np.mean((rgb - gt) ** 2))
        psnrs.append(-10 * np.log10(mse))
        ssims.append(ssim(rgb, gt))
    psnr = float(np.mean(psnrs))
    print(f"[{name}] TEST fused-kernel renders ({len(test)} views): "
          f"PSNR {psnr:.2f} dB (min {np.min(psnrs):.2f}), "
          f"SSIM {np.mean(ssims):.4f} (min {np.min(ssims):.4f})")

    try:
        import imageio

        imageio.imwrite(os.path.join(args.out, f"render_{name}.png"), to8b(rgb))
        imageio.imwrite(os.path.join(args.out, "ground_truth.png"), to8b(gt))
    except ImportError:
        pass

    out = render_rays_chunked(
        trainer.params, image_rays, eval_settings, spec=trainer._spec, chunk=4096
    )
    rgb_jnp = np.asarray(out["rgb_fine"]).reshape(h, w, 3)
    fidelity = ssim(rgb, rgb_jnp)
    print(f"[{name}] fused vs jnp pipeline on trained weights: "
          f"max|err| {np.abs(rgb - rgb_jnp).max():.2e}, SSIM {fidelity:.5f} "
          f"(target >= {args.min_fidelity})")

    # int8 serving mode (the benchmarked configuration, bench.py): the
    # quantized trunk+heads must hold the same fidelity bar vs fp32.
    quant = calibrate_model_quant(trainer.params, trainer._spec, box=6.0)
    rgb_int8 = np.asarray(
        render_rays_fused(
            trainer.params, image_rays, eval_settings, spec=trainer._spec,
            quant=quant,
        )
    ).reshape(h, w, 3)
    fidelity_int8 = ssim(rgb_int8, rgb_jnp)
    print(f"[{name}] int8 fused vs jnp pipeline on trained weights: "
          f"max|err| {np.abs(rgb_int8 - rgb_jnp).max():.2e}, "
          f"SSIM {fidelity_int8:.5f} (target >= {args.min_fidelity})")

    # Fast serving preset (round 3): importance-only fine pass at reduced
    # sample counts, measured over ALL test views (the sample-placement
    # change is scene-wide, not per-view). Gated in main() on the PSNR
    # drop vs this leg's own reference-placement renders.
    fast = {}
    if args.fast_preset:
        for n_imp in args.fast_n_importance:
            fs = eval_settings._replace(merge_coarse=False, n_importance=n_imp)
            variants = [("", fs)]
            if args.prop_subsample > 1:
                # Same serving config with the coarse/importance stage on
                # the strided ray lattice (RenderSettings.proposal_subsample).
                variants.append(
                    ("_sub", fs._replace(proposal_subsample=args.prop_subsample))
                )
            fast[n_imp] = {}
            for suffix, vs in variants:
                f_psnrs, f_ssims = [], []
                for i in range(len(test)):
                    view_rays = RayBundle(*(f[i] for f in trainer.rays_test))
                    rgb_fast = np.asarray(
                        render_rays_fused(
                            trainer.params, view_rays, vs, spec=trainer._spec,
                            quant=quant, grid_hw=(h, w),
                        )
                    ).reshape(h, w, 3)
                    mse = float(np.mean((rgb_fast - test.rgb[i]) ** 2))
                    f_psnrs.append(-10 * np.log10(mse))
                    f_ssims.append(ssim(rgb_fast, test.rgb[i]))
                fast[n_imp]["psnr" + suffix] = float(np.mean(f_psnrs))
                fast[n_imp]["ssim" + suffix] = float(np.mean(f_ssims))
                tag = (
                    f", prop_subsample={args.prop_subsample}" if suffix else ""
                )
                print(
                    f"[{name}] FAST preset (importance-only, int8, "
                    f"n_importance={n_imp}{tag}): PSNR "
                    f"{fast[n_imp]['psnr' + suffix]:.2f} dB "
                    f"(merged {psnr:.2f}), SSIM "
                    f"{fast[n_imp]['ssim' + suffix]:.4f}"
                )
    return {
        "psnr": psnr,
        "psnr_min": float(np.min(psnrs)),
        "ssim": float(np.mean(ssims)),
        "ssim_min": float(np.min(ssims)),
        "fidelity": fidelity,
        "fidelity_int8": fidelity_int8,
        "fast": fast,
        "trainer": trainer,
    }


def run_turbo_leg(leg, leg_name, train, test, args, scene_ctx):
    """Distill the leg's trained model into a narrow turbo student and
    measure it against REAL ground truth at the serving configuration.

    Gate views (round-3 VERDICT item 5): with --scene room the student is
    judged on the held-out probe GRID (positions x rotated headings over
    the floor extent, deliberately off the distillation tour) with per-view
    minima, and the TEACHER renders the same views so teacher >= student
    ordering is checked — a gate that cannot rank teacher above student
    cannot detect student degradation. With --scene orbit the legacy
    held-out test views are used."""
    from nerf_workspaces_explorer_tpu.infer.renderer import settings_from_config
    from nerf_workspaces_explorer_tpu.models.encoding import embedding_output_dim
    from nerf_workspaces_explorer_tpu.models.mlp import NerfMLPSpec
    from nerf_workspaces_explorer_tpu.train.distill import (
        distill_student,
        render_student_views,
        render_teacher_views,
    )
    from nerf_workspaces_explorer_tpu.utils.metrics import ssim

    tr = leg["trainer"]
    h, w = args.height, args.width
    near, far = scene_ctx["near"], scene_ctx["far"]
    if scene_ctx.get("grid_poses") is not None:
        # Room scene: distill on the walkthrough tour PLUS an off-tour
        # coverage grid (4x4 positions x 45-degree-offset yaws x two
        # heights — disjoint from the 3x3/axis-aligned gate grid by
        # construction); hold out the probe grid entirely (the student
        # never trains on a gate view). Tour-only distillation collapses
        # off-tour on interiors (18.84 vs teacher 27.84 dB, measured —
        # reports/quality_gate_room_20k.md); coverage + a 50k budget +
        # a 6x192@10f student passes at +0.64 dB
        # (reports/quality_gate_room_turbo_fix_6x192_50k.md).
        from nerf_workspaces_explorer_tpu.data.synthetic import (
            room_coverage_poses,
        )

        cover = room_coverage_poses(scene_ctx["half"])
        gate_poses = scene_ctx["grid_poses"]
        gate_gt = scene_ctx["grid_gt"]
        poses = np.concatenate(
            [train.camera_pose, cover, gate_poses], axis=0
        )
        gate_tag = f"probe grid ({len(gate_poses)} views)"
    else:
        # Orbit scene (legacy): train poses + extra rings; test views held
        # out and used as the gate views.
        from nerf_workspaces_explorer_tpu.data.synthetic import orbit_poses

        extra = np.concatenate([
            orbit_poses(10, radius=2.3, height=0.3),
            orbit_poses(10, radius=2.6, height=0.55),
            orbit_poses(10, radius=2.45, height=0.75),
        ], axis=0)
        gate_poses = test.camera_pose
        gate_gt = test.rgb
        poses = np.concatenate(
            [train.camera_pose, extra, test.camera_pose], axis=0
        )
        gate_tag = f"test views ({len(gate_poses)})"
    student_params, student_cfg, dreport = distill_student(
        tr.params, tr._spec, tr._settings, poses,
        height=h, width=w, near=near, far=far,
        steps=args.turbo_steps, depth=args.turbo_depth,
        net_width=args.turbo_width, num_freqs_3d=args.turbo_freqs,
        n_holdout=len(gate_poses), name=f"turbo_{leg_name}",
        n_samples=args.turbo_n_samples,
    )
    print(
        f"[turbo] student {args.turbo_depth}x{args.turbo_width} @ "
        f"{args.turbo_freqs} freqs distilled from [{leg_name}] in "
        f"{args.turbo_steps} steps: PSNR vs teacher "
        f"{dreport['psnr_vs_teacher']:.2f} dB on held-out views"
    )
    spec = NerfMLPSpec(
        depth=args.turbo_depth,
        width=args.turbo_width,
        input_ch=embedding_output_dim(args.turbo_freqs),
        input_ch_views=embedding_output_dim(student_cfg.rendering.num_freqs_2d),
        use_view_dirs=True,
    )
    settings = settings_from_config(student_cfg).for_eval()._replace(
        use_proposal=True, merge_coarse=False,
        n_importance=args.turbo_n_importance,
    )

    def stats(frames):
        psnrs = np.array([
            -10 * np.log10(float(np.mean((frames[i] - gate_gt[i]) ** 2)))
            for i in range(len(gate_poses))
        ])
        ssims = np.array(
            [ssim(frames[i], gate_gt[i]) for i in range(len(gate_poses))]
        )
        return psnrs, ssims

    rgb = render_student_views(
        student_params, spec, settings, gate_poses, h, w, near=near, far=far,
    )
    psnrs, ssims = stats(rgb)
    # Teacher renders of the SAME gate views (merged placement — the
    # teacher's own serving quality) for the ordering check.
    teacher_rgb = render_teacher_views(
        tr.params, tr._spec, tr._settings, gate_poses, h, w,
        near=near, far=far,
    )
    t_psnrs, t_ssims = stats(teacher_rgb)
    out = {
        "psnr": float(np.mean(psnrs)),
        "psnr_min": float(np.min(psnrs)),
        "ssim": float(np.mean(ssims)),
        "ssim_min": float(np.min(ssims)),
        "teacher_psnr": float(np.mean(t_psnrs)),
        "teacher_psnr_min": float(np.min(t_psnrs)),
        "teacher_ssim": float(np.mean(t_ssims)),
        "teacher_ssim_min": float(np.min(t_ssims)),
        "psnr_vs_teacher": float(dreport["psnr_vs_teacher"]),
        "gate_tag": gate_tag,
    }
    print(
        f"[turbo] {gate_tag} vs ground truth (serving config, "
        f"n_importance={args.turbo_n_importance}): student PSNR "
        f"{out['psnr']:.2f} dB (min {out['psnr_min']:.2f}), SSIM "
        f"{out['ssim']:.4f} (min {out['ssim_min']:.4f}); teacher PSNR "
        f"{out['teacher_psnr']:.2f} dB (min {out['teacher_psnr_min']:.2f})"
    )
    if args.prop_subsample > 1:
        rgb_sub = render_student_views(
            student_params, spec,
            settings._replace(proposal_subsample=args.prop_subsample),
            gate_poses, h, w, near=near, far=far,
        )
        s_psnrs, s_ssims = stats(rgb_sub)
        out["psnr_sub"] = float(np.mean(s_psnrs))
        out["psnr_sub_min"] = float(np.min(s_psnrs))
        out["ssim_sub"] = float(np.mean(s_ssims))
        print(
            f"[turbo] {gate_tag} vs ground truth (serving config, "
            f"prop_subsample={args.prop_subsample}): PSNR "
            f"{out['psnr_sub']:.2f} dB (exact placement {out['psnr']:.2f}), "
            f"SSIM {out['ssim_sub']:.4f}"
        )
    return out


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--height", type=int, default=96)
    parser.add_argument("--width", type=int, default=128)
    parser.add_argument("--out", type=str, default="/tmp/validate_quality")
    parser.add_argument(
        "--min-psnr", type=float, default=24.0,
        help="fail below this mean test PSNR (dB)",
    )
    parser.add_argument(
        "--min-fidelity", type=float, default=0.99,
        help="fail below this fused-vs-jnp SSIM (BASELINE.md target)",
    )
    parser.add_argument(
        "--proposal", action="store_true",
        help="also train + gate the proposal-mode serving path",
    )
    parser.add_argument(
        "--max-psnr-drop", type=float, default=0.7,
        help="--proposal: fail if the proposal run loses more test PSNR "
             "than this vs the hierarchical run (dB)",
    )
    parser.add_argument(
        "--fast-preset", action="store_true",
        help="also measure + gate the importance-only fast serving preset "
             "(merge_coarse=False) at each --fast-n-importance count",
    )
    parser.add_argument(
        "--fast-n-importance", type=int, nargs="+", default=[128, 96],
        help="--fast-preset: importance-only sample counts to evaluate",
    )
    parser.add_argument(
        "--max-fast-psnr-drop", type=float, default=0.5,
        help="--fast-preset: fail if the LARGEST gated fast count loses "
             "more test PSNR than this vs the same leg's merged render (dB)",
    )
    parser.add_argument(
        "--turbo", action="store_true",
        help="also distill + gate the narrow turbo student "
             "(train/distill.py; served by NeRFRenderer preset='turbo')",
    )
    # Turbo student defaults = train.distill.DEFAULT_STUDENT /
    # DEFAULT_DISTILL_STEPS: the interior-robust 6x192@10f @ 50k recipe
    # (4x128@8f + shorter budgets measured FAILING the room probe-grid
    # gate — reports/quality_gate_room_turbo_fix*.md). A test asserts
    # these stay in sync (tests/test_distill.py).
    from nerf_workspaces_explorer_tpu.train.distill import (
        DEFAULT_DISTILL_STEPS,
        DEFAULT_STUDENT,
    )

    parser.add_argument("--turbo-steps", type=int,
                        default=DEFAULT_DISTILL_STEPS)
    parser.add_argument("--turbo-depth", type=int,
                        default=DEFAULT_STUDENT["depth"])
    parser.add_argument("--turbo-width", type=int,
                        default=DEFAULT_STUDENT["width"])
    parser.add_argument("--turbo-freqs", type=int,
                        default=DEFAULT_STUDENT["num_freqs_3d"])
    parser.add_argument(
        "--turbo-n-importance", type=int, default=48,
        help="--turbo: importance samples the student serves with",
    )
    parser.add_argument(
        "--turbo-n-samples", type=int, default=None,
        help="--turbo: uniform proposal-pass samples the student trains "
        "and serves with (default: the teacher's n_samples)",
    )
    parser.add_argument(
        "--prop-subsample", type=int, default=0,
        help="also measure + gate proposal_subsample=N (coarse/importance "
             "stage on every Nth ray per axis; fast-preset and turbo legs)",
    )
    parser.add_argument(
        "--max-subsample-psnr-drop", type=float, default=0.3,
        help="--prop-subsample: fail if the subsampled placement loses more "
             "test PSNR than this vs the same config's exact placement (dB)",
    )
    parser.add_argument(
        "--max-turbo-psnr-drop", type=float, default=1.0,
        help="--turbo: fail if the student loses more test-vs-ground-truth "
             "PSNR than this vs its teacher leg's merged render (dB)",
    )
    # SSIM gates (round-4 VERDICT weak item 6: a student could pass the
    # PSNR bar while smearing structure). Calibrated off the passing room
    # report (quality_gate_room_turbo_fix_6x192_50k.md): mean SSIM drop vs
    # teacher 0.0111, per-view min 0.7811 (teacher's own min 0.7871) — the
    # failing 4x128 recipe sat at drop 0.0545 / min 0.7199.
    parser.add_argument(
        "--max-turbo-ssim-drop", type=float, default=0.03,
        help="--turbo: fail if the student's mean SSIM on the gate views "
             "falls more than this below the teacher's",
    )
    parser.add_argument(
        "--min-turbo-ssim-ratio", type=float, default=0.92,
        help="--turbo: fail if the student's WORST gate view drops below "
             "this fraction of the teacher's worst-view SSIM",
    )
    parser.add_argument(
        "--report", type=str, default=None, metavar="MD_PATH",
        help="also write the measured table as a markdown report "
             "(e.g. reports/quality_gate_20k.md)",
    )
    parser.add_argument(
        "--scene", choices=("orbit", "room"), default="orbit",
        help="orbit: the legacy 12-view blob orbit; room: the "
             "reference-scale interior walkthrough (~180 train views, "
             "reference split rule — data/synthetic.py RoomScene)",
    )
    parser.add_argument(
        "--room-frames", type=int, default=900,
        help="--scene room: walkthrough trajectory length (reference "
             "Sequence_1 is ~900 frames)",
    )
    parser.add_argument(
        "--room-stride", type=int, default=5,
        help="--scene room: train ids = every Nth frame (reference: 5)",
    )
    parser.add_argument(
        "--eval-views", type=int, default=0,
        help="evenly subsample the test split to N views for eval renders "
             "(0 = all; training always sees the full train split)",
    )
    parser.add_argument(
        "--grid", type=int, default=3,
        help="--scene room + --turbo: probe-grid positions per axis for "
             "the held-out distillation gate (x 4 yaw headings)",
    )
    parser.add_argument(
        "--cache-dir", type=str, default="/tmp/room_scene_cache",
        help="--scene room: ground-truth render cache directory",
    )
    parser.add_argument(
        "--max-turbo-over-teacher", type=float, default=0.3,
        help="--turbo: fail if the student BEATS its teacher by more than "
             "this on the gate views (dB) — a gate that ranks the student "
             "above the teacher on held-out views is insensitive",
    )
    return parser


def main() -> None:
    args = build_parser().parse_args()

    from nerf_workspaces_explorer_tpu.core.config import (
        ExperimentConfig,
        FrameworkConfig,
        LoggingConfig,
        RenderingConfig,
    )
    from nerf_workspaces_explorer_tpu.data import make_synthetic_scene

    h, w = args.height, args.width
    if args.scene == "room":
        from nerf_workspaces_explorer_tpu.data.synthetic import (
            make_room_scene_splits,
            render_room_ground_truth,
            room_grid_poses,
        )

        near, far = 0.1, 8.0
        train, test, scene = make_room_scene_splits(
            n_frames=args.room_frames, stride=args.room_stride,
            height=h, width=w, near=near, far=far,
            cache_dir=args.cache_dir,
        )
        print(
            f"scene: room walkthrough, {len(train)} train / {len(test)} "
            f"test views at {w}x{h}", flush=True,
        )
        scene_ctx = {"near": near, "far": far,
                     "half": np.asarray(scene.half)}
        if args.turbo:
            grid_poses = room_grid_poses(
                half=np.asarray(scene.half), grid=args.grid
            )
            grid_gt, _ = render_room_ground_truth(
                scene, grid_poses, h, w, near=near, far=far,
                cache_dir=args.cache_dir,
            )
            scene_ctx["grid_poses"] = grid_poses
            scene_ctx["grid_gt"] = grid_gt
    else:
        near, far = 0.1, 6.0
        train, test, _ = make_synthetic_scene(
            n_train=12, n_test=3, height=h, width=w
        )
        scene_ctx = {"near": near, "far": far}
    if args.eval_views > 0 and args.eval_views < len(test):
        ids = np.linspace(0, len(test) - 1, args.eval_views).astype(int)
        test = type(test)(
            rgb=test.rgb[ids], depth=test.depth[ids],
            camera_pose=test.camera_pose[ids],
        )
        print(f"eval subsampled to {len(test)} test views", flush=True)
    cfg = FrameworkConfig(
        experiment=ExperimentConfig(image_width=w, image_height=h),
        rendering=RenderingConfig(depth_range=(near, far)),
        logging=LoggingConfig(
            step_log_print=0,
            step_log_tensorboard=2**31 - 1,
            step_save_ckpt=0,
            step_render_test=0,
            step_render_train=0,
        ),
    )
    os.makedirs(args.out, exist_ok=True)

    hier = run_leg("hier", False, train, test, cfg, args)
    prop = run_leg("prop", True, train, test, cfg, args) if args.proposal else None
    turbo = None
    if args.turbo:
        teacher_leg, teacher_name = (
            (prop, "prop") if prop is not None else (hier, "hier")
        )
        turbo = run_turbo_leg(
            teacher_leg, teacher_name, train, test, args, scene_ctx
        )

    failures = []
    if hier["psnr"] < args.min_psnr:
        failures.append(
            f"test PSNR {hier['psnr']:.2f} dB < required {args.min_psnr}"
        )
    if hier["fidelity"] < args.min_fidelity:
        failures.append(
            f"fused-vs-jnp SSIM {hier['fidelity']:.5f} < required {args.min_fidelity}"
        )
    if hier["fidelity_int8"] < args.min_fidelity:
        failures.append(
            f"int8-vs-jnp SSIM {hier['fidelity_int8']:.5f} < required {args.min_fidelity}"
        )
    if prop is not None:
        if prop["psnr"] < hier["psnr"] - args.max_psnr_drop:
            failures.append(
                f"proposal test PSNR {prop['psnr']:.2f} dB more than "
                f"{args.max_psnr_drop} dB below hierarchical {hier['psnr']:.2f}"
            )
        if prop["fidelity"] < args.min_fidelity:
            failures.append(
                f"proposal fused-vs-jnp SSIM {prop['fidelity']:.5f} "
                f"< required {args.min_fidelity}"
            )
        if prop["fidelity_int8"] < args.min_fidelity:
            failures.append(
                f"proposal int8-vs-jnp SSIM {prop['fidelity_int8']:.5f} "
                f"< required {args.min_fidelity}"
            )
    if args.fast_preset:
        # Gate the fast preset on the proposal leg when present (that IS the
        # serving configuration), else on the hierarchical leg. Only the
        # largest sample count is a hard gate; smaller counts are recorded
        # as measured speed/quality trade points.
        leg = prop if prop is not None else hier
        leg_name = "prop" if prop is not None else "hier"
        gate_n = max(args.fast_n_importance)
        drop = leg["psnr"] - leg["fast"][gate_n]["psnr"]
        print(
            f"fast-preset gate [{leg_name}, n_importance={gate_n}]: "
            f"PSNR drop {drop:+.2f} dB (allowed {args.max_fast_psnr_drop})"
        )
        if drop > args.max_fast_psnr_drop:
            failures.append(
                f"fast preset (n_importance={gate_n}) loses {drop:.2f} dB "
                f"> allowed {args.max_fast_psnr_drop} vs merged placement"
            )
        if args.prop_subsample > 1:
            sub_drop = (
                leg["fast"][gate_n]["psnr"] - leg["fast"][gate_n]["psnr_sub"]
            )
            print(
                f"prop-subsample gate [{leg_name}, fast n_importance="
                f"{gate_n}, s={args.prop_subsample}]: PSNR drop "
                f"{sub_drop:+.2f} dB (allowed {args.max_subsample_psnr_drop})"
            )
            if sub_drop > args.max_subsample_psnr_drop:
                failures.append(
                    f"prop_subsample={args.prop_subsample} loses "
                    f"{sub_drop:.2f} dB > allowed "
                    f"{args.max_subsample_psnr_drop} vs exact placement"
                )
    if turbo is not None:
        # Same-view comparison: the teacher rendered the SAME gate views
        # (probe grid for --scene room), so the drop is apples-to-apples.
        drop = turbo["teacher_psnr"] - turbo["psnr"]
        print(
            f"turbo gate [{args.turbo_depth}x{args.turbo_width}@"
            f"{args.turbo_freqs}f, n_importance={args.turbo_n_importance}, "
            f"{turbo['gate_tag']}]: PSNR drop {drop:+.2f} dB vs teacher on "
            f"the gate views (allowed {args.max_turbo_psnr_drop}; "
            f"student-above-teacher allowed {args.max_turbo_over_teacher})"
        )
        if drop > args.max_turbo_psnr_drop:
            failures.append(
                f"turbo student loses {drop:.2f} dB > allowed "
                f"{args.max_turbo_psnr_drop} vs its teacher on the gate views"
            )
        if -drop > args.max_turbo_over_teacher:
            failures.append(
                f"turbo student BEATS its teacher by {-drop:.2f} dB > "
                f"{args.max_turbo_over_teacher} on held-out gate views — "
                "the gate is not ranking teacher above student "
                "(insensitive; round-3 VERDICT weak item 3)"
            )
        # Structural gate: PSNR alone can pass a student that smears
        # texture (round-4 VERDICT weak item 6).
        ssim_drop = turbo["teacher_ssim"] - turbo["ssim"]
        ssim_min_floor = args.min_turbo_ssim_ratio * turbo["teacher_ssim_min"]
        print(
            f"turbo SSIM gate: mean drop {ssim_drop:+.4f} vs teacher "
            f"(allowed {args.max_turbo_ssim_drop}); worst view "
            f"{turbo['ssim_min']:.4f} (floor {ssim_min_floor:.4f} = "
            f"{args.min_turbo_ssim_ratio} x teacher min "
            f"{turbo['teacher_ssim_min']:.4f})"
        )
        if ssim_drop > args.max_turbo_ssim_drop:
            failures.append(
                f"turbo student mean SSIM {turbo['ssim']:.4f} is "
                f"{ssim_drop:.4f} below teacher {turbo['teacher_ssim']:.4f} "
                f"> allowed {args.max_turbo_ssim_drop}"
            )
        if turbo["ssim_min"] < ssim_min_floor:
            failures.append(
                f"turbo student worst-view SSIM {turbo['ssim_min']:.4f} < "
                f"floor {ssim_min_floor:.4f} "
                f"({args.min_turbo_ssim_ratio} x teacher min)"
            )
        if args.prop_subsample > 1 and "psnr_sub" in turbo:
            sub_drop = turbo["psnr"] - turbo["psnr_sub"]
            print(
                f"prop-subsample gate [turbo, s={args.prop_subsample}]: "
                f"PSNR drop {sub_drop:+.2f} dB "
                f"(allowed {args.max_subsample_psnr_drop})"
            )
            if sub_drop > args.max_subsample_psnr_drop:
                failures.append(
                    f"turbo prop_subsample={args.prop_subsample} loses "
                    f"{sub_drop:.2f} dB > allowed "
                    f"{args.max_subsample_psnr_drop} vs exact placement"
                )
    if args.report:
        os.makedirs(os.path.dirname(os.path.abspath(args.report)), exist_ok=True)
        with open(args.report, "w") as f:
            scene_desc = (
                f"room walkthrough (reference regime: every "
                f"{args.room_stride}th of {args.room_frames} frames -> "
                f"{len(train)} train / {len(test)} eval test views)"
                if args.scene == "room"
                else "blob orbit, 12 train / 3 test views"
            )
            f.write(
                f"# Serving quality gate at {args.steps} steps\n\n"
                f"Command: `python scripts/validate_quality.py --steps "
                f"{args.steps}"
                + (f" --scene {args.scene}" if args.scene != "orbit" else "")
                + (" --proposal" if args.proposal else "")
                + (" --fast-preset" if args.fast_preset else "")
                + (" --turbo" if args.turbo else "")
                + (
                    f" --prop-subsample {args.prop_subsample}"
                    if args.prop_subsample > 1 else ""
                )
                + (
                    f" --eval-views {args.eval_views}"
                    if args.eval_views > 0 else ""
                )
                + f"`. Scene: {args.height}x{args.width} {scene_desc}; "
                "shipped office model config. Test renders use the fused "
                "Pallas kernel (the serving path).\n\n"
                "| leg | config | test PSNR (dB) | min | SSIM | min "
                "| fused-vs-jnp SSIM | int8-vs-jnp SSIM |\n"
                "|---|---|---|---|---|---|---|---|\n"
            )
            for leg_name, leg in (("hier", hier), ("prop", prop)):
                if leg is None:
                    continue
                f.write(
                    f"| {leg_name} | merged placement | {leg['psnr']:.2f} "
                    f"| {leg['psnr_min']:.2f} | {leg['ssim']:.4f} "
                    f"| {leg['ssim_min']:.4f} | {leg['fidelity']:.5f} "
                    f"| {leg['fidelity_int8']:.5f} |\n"
                )
                for n_imp, row in sorted(leg["fast"].items(), reverse=True):
                    f.write(
                        f"| {leg_name} | fast preset, int8, "
                        f"n_importance={n_imp} | {row['psnr']:.2f} "
                        f"| — | {row['ssim']:.4f} | — | — | — |\n"
                    )
                    if "psnr_sub" in row:
                        f.write(
                            f"| {leg_name} | fast preset, int8, "
                            f"n_importance={n_imp}, prop_subsample="
                            f"{args.prop_subsample} | {row['psnr_sub']:.2f} "
                            f"| — | {row['ssim_sub']:.4f} | — | — | — |\n"
                        )
            if turbo is not None:
                f.write(
                    f"| turbo | distilled {args.turbo_depth}x"
                    f"{args.turbo_width}@{args.turbo_freqs}f student, "
                    f"n_importance={args.turbo_n_importance}, "
                    f"{turbo['gate_tag']} | {turbo['psnr']:.2f} "
                    f"| {turbo['psnr_min']:.2f} | {turbo['ssim']:.4f} "
                    f"| {turbo['ssim_min']:.4f} | — | — |\n"
                )
                f.write(
                    f"| turbo | TEACHER on the same gate views (merged "
                    f"placement) | {turbo['teacher_psnr']:.2f} "
                    f"| {turbo['teacher_psnr_min']:.2f} "
                    f"| {turbo['teacher_ssim']:.4f} "
                    f"| {turbo['teacher_ssim_min']:.4f} | — | — |\n"
                )
                if "psnr_sub" in turbo:
                    f.write(
                        f"| turbo | same student, prop_subsample="
                        f"{args.prop_subsample} | {turbo['psnr_sub']:.2f} "
                        f"| {turbo['psnr_sub_min']:.2f} "
                        f"| {turbo['ssim_sub']:.4f} | — | — | — |\n"
                    )
                f.write(
                    f"\nTurbo gates: PSNR drop vs teacher <= "
                    f"{args.max_turbo_psnr_drop} dB; mean SSIM drop vs "
                    f"teacher <= {args.max_turbo_ssim_drop} (measured "
                    f"{turbo['teacher_ssim'] - turbo['ssim']:+.4f}); "
                    f"worst-view SSIM >= {args.min_turbo_ssim_ratio} x "
                    f"teacher worst view (floor "
                    f"{args.min_turbo_ssim_ratio * turbo['teacher_ssim_min']:.4f}, "
                    f"measured {turbo['ssim_min']:.4f}).\n"
                )
            f.write(
                "\nResult: "
                + ("**QUALITY GATE FAILED**: " + "; ".join(failures)
                   if failures else "**QUALITY GATE PASSED.**")
                + "\n"
            )
        print(f"report -> {args.report}")
    if failures:
        print("QUALITY GATE FAILED: " + "; ".join(failures))
        sys.exit(1)
    print("QUALITY GATE PASSED")


if __name__ == "__main__":
    main()
