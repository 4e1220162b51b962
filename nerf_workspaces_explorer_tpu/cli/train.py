"""Training CLI.

Parity target: reference nerf/train.py:11-56 (`--office` whitelist, YAML
load, handler setup, per-step wall-clock print). Extensions: `--iterations`
override, `--resume` (restores step + optimizer state), `--synthetic` (train
on a generated scene when the Replica data isn't present), `--mesh` for
multi-chip data parallelism.

Usage:
    python -m nerf_workspaces_explorer_tpu.cli.train --office tokyo
"""

from __future__ import annotations

import argparse
import os
import time

AVAILABLE_OFFICES = ("tokyo", "new_york", "geneve", "belgrade")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--office", type=str, default="tokyo")
    parser.add_argument("--iterations", type=int, default=None)
    parser.add_argument("--resume", type=str, default=None, help="checkpoint to resume")
    parser.add_argument(
        "--synthetic",
        action="store_true",
        help="train on a synthetic scene instead of the Replica dataset",
    )
    parser.add_argument("--synthetic-size", type=int, default=64)
    parser.add_argument(
        "--synthetic-views", type=int, nargs=2, default=(8, 2),
        metavar=("N_TRAIN", "N_TEST"),
        help="synthetic scene view counts (sparse views overfit long runs)",
    )
    parser.add_argument(
        "--scene", choices=("orbit", "room"), default="orbit",
        help="--synthetic scene type: orbit (blob orbit, --synthetic-views "
        "counts) or room (reference-scale interior walkthrough with the "
        "reference's every-5th/+2 split rule — data/synthetic.py RoomScene)",
    )
    parser.add_argument(
        "--room-frames", type=int, default=900,
        help="--scene room: walkthrough trajectory frames (reference "
        "Sequence_1 is ~900)",
    )
    parser.add_argument(
        "--room-stride", type=int, default=5,
        help="--scene room: train ids = every Nth frame (reference: 5)",
    )
    parser.add_argument(
        "--scene-cache", type=str, default="/tmp/room_scene_cache",
        help="--scene room: ground-truth render cache directory",
    )
    parser.add_argument(
        "--save-final", action="store_true",
        help="save a checkpoint at the final step into <save-dir>/checkpoints "
        "(the reference cadence fires at step%%20000==0 starting from 0, so a "
        "200k run never checkpoints its last-step weights — "
        "training_handler.py:338-339)",
    )
    parser.add_argument("--mesh", type=int, default=0, help="devices for data parallelism")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--save-dir", type=str, default=None)
    parser.add_argument(
        "--profile", type=str, default=None, metavar="DIR",
        help="capture a jax.profiler trace of the first 20 steps into DIR",
    )
    parser.add_argument(
        "--export-final", action="store_true",
        help="on completion, save final_models/<office>/model.npz (+ .ckpt when torch is available)",
    )
    parser.add_argument(
        "--field", choices=("auto", "xla", "pallas"), default="auto",
        help="training field implementation: pallas = fused custom-VJP "
        "field kernels (~2x steps/s on TPU; bf16 gradients, long-horizon "
        "validated — reports/long_horizon_200k_room.md), xla = plain XLA "
        "field (fp32 master compute; the CPU/cross-check path), auto = "
        "pallas on TPU, xla elsewhere (the default)",
    )
    parser.add_argument(
        "--fused-field", action="store_true",
        help="alias for --field pallas (kept for script compatibility)",
    )
    parser.add_argument(
        "--proposal", action="store_true",
        help="replace the coarse 8x256 net with a tiny proposal density net "
        "trained via the mip-NeRF-360 interlevel loss (extension; faster "
        "rendering and training, changes sample placement vs the reference)",
    )
    parser.add_argument(
        "--fast-preset", action="store_true",
        help="train the fine net on the importance-only sample placement "
        "(merge_coarse=False) it will see under the fast serving preset",
    )
    parser.add_argument(
        "--steps-per-call", type=int, default=1, metavar="K",
        help="advance K optimizer steps per device dispatch (lax.scan); "
        "logging/eval/ckpt cadences still fire at their exact steps",
    )
    parser.add_argument(
        "--eval-max-views", type=int, default=0, metavar="N",
        help="evenly subsample the train/test EVAL render cadences to at "
        "most N views (0 = reference behavior: render every view — "
        "…training_handler.py:411-480; at ~180 views/split a full-set "
        "render costs ~2 min/cadence). Training always uses the full split",
    )
    parser.add_argument(
        "--nan-debug", action="store_true",
        help="raise on the first NaN inside jitted code (slow; the analog of "
        "the reference's global anomaly detection)",
    )
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    office_name = str(args.office).lower().strip().replace(" ", "_")
    if office_name not in AVAILABLE_OFFICES:
        raise RuntimeError(f"Office {office_name} not available for training.")
    office = f"office_{office_name}"

    from nerf_workspaces_explorer_tpu.core.config import load_config
    from nerf_workspaces_explorer_tpu.obs import enable_nan_debugging, trace_context
    from nerf_workspaces_explorer_tpu.parallel import data_mesh
    from nerf_workspaces_explorer_tpu.train import Trainer

    if args.nan_debug:
        enable_nan_debugging()

    config = load_config(office_name=office)
    if args.steps_per_call > 1 and 0 < config.logging.step_log_print < args.steps_per_call:
        # The reference config prints every step, which makes every step a
        # cadence boundary and would keep the scanned fast path idle;
        # stretch the print cadence to the dispatch size.
        import dataclasses

        config = dataclasses.replace(
            config,
            logging=dataclasses.replace(
                config.logging, step_log_print=args.steps_per_call
            ),
        )
        print(
            f"(--steps-per-call {args.steps_per_call}: console print cadence "
            f"raised to every {args.steps_per_call} steps)"
        )
    mesh = data_mesh(args.mesh) if args.mesh > 0 else None

    train_data = test_data = None
    if args.synthetic:
        size = args.synthetic_size
        if args.scene == "room":
            import dataclasses

            from nerf_workspaces_explorer_tpu.data.synthetic import (
                make_room_scene_splits,
            )

            near, far = 0.1, 8.0
            config = dataclasses.replace(
                config,
                rendering=dataclasses.replace(
                    config.rendering, depth_range=(near, far)
                ),
            )
            train_data, test_data, _ = make_room_scene_splits(
                n_frames=args.room_frames, stride=args.room_stride,
                height=size * 3 // 4, width=size, seed=7 + args.seed,
                near=near, far=far, cache_dir=args.scene_cache,
            )
            print(
                f"room scene: {len(train_data)} train / {len(test_data)} "
                f"test views at {size}x{size * 3 // 4}"
            )
        else:
            from nerf_workspaces_explorer_tpu.data import make_synthetic_scene

            near, far = config.rendering.depth_range
            n_train, n_test = args.synthetic_views
            train_data, test_data, _ = make_synthetic_scene(
                n_train=n_train, n_test=n_test, height=size * 3 // 4,
                width=size, seed=args.seed, near=near, far=far,
            )

    trainer = Trainer(
        office,
        config,
        train_data=train_data,
        test_data=test_data,
        mesh=mesh,
        seed=args.seed,
        save_dir=args.save_dir,
        field_impl="pallas" if args.fused_field else args.field,
        use_proposal=args.proposal,
        merge_coarse=not args.fast_preset,
        steps_per_call=args.steps_per_call,
        eval_max_views=args.eval_max_views,
    )
    trainer.setup()

    start_step = 0
    if args.resume is not None:
        start_step = trainer.resume_from_checkpoint(args.resume)
        print(f"Resumed from {args.resume} at step {start_step}")

    num_iterations = (
        args.iterations if args.iterations is not None else config.training.n_iterations
    )

    print("#" * 80)
    print("------------------------------- Training loop ---------------------------------")
    print("#" * 80)

    profile_until = start_step + 20 if args.profile else start_step - 1
    with trace_context(args.profile if args.profile else None):
        for i in range(start_step, min(profile_until + 1, num_iterations)):
            trainer.step(i)
    main_start = max(start_step, profile_until + 1)
    if args.steps_per_call > 1:
        # Scanned multi-step dispatches; per-step wall-clock prints (the
        # reference's nerf/train.py:49-56 behavior) only make sense one
        # step at a time, so fit() owns the loop here.
        loop_start = time.time()
        trainer.fit(num_iterations, start_step=main_start)
        duration = time.time() - loop_start
        done = num_iterations - main_start
        if done > 0:
            print(
                f"Finished steps {main_start + 1}..{num_iterations} in "
                f"{duration:.1f} sec ({done / duration:.1f} steps/s, "
                f"{args.steps_per_call} steps/dispatch)"
            )
    else:
        for i in range(main_start, num_iterations):
            step_start = time.time()
            trainer.step(i)
            duration = time.time() - step_start
            print(f"Finished step: {i + 1}/{num_iterations} --> Step duration: {duration} sec")

    if args.save_final:
        trainer.save_models_checkpoint(num_iterations)

    # Export the reference's nine SVG training curves (SURVEY component 22).
    try:
        written = trainer.export_results()
        if written:
            print(f"Exported {len(written)} result curves to {os.path.dirname(written[0])}")
    except Exception as exc:  # results export must never fail a run
        print(f"(results export skipped: {exc})")

    if args.export_final:
        final_dir = os.path.join("final_models", office)
        os.makedirs(final_dir, exist_ok=True)
        from nerf_workspaces_explorer_tpu.infer.checkpoint import save_checkpoint

        npz_path = os.path.join(final_dir, "model.npz")
        save_checkpoint(
            npz_path, trainer.params,
            step=int(trainer.state.step), metadata={"office": office},
        )
        print(f"Exported final model to {npz_path}")
        try:
            from nerf_workspaces_explorer_tpu.infer.checkpoint import (
                save_torch_checkpoint,
            )

            ckpt_path = os.path.join(final_dir, "model.ckpt")
            save_torch_checkpoint(
                ckpt_path, trainer.params["coarse"], trainer.params["fine"],
                step=int(trainer.state.step),
            )
            print(f"Exported reference-format checkpoint to {ckpt_path}")
        except ImportError:
            pass


if __name__ == "__main__":
    main()
