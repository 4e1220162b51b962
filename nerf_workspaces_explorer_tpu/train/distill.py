"""Checkpoint distillation: compress a trained NeRF into a narrow student.

The fused int8 fine pass sits at ~70% of the v5e MXU roofline (ROADMAP.md),
so the remaining serving-latency lever is *work reduction*: fewer MACs per
sample. The narrow-net probe (scripts/narrow_net_probe.py) measured that a
narrow fine net holds quality only when trained jointly with a reduced
positional-encoding frequency count (a 4x128 net at the shipped 10
frequencies memorizes train views: train 30.9 / test 15.5 dB), and that
6x192 @ 10 freqs and 4x128 @ 8 freqs both land within ~1.3 dB of the wide
8x256 teacher when trained from scratch.

This module turns that datapoint into a product feature: given any trained
checkpoint (the reference ships pretrained 8x256 models per office,
/root/reference/application/workspace.py:25-26, and has no analog of this —
it always serves the full 19.7M-eval pipeline,
/root/reference/nerf/inference/nerf_replica_inference_handler.py:166-277),
distill it OFFLINE into a proposal-mode narrow student:

  1. render the teacher at a set of poses covering the reachable view space
     (no dataset needed — the teacher checkpoint IS the scene),
  2. train a narrow proposal(2x64)+fine(DxW) student on those renders with
     the existing Trainer (photometric distillation: the student regresses
     the exact product-visible quantity),
  3. save the student as a `.turbo.npz` sidecar next to the teacher
     checkpoint; `NeRFRenderer(preset="turbo")` picks it up, reading the
     student architecture from the sidecar metadata.

Gate: scripts/validate_quality.py --turbo (student-vs-teacher PSNR on
held-out teacher views).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerf_workspaces_explorer_tpu.core.config import (
    ExperimentConfig,
    FrameworkConfig,
    LoggingConfig,
    ModelConfig,
    RenderingConfig,
)
from nerf_workspaces_explorer_tpu.data.replica import SceneData
from nerf_workspaces_explorer_tpu.infer.checkpoint import (
    load_checkpoint,
    save_checkpoint,
)
from nerf_workspaces_explorer_tpu.models.encoding import embedding_output_dim
from nerf_workspaces_explorer_tpu.models.mlp import NerfMLPSpec
from nerf_workspaces_explorer_tpu.rays.raygen import create_rays
from nerf_workspaces_explorer_tpu.render.pipeline import RenderSettings

TURBO_SUFFIX = ".turbo.npz"

# Default student: 6x192 at a 10-frequency encoding with a 50k-step
# distillation budget — the recipe measured to hold INTERIOR scenes, which
# are the product content (all four shipped offices are Replica interiors,
# reference nerf/datasets/replica_dataset.py:25-39). On the room-scene
# probe-grid gate the 4x128@8f arch-probe winner FAILS even with coverage
# views and a 20k budget (-2.38 dB vs teacher,
# reports/quality_gate_room_turbo_fix.md) and 6x192@10f@20k still fails
# (-1.52 dB); only 6x192@10f@50k passes (+0.64 dB,
# reports/quality_gate_room_turbo_fix_6x192_50k.md). On the free-floating
# orbit scene 4x128@8f is faster AND higher-fidelity
# (reports/turbo_arch_probe.md) — it remains available as SPEED_STUDENT,
# an opt-in that must pass its own per-scene gate
# (validate_quality.py --turbo).
DEFAULT_STUDENT = {"depth": 6, "width": 192, "num_freqs_3d": 10}
# Opt-in speed student (orbit-scene arch-probe winner: 171.3 ms vs 212.0
# at 640x480 int8, best held-out fidelity of that sweep). Known-bad on
# interiors at any measured budget — gate per scene before serving.
SPEED_STUDENT = {"depth": 4, "width": 128, "num_freqs_3d": 8}
# Distillation budget: 20k leaves the 6x192 room student 1.52 dB under its
# teacher (FAIL); 50k recovers to +0.64 (PASS). Orbit students converge
# far earlier, so the longer default only costs wall-clock there.
DEFAULT_DISTILL_STEPS = 50_000


def turbo_sidecar_path(ckpt_path: str) -> str:
    """`model.ckpt` / `model.npz` -> `model.turbo.npz` (same directory)."""
    stem, _ = os.path.splitext(ckpt_path)
    return stem + TURBO_SUFFIX


def student_spec_from_meta(meta: Dict[str, Any]) -> Tuple[NerfMLPSpec, Dict[str, Any]]:
    """Rebuild the student NerfMLPSpec from sidecar metadata."""
    student = meta["student"]
    spec = NerfMLPSpec(
        depth=int(student["depth"]),
        width=int(student["width"]),
        input_ch=embedding_output_dim(int(student["num_freqs_3d"])),
        input_ch_views=embedding_output_dim(int(student.get("num_freqs_2d", 4))),
        use_view_dirs=True,
    )
    return spec, student


def render_teacher_views(
    teacher_params: Dict[str, Any],
    teacher_spec: NerfMLPSpec,
    teacher_settings: RenderSettings,
    poses: np.ndarray,
    height: int,
    width: int,
    *,
    near: float,
    far: float,
    hfov_degrees: float = 90.0,
    use_pallas: Optional[bool] = None,
    chunk: int = 8192,
) -> np.ndarray:
    """Render the teacher at each pose -> float32 [N, H, W, 3] in [0, 1].

    Uses the fused Pallas kernel on TPU (bf16 — the distillation targets
    should match what the serving path actually produces) and the chunked
    jnp pipeline on CPU.
    """
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    fx = width / 2.0 / np.tan(np.radians(hfov_degrees / 2.0))
    cx, cy = (width - 1.0) / 2.0, (height - 1.0) / 2.0
    settings = teacher_settings.for_eval()

    if use_pallas:
        from nerf_workspaces_explorer_tpu.ops.pallas_render import (
            render_rays_fused,
        )

        @jax.jit
        def frame(params, c2w):
            rays = create_rays(
                c2w[None], height, width, fx, fx, cx, cy, near, far
            ).reshape(height * width)
            return render_rays_fused(
                params, rays, settings, spec=teacher_spec
            ).reshape(height, width, 3)

    else:
        from nerf_workspaces_explorer_tpu.render.pipeline import (
            render_rays_chunked,
        )

        @jax.jit
        def frame(params, c2w):
            rays = create_rays(
                c2w[None], height, width, fx, fx, cx, cy, near, far
            ).reshape(height * width)
            out = render_rays_chunked(
                params, rays, settings, spec=teacher_spec, chunk=chunk
            )
            return out["rgb_fine"].reshape(height, width, 3)

    frames = []
    for i in range(poses.shape[0]):
        frames.append(
            np.asarray(frame(teacher_params, jnp.asarray(poses[i], jnp.float32)))
        )
    return np.clip(np.stack(frames).astype(np.float32), 0.0, 1.0)


def student_config(
    height: int,
    width: int,
    *,
    near: float,
    far: float,
    depth: int = DEFAULT_STUDENT["depth"],
    net_width: int = DEFAULT_STUDENT["width"],
    num_freqs_3d: int = DEFAULT_STUDENT["num_freqs_3d"],
    n_samples: int = 64,
    n_importance: int = 128,
) -> FrameworkConfig:
    """FrameworkConfig for the narrow student trainer (silent logging)."""
    return FrameworkConfig(
        experiment=ExperimentConfig(image_width=width, image_height=height),
        model=ModelConfig(
            net_depth=depth,
            net_width=net_width,
            net_depth_fine=depth,
            net_width_fine=net_width,
        ),
        rendering=RenderingConfig(
            depth_range=(near, far),
            num_freqs_3d=num_freqs_3d,
            n_samples=n_samples,
            n_importance=n_importance,
        ),
        logging=LoggingConfig(
            step_log_print=0,
            step_log_tensorboard=2**31 - 1,
            step_save_ckpt=0,
            step_render_test=0,
            step_render_train=0,
        ),
    )


def distill_student(
    teacher_params: Dict[str, Any],
    teacher_spec: NerfMLPSpec,
    teacher_settings: RenderSettings,
    poses: np.ndarray,
    *,
    height: int,
    width: int,
    near: float,
    far: float,
    steps: int = DEFAULT_DISTILL_STEPS,
    depth: int = DEFAULT_STUDENT["depth"],
    net_width: int = DEFAULT_STUDENT["width"],
    num_freqs_3d: int = DEFAULT_STUDENT["num_freqs_3d"],
    n_holdout: int = 2,
    seed: int = 0,
    use_pallas: Optional[bool] = None,
    field_impl: Optional[str] = None,
    log_every: int = 500,
    name: str = "distill",
    teacher_rgb: Optional[np.ndarray] = None,
    n_samples: Optional[int] = None,
    n_importance_train: Optional[int] = None,
) -> Tuple[Dict[str, Any], FrameworkConfig, Dict[str, Any]]:
    """Distill (teacher_params, spec, settings) into a narrow student.

    Returns (student_params, student_cfg, report). `report` carries the
    student-vs-teacher PSNR on `n_holdout` held-out teacher views — the
    quantity validate_quality.py --turbo gates on.

    `teacher_rgb` ([len(poses), H, W, 3], from render_teacher_views) skips
    the teacher rendering pass — pass it when distilling several student
    candidates from one teacher so the teacher renders (and their Pallas
    compiles) are paid once.

    `n_samples` / `n_importance_train` override the student's uniform
    proposal-pass sample count and training importance count (defaults:
    the teacher's). The proposal coarse pass costs ~33 ms of the 6x192
    turbo frame's 162 ms device time at 640x480 (profile_turbo_frame.py),
    so serving fewer uniform samples is a first-class work-reduction
    lever; the student's proposal net trains at this count so serving
    matches the training distribution.
    """
    from nerf_workspaces_explorer_tpu.train.loop import Trainer

    poses = np.asarray(poses, dtype=np.float32)
    if poses.shape[0] < n_holdout + 2:
        raise ValueError(
            f"need at least {n_holdout + 2} poses, got {poses.shape[0]}"
        )
    if teacher_rgb is not None:
        rgb = np.asarray(teacher_rgb, dtype=np.float32)
        if rgb.shape != (poses.shape[0], height, width, 3):
            raise ValueError(
                f"teacher_rgb shape {rgb.shape} != "
                f"{(poses.shape[0], height, width, 3)}"
            )
    else:
        rgb = render_teacher_views(
            teacher_params, teacher_spec, teacher_settings, poses, height,
            width, near=near, far=far, use_pallas=use_pallas,
        )
    depth_maps = np.zeros(rgb.shape[:3], dtype=np.float32)
    n_train = poses.shape[0] - n_holdout
    train_data = SceneData(rgb[:n_train], depth_maps[:n_train], poses[:n_train])
    test_data = SceneData(rgb[n_train:], depth_maps[n_train:], poses[n_train:])

    cfg = student_config(
        height, width, near=near, far=far,
        depth=depth, net_width=net_width, num_freqs_3d=num_freqs_3d,
        n_samples=(
            n_samples if n_samples is not None else teacher_settings.n_samples
        ),
        n_importance=(
            n_importance_train
            if n_importance_train is not None
            else teacher_settings.n_importance
        ),
    )
    kwargs: Dict[str, Any] = {}
    if field_impl is not None:
        kwargs["field_impl"] = field_impl
    trainer = Trainer(
        name,
        cfg,
        train_data=train_data,
        test_data=test_data,
        save_dir=os.path.join("/tmp/distill", name),
        enable_tensorboard=False,
        use_proposal=True,
        seed=seed,
        use_pallas=use_pallas,
        **kwargs,
    )
    trainer.setup()
    for i in range(steps):
        metrics = trainer.step(i)
        if log_every and i % log_every == 0:
            print(
                f"[{name}] step {i}: loss {float(metrics['total_loss']):.5f}"
                f" psnr_fine {float(metrics['psnr_fine']):.2f}",
                flush=True,
            )

    # Student-vs-teacher fidelity on the held-out teacher views, rendered
    # exactly the way the turbo preset serves: proposal placement,
    # importance-only fine pass.
    student_settings = trainer._settings.for_eval()._replace(merge_coarse=False)
    student_rgb = render_student_views(
        trainer.params, trainer._spec, student_settings, poses[n_train:],
        height, width, near=near, far=far, use_pallas=use_pallas,
    )
    mses = np.mean(
        (student_rgb - rgb[n_train:]) ** 2, axis=(1, 2, 3)
    )
    psnrs = -10.0 * np.log10(np.maximum(mses, 1e-12))
    report = {
        "psnr_vs_teacher": float(np.mean(psnrs)),
        "psnr_vs_teacher_min": float(np.min(psnrs)),
        "n_views": int(poses.shape[0]),
        "n_holdout": int(n_holdout),
        "steps": int(steps),
    }
    return trainer.params, cfg, report


def render_student_views(
    params, spec, settings, poses, height, width, *, near, far,
    use_pallas=None, hfov_degrees: float = 90.0,
):
    """Student full-frame renders via the serving placement."""
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    fx = width / 2.0 / np.tan(np.radians(hfov_degrees / 2.0))
    cx, cy = (width - 1.0) / 2.0, (height - 1.0) / 2.0

    if use_pallas:
        from nerf_workspaces_explorer_tpu.ops.pallas_render import (
            render_rays_fused,
        )

        @jax.jit
        def frame(p, c2w):
            rays = create_rays(
                c2w[None], height, width, fx, fx, cx, cy, near, far
            ).reshape(height * width)
            return render_rays_fused(
                p, rays, settings, spec=spec, grid_hw=(height, width)
            ).reshape(height, width, 3)

    else:
        from nerf_workspaces_explorer_tpu.render.pipeline import (
            render_rays_chunked,
        )

        @jax.jit
        def frame(p, c2w):
            rays = create_rays(
                c2w[None], height, width, fx, fx, cx, cy, near, far
            ).reshape(height * width)
            out = render_rays_chunked(p, rays, settings, spec=spec, chunk=8192)
            return out["rgb_fine"].reshape(height, width, 3)

    out = []
    for i in range(poses.shape[0]):
        out.append(np.asarray(frame(params, jnp.asarray(poses[i], jnp.float32))))
    return np.clip(np.stack(out).astype(np.float32), 0.0, 1.0)


def save_turbo_checkpoint(
    path: str,
    student_params: Dict[str, Any],
    student_cfg: FrameworkConfig,
    *,
    n_importance_serving: int = 48,
    proposal_subsample_serving: int = 4,
    report: Optional[Dict[str, Any]] = None,
    teacher: str = "",
    step: int = 0,
) -> None:
    """Write the `.turbo.npz` sidecar NeRFRenderer(preset='turbo') loads.

    `proposal_subsample_serving` records the coarse/importance ray-lattice
    stride (RenderSettings.proposal_subsample) the student was quality-gated
    at; the turbo preset serves with it by default. Stride 4 passed the
    20k-step gate with no measurable PSNR loss vs exact placement
    (reports/quality_gate_subsample4_20k.md); the 48-importance-sample
    student measured +0.63 dB ABOVE its teacher's merged-render test PSNR
    (gate allows up to 1.0 dB BELOW — reports/quality_gate_turbo48_20k.md).
    """
    meta: Dict[str, Any] = {
        "turbo": True,
        "teacher": os.path.basename(teacher),
        "student": {
            "depth": student_cfg.model.net_depth_fine,
            "width": student_cfg.model.net_width_fine,
            "num_freqs_3d": student_cfg.rendering.num_freqs_3d,
            "num_freqs_2d": student_cfg.rendering.num_freqs_2d,
            "n_samples": student_cfg.rendering.n_samples,
            "n_importance": n_importance_serving,
            "proposal_num_freqs": 6,
            "proposal_subsample": int(proposal_subsample_serving),
        },
    }
    if report:
        # Stamp the serving config the report's numbers were measured at, so
        # a later metadata-only re-stamp (scripts/set_turbo_serving_config.py)
        # can't silently present old-config numbers as current-config ones.
        meta["distill_report"] = dict(
            report,
            measured_at={
                "n_importance": int(n_importance_serving),
                "proposal_subsample": int(proposal_subsample_serving),
            },
        )
    save_checkpoint(path, student_params, step=step, metadata=meta)


def load_turbo_checkpoint(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Load a sidecar -> (params, metadata). Raises if not a turbo ckpt."""
    params, _, _, meta = load_checkpoint(path)
    if not meta.get("turbo"):
        raise ValueError(f"{path} is not a turbo (distilled-student) checkpoint")
    return params, meta


def read_turbo_metadata(path: str) -> Dict[str, Any]:
    """Metadata only (cheap — used by NeRFRenderer.__init__ to fix the
    static spec/settings before weights load)."""
    import json

    with np.load(path) as arrays:
        meta = json.loads(bytes(arrays["__meta__"].tobytes()).decode())
    if not meta.get("turbo"):
        raise ValueError(f"{path} is not a turbo (distilled-student) checkpoint")
    return meta


def office_distill_poses(
    office_name: str,
    *,
    grid: int = 4,
    yaw_step_degrees: float = 45.0,
    margin: float = 0.15,
) -> np.ndarray:
    """Poses covering an office's reachable view space, for dataset-free
    distillation of a shipped checkpoint.

    Samples the floor-plan relative-coordinate square on a `grid`x`grid`
    lattice (inset by `margin` — clicks at the extreme edges are outside
    the walkable area on the shipped floor plans) crossed with yaw angles,
    mapped through the office's calibration exactly like a GUI click
    (reference application/workspace.py:71-196).
    """
    from nerf_workspaces_explorer_tpu.app.workspace import make_workspaces
    from nerf_workspaces_explorer_tpu.camera.poses import (
        poses_from_coordinates,
    )

    # Workspace office names carry the "office_" prefix ("office_tokyo");
    # accept the short CLI form ("tokyo") too.
    key = office_name if office_name.startswith("office_") else f"office_{office_name}"
    ws = {w.office_name: w for w in make_workspaces()}[key]
    poses: List[np.ndarray] = []
    lin = np.linspace(margin, 1.0 - margin, grid)
    yaws = np.arange(0.0, 360.0, yaw_step_degrees)
    for rel_x in lin:
        for rel_y in lin:
            for yaw in yaws:
                init, delta = ws.transform_relative_coordinates(
                    float(rel_x), float(rel_y), float(yaw), 0.0
                )
                poses.append(poses_from_coordinates(init, [delta])[0])
    rng = np.random.default_rng(0)
    out = np.stack(poses).astype(np.float32)
    return out[rng.permutation(out.shape[0])]
