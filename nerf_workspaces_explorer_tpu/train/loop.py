"""Training orchestration: data prep, jitted step loop, logging, eval
renders, checkpoint/resume.

Parity target: reference NeRFReplicaTrainingHandler
(nerf/training/nerf_replica_training_handler.py:24-618) and the CLI loop in
nerf/train.py:30-56. Cadences preserved: console print every
`step_log_print`, TensorBoard scalars + sigma histograms every
`step_log_tensorboard`, full train/test eval renders (PNG + mp4 + batch
PSNR/MSE) every `step_render_{train,test}`, checkpoints every
`step_save_ckpt` — same metric names as the reference (:378-392, :430-440,
:465-475).

Framework extensions over the reference (SURVEY.md §5): resume-from-
checkpoint actually restores step + optimizer state (the reference saves but
never loads them), per-phase StepTimer, and optional multi-chip data
parallelism via a jax Mesh.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerf_workspaces_explorer_tpu.core.config import FrameworkConfig, load_config
from nerf_workspaces_explorer_tpu.data.replica import ReplicaDataset, SceneData
from nerf_workspaces_explorer_tpu.infer.checkpoint import load_checkpoint, save_checkpoint
from nerf_workspaces_explorer_tpu.infer.renderer import (
    settings_from_config,
    spec_from_config,
)
from nerf_workspaces_explorer_tpu.obs.profiler import StepTimer
from nerf_workspaces_explorer_tpu.obs.tb import TensorboardWriter
from nerf_workspaces_explorer_tpu.rays.raygen import RayBundle, create_rays
from nerf_workspaces_explorer_tpu.render.pipeline import render_rays_chunked
from nerf_workspaces_explorer_tpu.train.step import (
    TrainState,
    init_train_state,
    make_optimizer,
    make_train_step,
)
from nerf_workspaces_explorer_tpu.utils.metrics import to8b
from nerf_workspaces_explorer_tpu.utils.viz import depth2rgb

EXPERIMENTS_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "experiments")


def _next_run_dir(base: str) -> str:
    """Numbered run directories (reference …training_handler.py:33-40).

    Unlike the reference's ``len(os.listdir)+1`` (which collides after a run
    directory is deleted), this takes max(existing numbers)+1 and creates the
    directory with ``os.makedirs(exist_ok=False)``, retrying upward on a race
    with a concurrent trainer.
    """
    run = 1
    if os.path.exists(base):
        numbered = [int(d) for d in os.listdir(base) if d.isdigit()]
        run = max(numbered, default=0) + 1
    while True:
        path = os.path.join(base, str(run))
        try:
            os.makedirs(path, exist_ok=False)
            return path
        except FileExistsError:
            run += 1


class Trainer:
    """End-to-end NeRF training for one workspace."""

    def __init__(
        self,
        office_name: str,
        config: Optional[FrameworkConfig] = None,
        *,
        train_data: Optional[SceneData] = None,
        test_data: Optional[SceneData] = None,
        experiments_dir: str = EXPERIMENTS_DIR,
        mesh: Optional[jax.sharding.Mesh] = None,
        seed: int = 0,
        save_dir: Optional[str] = None,
        enable_tensorboard: bool = True,
        use_pallas: Optional[bool] = None,
        field_impl: str = "auto",
        use_proposal: bool = False,
        merge_coarse: bool = True,
        steps_per_call: int = 1,
        eval_max_views: int = 0,
    ) -> None:
        self._office_name = office_name
        self._config = config if config is not None else load_config(office_name=office_name)
        self._mesh = mesh
        self._seed = seed
        # Eval renders use the fused Pallas kernel on TPU by default.
        if use_pallas is None:
            use_pallas = jax.devices()[0].platform == "tpu"
        self._use_pallas = use_pallas
        if field_impl == "auto":
            # The fused custom-VJP field kernels are the TPU training
            # default (~2x steps/s at equal convergence — long-horizon
            # validation: reports/long_horizon_200k_room.md); the XLA field
            # serves CPU runs and fp32 cross-checks.
            field_impl = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
        self._field_impl = field_impl
        # steps_per_call > 1: fit() advances K optimizer steps per dispatch
        # (lax.scan in make_train_step) between logging/eval/ckpt
        # boundaries; the trajectory is bit-identical to single stepping.
        self._steps_per_call = max(1, int(steps_per_call))
        # eval_max_views > 0: evenly subsample the train/test EVAL render
        # sets to at most that many views (training always samples the full
        # train split). The reference renders every view each cadence
        # (…training_handler.py:411-480) — that stays the default — but at
        # reference scale (~180 views/split) a full-set render costs ~2 min
        # per cadence, which dominates a 200k-step study run.
        self._eval_max_views = max(0, int(eval_max_views))
        self._fast_step = None
        self.timer = StepTimer()

        self._save_dir = save_dir or _next_run_dir(
            os.path.join(experiments_dir, office_name)
        )

        cfg = self._config
        self._spec = spec_from_config(cfg)
        self._settings = settings_from_config(cfg, train=True)
        if use_proposal:
            self._settings = self._settings._replace(use_proposal=True)
        if not merge_coarse:
            # Train the fine net on the importance-only sample placement it
            # will see under the fast serving preset (render/pipeline.py
            # RenderSettings.merge_coarse).
            self._settings = self._settings._replace(merge_coarse=False)

        self._tb = (
            TensorboardWriter(
                self._save_dir,
                cfg.to_dict(),
                log_interval=cfg.logging.step_log_tensorboard,
            )
            if enable_tensorboard
            else None
        )

        if train_data is None or test_data is None:
            dataset = ReplicaDataset(
                office_name,
                image_height=cfg.experiment.image_height,
                image_width=cfg.experiment.image_width,
            )
            train_data = dataset.train
            test_data = dataset.test
        self._train_data = train_data
        self._test_data = test_data

        # Derive the working resolution from the data itself so synthetic
        # scenes at small sizes work with the stock config.
        self._img_h = int(train_data.rgb.shape[1])
        self._img_w = int(train_data.rgb.shape[2])
        self._hfov = cfg.hfov_degrees

        self._state: Optional[TrainState] = None
        self._train_step = None
        self._eval_render_jits: Dict[Any, Any] = {}
        self._base_key = jax.random.PRNGKey(seed)

    # ------------------------------------------------------------------ #
    # Setup phases (reference prepare_data / initialize_models /
    # initialize_rays, …training_handler.py:118-263)
    # ------------------------------------------------------------------ #

    @property
    def config(self) -> FrameworkConfig:
        return self._config

    @property
    def save_dir(self) -> str:
        return self._save_dir

    @property
    def state(self) -> TrainState:
        if self._state is None:
            raise RuntimeError("initialize_models() has not run")
        return self._state

    @property
    def params(self) -> Dict[str, Any]:
        return self.state.params

    def prepare_data(self) -> None:
        """Move training tensors to device; log ground truth to TensorBoard."""
        f = self._config.rendering.test_viz_factor
        self._img_h_scaled = self._img_h // f
        self._img_w_scaled = self._img_w // f

        def scale(images: np.ndarray) -> np.ndarray:
            if f == 1:
                return images
            return np.asarray(
                jax.image.resize(
                    jnp.asarray(images),
                    (
                        images.shape[0],
                        self._img_h_scaled,
                        self._img_w_scaled,
                    )
                    + images.shape[3:],
                    method="bilinear",
                )
            )

        n_train = len(self._train_data)
        n_test = len(self._test_data)
        self._train_rgbs = jnp.asarray(
            self._train_data.rgb.reshape(n_train, -1, 3), dtype=jnp.float32
        )

        def eval_ids(n: int) -> Optional[np.ndarray]:
            if 0 < self._eval_max_views < n:
                return np.linspace(0, n - 1, self._eval_max_views).astype(int)
            return None

        self._train_eval_ids = eval_ids(n_train)
        self._test_eval_ids = eval_ids(n_test)
        train_eval_rgb = self._train_data.rgb
        if self._train_eval_ids is not None:
            train_eval_rgb = train_eval_rgb[self._train_eval_ids]
        test_eval_rgb = self._test_data.rgb
        if self._test_eval_ids is not None:
            test_eval_rgb = test_eval_rgb[self._test_eval_ids]
        self._train_rgbs_scaled = scale(train_eval_rgb)
        self._test_rgbs_scaled = scale(test_eval_rgb)

        if self._tb is not None:
            self._tb.write_image("Train/rgb_ground_truth", self._train_data.rgb, 0)
            self._tb.write_image("Test/rgb_ground_truth", self._test_data.rgb, 0)
            # Depth visualizations (reference :139-141) — viz only, never loss.
            near, far = self._config.rendering.depth_range
            train_depth_viz = np.stack(
                [depth2rgb(d, near, far) for d in self._train_data.depth]
            )
            self._tb.write_image(
                "Train/depth_ground_truth", train_depth_viz / 255.0, 0
            )

    def initialize_models(self) -> None:
        cfg = self._config
        self._optimizer = make_optimizer(
            cfg.training.learning_rate,
            cfg.training.learning_rate_decay_rate,
            cfg.training.learning_rate_decay_steps,
        )
        prop_spec = None
        if self._settings.use_proposal:
            from nerf_workspaces_explorer_tpu.render.proposal import proposal_spec

            prop_spec = proposal_spec(self._settings.proposal_num_freqs)
        self._state = init_train_state(
            jax.random.fold_in(self._base_key, 17), self._spec, self._optimizer,
            proposal_spec=prop_spec,
        )
        self._train_step = make_train_step(
            self._settings,
            self._spec,
            self._optimizer,
            cfg.rendering.n_rays,
            mesh=self._mesh,
            field_impl=self._field_impl,
        )
        if self._steps_per_call > 1:
            self._fast_step = make_train_step(
                self._settings,
                self._spec,
                self._optimizer,
                cfg.rendering.n_rays,
                mesh=self._mesh,
                field_impl=self._field_impl,
                steps_per_call=self._steps_per_call,
            )

    def initialize_rays(self) -> None:
        """Precompute per-image ray bundles (train full-res, vis/test scaled),
        kept on device (reference :243-263)."""
        cfg = self._config
        near, far = cfg.rendering.depth_range

        def rays_for(poses: np.ndarray, h: int, w: int) -> RayBundle:
            fx = w / 2.0 / np.tan(np.radians(self._hfov / 2.0))
            return create_rays(
                jnp.asarray(poses), h, w, fx, fx, (w - 1.0) / 2.0, (h - 1.0) / 2.0,
                near, far,
            )

        self.rays_train = rays_for(
            self._train_data.camera_pose, self._img_h, self._img_w
        )
        vis_poses = self._train_data.camera_pose
        if self._train_eval_ids is not None:
            vis_poses = vis_poses[self._train_eval_ids]
        test_poses = self._test_data.camera_pose
        if self._test_eval_ids is not None:
            test_poses = test_poses[self._test_eval_ids]
        self.rays_vis = rays_for(vis_poses, self._img_h_scaled, self._img_w_scaled)
        self.rays_test = rays_for(test_poses, self._img_h_scaled, self._img_w_scaled)

    def setup(self) -> None:
        self.prepare_data()
        self.initialize_models()
        self.initialize_rays()

    # ------------------------------------------------------------------ #
    # Step loop (reference step(), …training_handler.py:265-339)
    # ------------------------------------------------------------------ #

    def step(self, global_step: int) -> Dict[str, Any]:
        """One optimization step plus cadenced logging/eval/checkpointing."""
        cfg = self._config
        with self.timer.phase("train_step"):
            self._state, metrics = self._train_step(
                self._state, self.rays_train, self._train_rgbs, self._base_key
            )

        log = cfg.logging
        if log.step_log_print > 0 and global_step % log.step_log_print == 0:
            scalars = {
                k: float(v) for k, v in metrics.items() if np.ndim(v) == 0
            }
            print(
                f"[TRAIN] Iter: {global_step} "
                f"Loss: {scalars['total_loss']:.6f}, "
                f"rgb_coarse: {scalars['rgb_loss_coarse']:.6f}, "
                f"rgb_fine: {scalars['rgb_loss_fine']:.6f}, "
                f"PSNR_coarse: {scalars['psnr_coarse']:.3f}, "
                f"PSNR_fine: {scalars['psnr_fine']:.3f}"
            )

        if self._tb is not None and global_step % log.step_log_tensorboard == 0:
            self._tb.write_scalars(
                global_step,
                [
                    metrics["rgb_loss_coarse"],
                    metrics["rgb_loss_fine"],
                    metrics["total_loss"],
                ],
                [
                    "Train/Loss/rgb_loss_coarse",
                    "Train/Loss/rgb_loss_fine",
                    "Train/Loss/total_loss",
                ],
            )
            self._tb.write_scalars(
                global_step,
                [metrics["psnr_coarse"], metrics["psnr_fine"]],
                ["Train/Metric/psnr_coarse", "Train/Metric/psnr_fine"],
            )
            self._tb.write_histogram(global_step, metrics["trans_coarse"], "trans_coarse")
            self._tb.write_histogram(global_step, metrics["trans_fine"], "trans_fine")
            # Per-phase wall-clock (framework extension; SURVEY §5 tracing).
            for phase, mean_s in self.timer.summary().items():
                self._tb.write_scalars(
                    global_step, [mean_s * 1000.0], [f"Perf/{phase}_ms"]
                )

        if log.step_render_train > 0 and global_step % log.step_render_train == 0 and global_step > 0:
            self.render_train_images(global_step)
        if log.step_render_test > 0 and global_step % log.step_render_test == 0 and global_step > 0:
            self.render_test_images(global_step)
        if log.step_save_ckpt > 0 and global_step % log.step_save_ckpt == 0:
            self.save_models_checkpoint(global_step)

        return metrics

    def fit(self, n_iterations: Optional[int] = None, *, start_step: int = 0) -> None:
        """Run the main loop (reference nerf/train.py:48-56).

        With `steps_per_call` K > 1, stretches between cadence boundaries
        (print/TB/eval/ckpt intervals) advance in K-step scanned dispatches;
        steps ON a boundary go through `step()` so every cadence action
        still fires at its exact step. Identical trajectory either way."""
        total = (
            n_iterations
            if n_iterations is not None
            else self._config.training.n_iterations
        )
        K = self._steps_per_call
        if K <= 1 or self._fast_step is None:
            for i in range(start_step, total):
                self.step(i)
            return

        log = self._config.logging
        # Only intervals whose actions can actually fire count as
        # boundaries — a TensorBoard cadence with no writer would otherwise
        # chop dispatches for nothing.
        intervals = [
            v
            for v, active in (
                (log.step_log_print, True),
                (log.step_log_tensorboard, self._tb is not None),
                (log.step_render_train, True),
                (log.step_render_test, True),
                (log.step_save_ckpt, True),
            )
            if v > 0 and active
        ]
        if intervals and min(intervals) < K:
            print(
                f"[Trainer] steps_per_call={K} is limited by the "
                f"{min(intervals)}-step logging cadence; raise the logging "
                f"intervals (the train CLI's --steps-per-call stretches the "
                f"print cadence automatically) to get full scanned batches"
            )
        i = start_step
        while i < total:
            self.step(i)
            i += 1
            boundary = min(
                ((i // v + (1 if i % v else 0)) * v for v in intervals),
                default=total,
            )
            boundary = min(max(boundary, i), total)
            while boundary - i >= K:
                with self.timer.phase("train_step"):
                    self._state, _ = self._fast_step(
                        self._state, self.rays_train, self._train_rgbs,
                        self._base_key,
                    )
                i += K
            while i < boundary:
                self.step(i)
                i += 1

    # ------------------------------------------------------------------ #
    # Eval renders (reference :411-508)
    # ------------------------------------------------------------------ #

    def _group_render_fn(self, group_rays: int):
        """One jitted flat-bundle render, cached per ray-count.

        Eval renders batch every image of a group into a SINGLE dispatch
        (the reference loops per image, …training_handler.py:482-508; a
        per-image loop here pays ~26 ms dispatch per frame on the axon
        tunnel and re-traces per call site)."""
        key = (group_rays, self._use_pallas)
        cached = self._eval_render_jits.get(key)
        if cached is not None:
            return cached
        eval_settings = self._settings.for_eval()
        spec = self._spec
        chunk = min(self._config.model.chunk, group_rays)

        if self._use_pallas:
            from nerf_workspaces_explorer_tpu.ops.pallas_render import (
                render_rays_fused,
            )

            def render_group(params, flat_rays):
                return render_rays_fused(
                    params, flat_rays, eval_settings, spec=spec
                )

        else:

            def render_group(params, flat_rays):
                out = render_rays_chunked(
                    params, flat_rays, eval_settings, spec=spec, chunk=chunk
                )
                return out["rgb_fine"]

        fn = jax.jit(render_group)
        self._eval_render_jits[key] = fn
        return fn

    def _render_image_set(self, rays: RayBundle, save_dir: Optional[str]) -> np.ndarray:
        """Render every image in a precomputed ray set -> [N, H, W, 3].

        Images render in equal-size groups, one jitted dispatch per group
        (capped at ~1M rays so the fine pass's [S, 8, R] z/dist slabs stay
        inside HBM); the last group pads with repeats to avoid a recompile.
        """
        h, w = self._img_h_scaled, self._img_w_scaled
        n_img = rays.origins.shape[0]
        n_pix = h * w
        per_group = min(n_img, max(1, 1_000_000 // n_pix))
        fn = self._group_render_fn(per_group * n_pix)
        images = []
        for start in range(0, n_img, per_group):
            group = RayBundle(
                *(f[start : start + per_group] for f in rays)
            )
            n_group = group.origins.shape[0]
            if n_group < per_group:  # pad the tail group to the jitted size
                pad = per_group - n_group
                group = RayBundle(
                    *(
                        jnp.concatenate([f, jnp.repeat(f[-1:], pad, axis=0)])
                        for f in group
                    )
                )
            rgb = np.asarray(
                fn(self.params, group.reshape(per_group * n_pix))
            ).reshape(per_group, h, w, 3)[:n_group]
            images.append(rgb)
        images = np.concatenate(images, axis=0)
        if save_dir is not None:
            for i, rgb in enumerate(images):
                self._write_png(os.path.join(save_dir, f"rgb_{i:03d}.png"), to8b(rgb))
            self._write_mp4(os.path.join(save_dir, "rgb.mp4"), to8b(images))
        return images

    @staticmethod
    def _write_png(path: str, image: np.ndarray) -> None:
        try:
            import imageio

            imageio.imwrite(path, image)
        except ImportError:
            pass

    _warned_mp4 = False

    @classmethod
    def _write_mp4(cls, path: str, images: np.ndarray) -> None:
        try:
            import imageio

            imageio.mimwrite(path, images, fps=30, quality=8)
        except (ImportError, ValueError, OSError) as exc:
            # Optional capability (needs an imageio ffmpeg backend); PNGs
            # are always written. Say so once instead of failing silently.
            if not cls._warned_mp4:
                cls._warned_mp4 = True
                print(f"(mp4 export unavailable — {type(exc).__name__}: "
                      f"PNG frames are still written)")

    def _eval_split(
        self, tag: str, rays: RayBundle, gt_scaled: np.ndarray, global_step: int, subdir: str
    ) -> float:
        save_dir = os.path.join(self._save_dir, subdir, f"step_{global_step:06d}")
        os.makedirs(save_dir, exist_ok=True)
        with self.timer.phase(f"render_{tag.lower()}"):
            rgbs = self._render_image_set(rays, save_dir)
        mse = float(np.mean((rgbs - gt_scaled) ** 2))
        psnr = float(-10.0 * np.log(mse) / np.log(10.0))
        if self._tb is not None:
            self._tb.write_scalars(
                global_step,
                [psnr, mse],
                [f"{tag}/Metric/batch_PSNR", f"{tag}/Metric/batch_MSE"],
            )
            self._tb.write_image(f"{tag}/rgb", rgbs, global_step)
        return psnr

    def render_train_images(self, global_step: int) -> float:
        return self._eval_split(
            "Train", self.rays_vis, self._train_rgbs_scaled, global_step, "train_render"
        )

    def render_test_images(self, global_step: int) -> float:
        return self._eval_split(
            "Test", self.rays_test, self._test_rgbs_scaled, global_step, "test_render"
        )

    # ------------------------------------------------------------------ #
    # Checkpoint / resume (reference :394-409; resume is an extension)
    # ------------------------------------------------------------------ #

    def save_models_checkpoint(self, global_step: int) -> str:
        ckpt_dir = os.path.join(self._save_dir, "checkpoints")
        os.makedirs(ckpt_dir, exist_ok=True)
        path = os.path.join(ckpt_dir, f"{global_step:06d}.npz")
        save_checkpoint(
            path,
            self.params,
            step=global_step,
            opt_state=self.state.opt_state,
            metadata={"office": self._office_name},
        )
        print(f"Saved checkpoints at {path}")
        return path

    def export_results(self, out_dir: Optional[str] = None) -> list:
        """Export the reference's nine SVG training curves
        (SURVEY.md component 22) from this run's TensorBoard logs."""
        from nerf_workspaces_explorer_tpu.obs.export import (
            export_training_curves,
            scalars_from_tensorboard_logs,
        )

        if out_dir is None:
            out_dir = os.path.join(self._save_dir, "results")
        log_dir = os.path.join(self._save_dir, "tensorboard_logs")
        writer = getattr(self._tb, "summary_writer", None) if self._tb else None
        if writer is not None and hasattr(writer, "scalars") and writer.scalars:
            scalars = writer.scalars  # null-writer in-memory history
        else:
            try:
                scalars = scalars_from_tensorboard_logs(log_dir)
            except Exception:
                scalars = {}
        return export_training_curves(scalars, out_dir)

    def resume_from_checkpoint(self, path: str) -> int:
        """Restore params, optimizer state and step; returns the step."""
        if self._state is None:
            self.initialize_models()
        params, step, opt_state, _ = load_checkpoint(
            path, opt_state_template=self.state.opt_state
        )
        self._state = TrainState(
            params=params,
            opt_state=opt_state if opt_state is not None else self.state.opt_state,
            step=jnp.asarray(step, dtype=jnp.int32),
        )
        return step
