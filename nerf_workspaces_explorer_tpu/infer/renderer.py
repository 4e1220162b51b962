"""Full-frame NeRF inference: camera pose -> rendered image.

Parity target: reference NeRFReplicaInferenceHandler
(nerf/inference/nerf_replica_inference_handler.py:23-277): config + checkpoint
loading, coarse+fine model construction, `render_coordinates(init, coord)` ->
uint8 [H, W, 3].

TPU-native design:
  - the whole pose->image pipeline below ray creation is ONE jitted program
    (ray gen, chunk map, coarse+fine MLP, compositing); the host only builds
    the 4x4 pose matrix and converts the final frame to uint8;
  - chunking is `jax.lax.map` over static tiles inside the jit, not a Python
    loop (replaces utils/batch_utils.py:7-25);
  - dispatch is async: `render_pose` returns as soon as XLA enqueues the
    program; blocking happens only when the caller materializes the ndarray;
  - three precision modes: "parity" (fp32 params, highest matmul precision
    — matches the reference CUDA render within PSNR tolerance), "fast"
    (bf16 matmul inputs on the MXU), and "int8" (int8 MLP trunk on the MXU
    at 2x bf16 throughput, statically calibrated per checkpoint —
    ops/quantize.py; requires the fused kernel path);
  - optional multi-chip ray sharding via `parallel.shard_render` (rays are
    embarrassingly parallel across a mesh).
"""

from __future__ import annotations

import os
from collections import OrderedDict
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from nerf_workspaces_explorer_tpu.camera.poses import poses_from_coordinates
from nerf_workspaces_explorer_tpu.core.config import FrameworkConfig, load_config
from nerf_workspaces_explorer_tpu.core.types import COORD
from nerf_workspaces_explorer_tpu.infer.checkpoint import (
    load_checkpoint,
    load_torch_checkpoint,
)
from nerf_workspaces_explorer_tpu.models.encoding import embedding_output_dim
from nerf_workspaces_explorer_tpu.models.mlp import NerfMLPSpec, init_nerf_params
from nerf_workspaces_explorer_tpu.rays.raygen import create_rays
from nerf_workspaces_explorer_tpu.render.pipeline import (
    RenderSettings,
    render_rays_chunked,
)
from nerf_workspaces_explorer_tpu.utils.metrics import to8b


def settings_from_config(cfg: FrameworkConfig, *, train: bool = False) -> RenderSettings:
    return RenderSettings(
        n_samples=cfg.rendering.n_samples,
        n_importance=cfg.rendering.n_importance,
        perturb=cfg.rendering.perturb,
        raw_noise_std=cfg.rendering.raw_noise_std,
        white_background=cfg.rendering.white_background,
        endpoint_feat=cfg.experiment.endpoint_feat,
        num_freqs_3d=cfg.rendering.num_freqs_3d,
        num_freqs_2d=cfg.rendering.num_freqs_2d,
        use_view_dirs=cfg.rendering.use_view_dirs,
        train=train,
    )


def spec_from_config(cfg: FrameworkConfig) -> NerfMLPSpec:
    return NerfMLPSpec(
        depth=cfg.model.net_depth,
        width=cfg.model.net_width,
        input_ch=embedding_output_dim(cfg.rendering.num_freqs_3d),
        input_ch_views=(
            embedding_output_dim(cfg.rendering.num_freqs_2d)
            if cfg.rendering.use_view_dirs
            else 0
        ),
        use_view_dirs=cfg.rendering.use_view_dirs,
    )


# Compiled render-fn cache shared across NeRFRenderer instances (see
# NeRFRenderer._jit_cache_key). Keys are fully-static configs; values are
# (float_jit, uint8_jit) pairs whose params/pose are arguments. LRU with a
# size cap: every int8 recalibration (set_params on a live renderer) mints
# a new quant key, so an unbounded dict would leak compiled programs over a
# long GUI/live-training session. Evicted entries stay valid for renderers
# that already hold them — they just stop being shared.
_RENDER_JIT_CACHE: "OrderedDict[Any, Any]" = OrderedDict()
_RENDER_JIT_CACHE_MAX = 16

def _render_c2w_batch_impl(
    params: Dict[str, Any],
    c2ws: jnp.ndarray,
    *,
    cfg: FrameworkConfig,
    settings: RenderSettings,
    spec: NerfMLPSpec,
    precision: str,
    chunk: int,
    use_pallas: bool,
    mesh,
    quant,
    early_stop_eps: float,
    sort_rays: bool,
    full_outputs: bool = False,
    cy_override: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Traceable pose-batch -> frames body shared by the single-frame and
    batched jits (pure: all statics are explicit arguments so jitted
    programs never capture a live renderer). Dispatch: fused Pallas kernel
    (TPU production path), mesh-sharded rays, or the chunked jnp
    pipeline. With `full_outputs` returns the reference's render dict
    (rgb/disp/acc/depth — …inference_handler.py:256-268) instead of the
    rgb frame alone (the --nan-debug scan surface)."""
    h, w = cfg.experiment.image_height, cfg.experiment.image_width
    near, far = cfg.rendering.depth_range
    matmul_precision = "highest" if precision == "parity" else "default"

    with jax.default_matmul_precision(matmul_precision):
        n = c2ws.shape[0]
        # cy_override lets the strip-pipelined frame path render rows
        # [r0, r0 + h) of a taller image through this same body: the strip
        # is just the full image's pinhole grid with cy shifted by -r0
        # (traced scalar, so every strip shares ONE compiled program).
        cy = cfg.cy if cy_override is None else cy_override
        rays = create_rays(
            c2ws, h, w, cfg.fx, cfg.fy, cfg.cx, cy, near, far
        ).reshape(n * h * w)
        if use_pallas:
            # The fused kernel manages its own precision: fp32 ray math
            # and encoding phases, bf16 MXU matmuls.
            from nerf_workspaces_explorer_tpu.ops.pallas_render import (
                render_rays_fused,
            )

            fused = render_rays_fused(
                params, rays, settings, spec=spec,
                quant=quant, early_stop_eps=early_stop_eps,
                sort_rays=sort_rays, full=full_outputs,
                # The flat ray axis is n frames of h rows stacked row-major:
                # an (n*h, w) grid (proposal_subsample blocks never straddle
                # frames when h divides by the stride).
                grid_hw=(n * h, w),
            )
            if full_outputs:
                out = {
                    "rgb_fine": fused.rgb,
                    "disp_fine": fused.disp[:, None],
                    "acc_fine": fused.acc[:, None],
                    "depth_fine": fused.depth[:, None],
                }
            else:
                rgb = fused
        else:
            if precision == "fast":
                rays = jax.tree.map(lambda x: x.astype(jnp.bfloat16), rays)
            if mesh is not None:
                from nerf_workspaces_explorer_tpu.parallel.sharding import (
                    shard_render,
                )

                out = shard_render(
                    params, rays, settings, mesh, spec=spec, chunk=chunk,
                    early_stop_eps=early_stop_eps, sort_rays=sort_rays,
                )
            else:
                out = render_rays_chunked(
                    params, rays, settings, spec=spec, chunk=chunk
                )
            rgb = out.get("rgb_fine", out.get("rgb_coarse"))
        if full_outputs:
            return {
                k: v.astype(jnp.float32).reshape(n, h, w, *v.shape[1:])
                for k, v in out.items()
            }
        return rgb.astype(jnp.float32).reshape(n, h, w, 3)



class NeRFRenderer:
    """Pose -> frame renderer for one workspace's trained NeRF."""

    def __init__(
        self,
        office_name: str,
        ckpt_path: Optional[str] = None,
        *,
        config: Optional[FrameworkConfig] = None,
        precision: str = "parity",
        chunk: Optional[int] = None,
        use_pallas: Optional[bool] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
        use_proposal: bool = False,
        nan_debug: bool = False,
        early_stop_eps: float = 1e-3,
        sort_rays: bool = False,
        preset: str = "reference",
        n_importance: Optional[int] = None,
        proposal_subsample: Optional[int] = None,
    ) -> None:
        self._office_name = office_name
        self._nan_debug = nan_debug
        # Saturation-ordered fine pass (fused path only): cluster rays by
        # coarse saturation depth so tile-granular early termination fires
        # sooner. Exact up to eps (per-ray independence).
        self._sort_rays = sort_rays
        # Fused-kernel early ray termination: samples past transmittance
        # < eps are skipped; the committed rgb error is bounded by eps
        # (1e-3 < half a uint8 step; measured SSIM-identical to 1e-4 on
        # trained scenes, ~7% faster frames).
        self._early_stop_eps = early_stop_eps
        self._ckpt_path = ckpt_path
        self._config = config if config is not None else load_config(office_name=office_name)
        self._precision = precision
        self._chunk = chunk if chunk is not None else self._config.inference.chunk
        if use_pallas is None:
            # The fused kernel is the production path on TPU; the jnp
            # pipeline serves CPU runs and fp32 "parity" verification.
            use_pallas = (
                jax.devices()[0].platform == "tpu" and precision != "parity"
            )
        if precision in ("int8", "int8-trunk") and not use_pallas:
            raise ValueError(
                f"precision={precision!r} runs the int8 trunk inside the "
                "fused Pallas kernel; it requires use_pallas=True"
            )
        self._use_pallas = use_pallas
        self._quant = None
        self._mesh = mesh

        self._spec = spec_from_config(self._config)
        self._settings = settings_from_config(self._config).for_eval()
        if use_proposal:
            self._settings = self._settings._replace(use_proposal=True)
        if preset not in ("reference", "fast", "turbo"):
            raise ValueError(f"unknown preset {preset!r} (reference|fast|turbo)")
        self._preset = preset
        if preset == "fast":
            # Quality-gated fast serving preset: the fine pass evaluates
            # ONLY the importance samples (the reference re-evaluates the
            # uniform coarse depths through the fine net purely to mirror
            # sort(cat(z_vals, z_samples)), …inference_handler.py:243).
            # Gate: scripts/validate_quality.py --fast-preset.
            # SCENE-CONDITIONED: importance-only placement passes on the
            # free-floating orbit scene (reports/quality_gate_20k.md) but
            # FAILS interiors — -2.38 dB vs merged placement on the room
            # walkthrough (31.02 vs 33.40 dB at n_importance=128,
            # reports/quality_gate_room_fast_partial.md) — because interior
            # frusta see density everywhere and the merged uniform
            # samples carry real signal. For interior content (all four
            # shipped offices) serve "reference" (the default) or a
            # gated "turbo" student instead.
            self._settings = self._settings._replace(merge_coarse=False)
            if use_proposal and use_pallas:
                # Proposal-guided fast serving also defaults to the
                # stride-4 placement lattice (coarse density + importance
                # CDF on every 4th ray per image axis; fine shading stays
                # per-ray exact). Gate: validate_quality.py
                # --prop-subsample 4 at 20k steps, -0.02 dB
                # (reports/quality_gate_subsample4_20k.md). The explicit
                # `proposal_subsample` ctor arg below still overrides
                # (pass 1 for exact placement).
                self._settings = self._settings._replace(proposal_subsample=4)
        if preset == "turbo":
            # Distilled-student serving preset: a narrow proposal-mode
            # student (train/distill.py) compressed offline from this
            # workspace's checkpoint. The student architecture is whatever
            # the sidecar metadata says — the spec/settings statics are
            # rebuilt from it here, before any weights load. Gate:
            # scripts/validate_quality.py --turbo.
            from nerf_workspaces_explorer_tpu.train.distill import (
                read_turbo_metadata,
                student_spec_from_meta,
                turbo_sidecar_path,
            )

            if ckpt_path is None:
                raise ValueError("preset='turbo' requires a checkpoint path")
            self._turbo_path = turbo_sidecar_path(ckpt_path)
            if not os.path.exists(self._turbo_path):
                raise RuntimeError(
                    f"turbo sidecar {self._turbo_path} not found — distill "
                    "one first: python -m nerf_workspaces_explorer_tpu.cli."
                    f"distill --office {office_name}"
                )
            meta = read_turbo_metadata(self._turbo_path)
            self._spec, student = student_spec_from_meta(meta)
            self._settings = self._settings._replace(
                use_proposal=True,
                merge_coarse=False,
                n_samples=int(student.get("n_samples", 64)),
                n_importance=int(student["n_importance"]),
                num_freqs_3d=int(student["num_freqs_3d"]),
                num_freqs_2d=int(student.get("num_freqs_2d", 4)),
                proposal_num_freqs=int(student.get("proposal_num_freqs", 6)),
                # Serving placement stride the student was quality-gated
                # at (validate_quality.py --prop-subsample); the explicit
                # `proposal_subsample` ctor arg below still overrides.
                proposal_subsample=int(student.get("proposal_subsample", 1)),
            )
        if n_importance is not None:
            self._settings = self._settings._replace(n_importance=n_importance)
        if proposal_subsample is not None:
            # Coarse-pass ray-lattice stride (RenderSettings docs): the
            # density/importance stage runs on every s-th ray per image
            # axis; the fine pass shares each s x s block's depth
            # placement. Implemented in the fused kernel path only.
            if int(proposal_subsample) > 1 and not use_pallas:
                import warnings

                warnings.warn(
                    "proposal_subsample > 1 only affects the fused Pallas "
                    "path (use_pallas=True); the jnp pipeline renders with "
                    "exact per-ray placement",
                    stacklevel=2,
                )
            self._settings = self._settings._replace(
                proposal_subsample=int(proposal_subsample)
            )
        self._params: Optional[Dict[str, Any]] = None
        self._render_jit = None
        self._render_uint8_jit = None
        self._render_batch_jit = None
        self._render_full_jit = None
        self._preview_jits: Dict[int, Any] = {}
        self._strip_jits: Dict[int, Any] = {}

    @property
    def config(self) -> FrameworkConfig:
        return self._config

    @property
    def params(self) -> Optional[Dict[str, Any]]:
        return self._params

    def initialize_models(self, *, allow_random_init: bool = False, seed: int = 0) -> None:
        """Load checkpoint weights (torch `.ckpt` or native `.npz`).

        Mirrors reference initialize_models (…inference_handler.py:88-148),
        including its RuntimeError on a missing checkpoint — unless
        `allow_random_init` (a framework extension for testing/benchmarks).
        """
        if self._preset == "turbo":
            # The sidecar's existence was checked in __init__ (the static
            # spec/settings come from its metadata).
            from nerf_workspaces_explorer_tpu.train.distill import (
                load_turbo_checkpoint,
            )

            self._params, _ = load_turbo_checkpoint(self._turbo_path)
        elif self._ckpt_path is not None and os.path.exists(self._ckpt_path):
            if self._ckpt_path.endswith(".ckpt"):
                coarse, fine, _ = load_torch_checkpoint(self._ckpt_path)
                self._params = {"coarse": coarse, "fine": fine}
            else:
                # Native checkpoints carry their net keys verbatim (coarse/
                # fine, or proposal/fine for proposal-mode models).
                params, _, _, _ = load_checkpoint(self._ckpt_path)
                self._params = params
        elif allow_random_init:
            k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
            if self._settings.use_proposal:
                from nerf_workspaces_explorer_tpu.render.proposal import (
                    proposal_spec,
                )

                self._params = {
                    "proposal": init_nerf_params(
                        k1, proposal_spec(self._settings.proposal_num_freqs)
                    ),
                    "fine": init_nerf_params(k2, self._spec),
                }
            else:
                self._params = {
                    "coarse": init_nerf_params(k1, self._spec),
                    "fine": init_nerf_params(k2, self._spec),
                }
        else:
            raise RuntimeError(
                f"Checkpoint path: {self._ckpt_path} for model cannot be found!"
            )

        if self._precision == "fast":
            self._params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16), self._params
            )
        self._build_render_fn()

    def set_params(self, params: Dict[str, Any]) -> None:
        """Install externally provided params (e.g. live from a trainer)."""
        self._params = params
        self._build_render_fn()

    def _jit_cache_key(self):
        """Static configuration that fully determines the traced program.

        Params are jit ARGUMENTS, so renderers whose statics match (the
        four shipped offices use identical YAMLs) can share ONE compiled
        executable — without this, every workspace switch in the GUI pays
        a fresh multi-minute Pallas compile. int8 mode bakes the
        calibration scales into the compile, so the quant NamedTuples
        (plain floats, hashable) join the key: same checkpoint -> shared,
        different weights -> separate, as required. Mesh-sharded renderers
        never share (mesh identity isn't part of the key).
        """
        if self._mesh is not None:
            return None
        cfg = self._config
        quant_key = None
        if self._quant is not None:
            quant_key = tuple(sorted(self._quant.items()))
        return (
            cfg.experiment.image_height,
            cfg.experiment.image_width,
            cfg.fx, cfg.fy, cfg.cx, cfg.cy,
            cfg.rendering.depth_range,
            self._settings,
            self._spec,
            self._precision,
            self._chunk,
            self._use_pallas,
            self._early_stop_eps,
            self._sort_rays,
            quant_key,
        )

    def _build_render_fn(self) -> None:
        if self._precision in ("int8", "int8-trunk"):
            # Static int8 calibration runs once, eagerly, on the concrete
            # weights; the resulting scales bake into the kernel compile.
            # "int8-trunk" quantizes only the trunk matmuls (~80% of the
            # fine-pass MACs) and keeps the fa/view/rgb heads bf16 — the
            # higher-fidelity tier when full int8 misses the 0.99 SSIM
            # reference-parity gate (reports/reference_parity_320x240.md).
            from nerf_workspaces_explorer_tpu.ops.quantize import (
                calibrate_model_quant,
            )

            self._quant = calibrate_model_quant(
                self._params, self._spec, heads=self._precision == "int8"
            )
        # Weights (and so int8 calibration) may have changed: drop every
        # jit built against the previous state.
        self._render_batch_jit = None
        self._render_full_jit = None
        self._preview_jits = {}
        self._strip_jits = {}
        key = self._jit_cache_key()
        cached = _RENDER_JIT_CACHE.get(key) if key is not None else None
        if cached is not None:
            _RENDER_JIT_CACHE.move_to_end(key)
            # The strip dict is shared BY REFERENCE: a strip program built
            # lazily by one renderer becomes visible to every renderer on
            # the same static key.
            self._render_jit, self._render_uint8_jit, self._strip_jits = cached
            return
        body = self._frozen_batch_body()
        self._render_jit = jax.jit(lambda params, c2w: body(params, c2w[None])[0])
        # uint8 product path: quantize ON DEVICE (reference to8b_np,
        # model_utils.py:10) so a frame crosses the host link as 1 byte per
        # channel instead of 4 — the GUI/CLI consume uint8 anyway.
        self._render_uint8_jit = jax.jit(
            lambda params, c2w: jnp.floor(
                255.0 * jnp.clip(body(params, c2w[None])[0], 0.0, 1.0)
            ).astype(jnp.uint8)
        )
        if key is not None:
            _RENDER_JIT_CACHE[key] = (
                self._render_jit, self._render_uint8_jit, self._strip_jits,
            )
            while len(_RENDER_JIT_CACHE) > _RENDER_JIT_CACHE_MAX:
                _RENDER_JIT_CACHE.popitem(last=False)

    def _frozen_batch_body(self):
        """Snapshot the current static render state into a pure callable.

        Every jitted render fn closes over this SNAPSHOT, never over
        `self`: a cached executable's behavior is then fully determined by
        the state it was built from (the shared-cache key), and later
        mutations of any renderer (set_params recalibrating int8 scales)
        cannot leak into an already-built program.
        """
        import functools

        return functools.partial(
            _render_c2w_batch_impl,
            cfg=self._config,
            settings=self._settings,
            spec=self._spec,
            precision=self._precision,
            chunk=self._chunk,
            use_pallas=self._use_pallas,
            mesh=self._mesh,
            quant=self._quant,
            early_stop_eps=self._early_stop_eps,
            sort_rays=self._sort_rays,
        )

    def _render_c2w_batch(self, params: Dict[str, Any], c2ws: jnp.ndarray) -> jnp.ndarray:
        return self._frozen_batch_body()(params, c2ws)

    def warmup(self, preview_n_samples: Sequence[int] = (64,)) -> None:
        """Compile the full-render and preview programs on a dummy pose.

        GUI first-paint protection: without this the first floor-plan click
        pays the Pallas AOT compiles (minutes on a cold process) for both
        the preview and the full frame on the Qt/Tk main thread. Called
        from the explorer constructors right after initialize_models() —
        the step where the user already expects a load pause. Compiled
        programs are shared across workspaces via _RENDER_JIT_CACHE, so
        only the first workspace open pays.
        """
        if self._render_uint8_jit is None:
            raise RuntimeError("initialize_models() must be called before warmup")
        pose = np.eye(4, dtype=np.float32)
        for n in preview_n_samples:
            if n not in self._preview_jits:
                self._preview_jits[n] = self._build_preview_fn(n)
            self._preview_jits[n](
                self._params, jnp.asarray(pose)
            ).block_until_ready()
        self.render_pose_uint8(pose).block_until_ready()

    def render_pose(self, c2w: np.ndarray) -> jax.Array:
        """Render one camera pose; returns a device array [H, W, 3] float32
        (non-blocking — materialize with np.asarray to wait)."""
        if self._render_jit is None:
            raise RuntimeError("initialize_models() must be called before rendering")
        return self._render_jit(self._params, jnp.asarray(c2w, dtype=jnp.float32))

    def render_pose_uint8(self, c2w: np.ndarray) -> jax.Array:
        """Render one camera pose straight to a uint8 [H, W, 3] device array
        (the GUI product path: quantization happens on device, so the host
        transfer is 4x smaller than the float frame)."""
        if self._render_uint8_jit is None:
            raise RuntimeError("initialize_models() must be called before rendering")
        return self._render_uint8_jit(self._params, jnp.asarray(c2w, dtype=jnp.float32))

    def _pick_n_strips(self) -> int:
        """Largest strip count in 6..2 whose strips divide the image height
        AND keep the placement-stride lattice intact (strip height a
        multiple of proposal_subsample, so coarse/importance blocks never
        straddle a strip boundary); 1 when none fits."""
        h = self._config.experiment.image_height
        stride = max(1, int(self._settings.proposal_subsample or 1))
        for n in (6, 5, 4, 3, 2):
            if h % n == 0 and (h // n) % stride == 0:
                return n
        return 1

    def _strip_fn(self, strip_h: int):
        fn = self._strip_jits.get(strip_h)
        if fn is None:
            import dataclasses
            import functools

            cfg = dataclasses.replace(
                self._config,
                experiment=dataclasses.replace(
                    self._config.experiment, image_height=strip_h
                ),
            )
            body = functools.partial(
                _render_c2w_batch_impl,
                cfg=cfg,
                settings=self._settings,
                spec=self._spec,
                precision=self._precision,
                chunk=self._chunk,
                use_pallas=self._use_pallas,
                mesh=self._mesh,
                quant=self._quant,
                early_stop_eps=self._early_stop_eps,
                sort_rays=self._sort_rays,
            )
            fn = jax.jit(
                lambda params, c2w, cy: jnp.floor(
                    255.0
                    * jnp.clip(body(params, c2w[None], cy_override=cy)[0], 0.0, 1.0)
                ).astype(jnp.uint8)
            )
            self._strip_jits[strip_h] = fn
        return fn

    def render_pose_uint8_pipelined(
        self, c2w: np.ndarray, n_strips: Optional[int] = None
    ) -> np.ndarray:
        """Blocking uint8 frame rendered as row strips enqueued back to
        back, with strip k's host download overlapping strip k+1's compute
        (the single-frame analog of `render_poses_uint8_stream`).

        MEASURED LOSER on the tunneled chip and therefore NOT the default
        product path (scripts/profile_pipelined.py, 640x480 turbo frame:
        blocking 129.7 ms vs 168.7/210.2/250.8 ms at 4/6/8 strips) — every
        strip call pays the tunnel's ~26 ms host-side dispatch cost
        SERIALLY, which exceeds the ~30 ms fetch it hides. Kept as an
        opt-in for locally-attached devices where per-call dispatch is
        ~zero and the fetch genuinely pipelines.

        Each strip is the full frame's pinhole grid with cy shifted (one
        shared compiled program), and strip heights stay multiples of the
        placement stride so `proposal_subsample` blocks never straddle a
        strip boundary. Per-ray math is identical; with fused-kernel early
        termination enabled the strip tiling differs from the full-frame
        tiling, so frames agree to the ET bound eps (byte-identical on the
        jnp path / at eps=0)."""
        if self._render_uint8_jit is None:
            raise RuntimeError(
                "initialize_models() must be called before rendering"
            )
        h = self._config.experiment.image_height
        if n_strips is None:
            n_strips = self._pick_n_strips()
        stride = max(1, int(self._settings.proposal_subsample or 1))
        if h % n_strips or (h // n_strips) % stride:
            raise ValueError(
                f"n_strips={n_strips} must divide height {h} into "
                f"stride-{stride}-aligned strips"
            )
        if n_strips == 1:
            return np.asarray(self.render_pose_uint8(c2w))
        strip_h = h // n_strips
        fn = self._strip_fn(strip_h)
        c2w = jnp.asarray(c2w, dtype=jnp.float32)
        cy = self._config.cy
        strips = [
            fn(self._params, c2w, jnp.float32(cy - r0))
            for r0 in range(0, h, strip_h)
        ]
        return np.concatenate([np.asarray(s) for s in strips], axis=0)

    def render_coordinates(self, init_coordinates: COORD, coordinates: COORD) -> np.ndarray:
        """COORD pair -> uint8 [H, W, 3] frame.

        Matches reference render_coordinates (…inference_handler.py:166-185).
        """
        pose = poses_from_coordinates(init_coordinates, [coordinates])[0]
        if self._nan_debug:
            # The reference scans EVERY rendered output for NaN/Inf
            # (…inference_handler.py:273-276); opt-in here because the scan
            # needs the pre-quantization float outputs on the host. The
            # full-outputs program (rgb/disp/acc/depth) is built lazily —
            # it is a different compile from the rgb-only product path.
            from nerf_workspaces_explorer_tpu.obs.debug import (
                scan_outputs_finite,
            )

            if self._render_full_jit is None:
                import functools

                body = functools.partial(
                    self._frozen_batch_body(), full_outputs=True
                )
                self._render_full_jit = jax.jit(
                    lambda params, c2w: jax.tree.map(
                        lambda v: v[0], body(params, c2w[None])
                    )
                )
            out = jax.tree.map(
                np.asarray,
                self._render_full_jit(
                    self._params, jnp.asarray(pose, dtype=jnp.float32)
                ),
            )
            scan_outputs_finite(out)
            return to8b(out["rgb_fine"])
        return np.asarray(self.render_pose_uint8(pose))

    def render_poses(self, c2ws: Sequence[np.ndarray]) -> np.ndarray:
        """Render a batch of poses -> float32 [N, H, W, 3] (eval/tour path).

        All frames render in ONE jitted program (rays of every pose
        flattened into a single bundle), so a camera tour pays dispatch
        and compile cost once (BASELINE.json config 3).
        """
        if self._render_batch_jit is None:
            self._build_batch_render_fn()
        cfg = self._config
        # Cap rays per launch: the fine pass keeps [S, 8, rays] z/dist slabs
        # in HBM (~6 GB per million rays at S=192), so long tours render in
        # equal-size groups that stay well inside the 16 GB chip.
        frames_per_group = max(1, 1_000_000 // cfg.n_pix)
        c2ws = [np.asarray(p) for p in c2ws]
        outputs = []
        for start in range(0, len(c2ws), frames_per_group):
            group = c2ws[start : start + frames_per_group]
            # Pad the last group to the jitted batch size to avoid recompiles.
            pad = frames_per_group - len(group)
            batch = jnp.asarray(
                np.stack(group + [group[-1]] * pad), dtype=jnp.float32
            )
            frames = np.asarray(self._render_batch_jit(self._params, batch))
            outputs.append(frames[: len(group)])
        return np.concatenate(outputs, axis=0)

    def render_coordinates_preview(
        self, init_coordinates: COORD, coordinates: COORD, n_samples: int = 64
    ) -> np.ndarray:
        """Fast single-pass preview frame: COORD pair -> uint8 [H, W, 3].

        Progressive-rendering extension (the reference always renders the
        full hierarchical frame on the Qt main thread, app.py:323-347):
        one network evaluated at `n_samples` uniform depths — with a
        coarse+fine checkpoint the coarse net, which trains on exactly
        this distribution; ~n_samples/192 of the full frame's cost. For a
        proposal checkpoint there is no coarse net and the fine net never
        trains on uniform depths, so the preview runs the cheap proposal
        pass (2x64 density net at `n_samples` uniform depths) followed by
        an importance-only fine pass at n_samples/2 samples — the same
        placement the fine net trains and serves on. The GUIs show this
        immediately and swap in the full render when ready.
        """
        if self._params is None:
            raise RuntimeError("initialize_models() must be called before rendering")
        pose = poses_from_coordinates(init_coordinates, [coordinates])[0]
        fn = self._preview_jits.get(n_samples)
        if fn is None:
            fn = self._preview_jits[n_samples] = self._build_preview_fn(n_samples)
        return np.asarray(fn(self._params, jnp.asarray(pose, dtype=jnp.float32)))

    def _build_preview_fn(self, n_samples: int):
        cfg = self._config
        h, w = cfg.experiment.image_height, cfg.experiment.image_width
        near, far = cfg.rendering.depth_range
        # Snapshot statics: the jitted body must never read live self state
        # (same invariant as _frozen_batch_body).
        settings, spec = self._settings, self._spec
        use_pallas, eps = self._use_pallas, self._early_stop_eps
        has_coarse = "coarse" in self._params
        proposal_preview = not has_coarse and settings.use_proposal
        full_quant = (
            self._quant
            if self._precision in ("int8", "int8-trunk")
            else None
        )
        net = "coarse" if has_coarse else "fine"
        net_quant = (full_quant or {}).get(net)
        from nerf_workspaces_explorer_tpu.ops.pallas_render import (
            render_rays_fused,
            render_rays_single_pass,
        )
        from nerf_workspaces_explorer_tpu.render.pipeline import render_ray_bundle

        # Proposal checkpoints: the fine net trains on importance samples,
        # not uniform depths, so a uniform single-pass preview through it
        # is off-distribution. Instead run the real (cheap) proposal
        # density pass + an importance-only fine pass at half the samples
        # — the fast-preset placement at preview cost.
        proposal_settings = settings.for_eval()._replace(
            n_samples=n_samples,
            n_importance=max(2, n_samples // 2),
            merge_coarse=False,
        )

        def body(params, c2w):
            rays = create_rays(
                c2w[None], h, w, cfg.fx, cfg.fy, cfg.cx, cfg.cy, near, far
            ).reshape(h * w)
            if proposal_preview:
                if use_pallas:
                    rgb = render_rays_fused(
                        params, rays, proposal_settings, spec=spec,
                        quant=full_quant, early_stop_eps=eps,
                    )
                else:
                    rgb = render_ray_bundle(
                        params, rays, proposal_settings, spec=spec,
                        full_outputs=False,
                    )["rgb_fine"]
            elif use_pallas:
                rgb = render_rays_single_pass(
                    params[net], rays, settings, spec=spec,
                    n_samples=n_samples, quant=net_quant,
                    early_stop_eps=eps,
                )
            else:
                out = render_ray_bundle(
                    {"coarse": params[net]},
                    rays,
                    settings.for_eval()._replace(
                        n_importance=0, n_samples=n_samples, use_proposal=False
                    ),
                    spec=spec,
                    full_outputs=False,
                )
                rgb = out["rgb_coarse"]
            return jnp.floor(
                255.0 * jnp.clip(rgb.reshape(h, w, 3), 0.0, 1.0)
            ).astype(jnp.uint8)

        return jax.jit(body)

    def render_poses_uint8_stream(
        self, c2ws: Sequence[np.ndarray], lookahead: int = 2
    ):
        """Yield uint8 [H, W, 3] frames for a pose sequence, pipelined.

        JAX dispatch is asynchronous, so keeping `lookahead` frames in
        flight overlaps the device compute of frame k+1..k+lookahead with
        the host download of frame k — for tour/video export the slow
        host link rides for free behind the kernel (the reference renders
        and downloads each tour frame serially,
        …training_handler.py:482-508). Frames are bitwise identical to
        per-pose `render_pose_uint8` calls.
        """
        if self._render_uint8_jit is None:
            raise RuntimeError("initialize_models() must be called before rendering")
        from collections import deque

        pending: "deque[jax.Array]" = deque()
        for pose in c2ws:
            pending.append(
                self._render_uint8_jit(
                    self._params, jnp.asarray(pose, dtype=jnp.float32)
                )
            )
            if len(pending) > lookahead:
                yield np.asarray(pending.popleft())
        while pending:
            yield np.asarray(pending.popleft())

    def _build_batch_render_fn(self) -> None:
        self._render_batch_jit = jax.jit(self._frozen_batch_body())
