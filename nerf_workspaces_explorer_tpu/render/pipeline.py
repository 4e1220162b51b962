"""Coarse+fine hierarchical NeRF rendering as a single jitted program.

Parity target: the reference's `_volumetric_rendering` orchestration, which
exists twice (inference: nerf/inference/nerf_replica_inference_handler.py:203-277,
training: nerf/training/nerf_replica_training_handler.py:534-618) around
Python chunk loops (`batchify_rays`/`batchify`, utils/batch_utils.py:7-39).

TPU-native design:
  - one pure function traces the whole coarse->importance->fine pipeline into
    a single XLA program; there is no Python-level point-chunking
    (`net_chunk`) because XLA tiles the MLP matmuls onto the MXU itself;
  - ray-level chunking for full frames is `jax.lax.map` over equal static
    tiles (no data-dependent shapes), replacing utils/batch_utils.py:7-25;
  - randomness (stratified perturb, sigma noise, stochastic importance
    sampling) is explicit via threaded PRNG keys instead of global state;
  - quirk preservation: the reference inference path always uses
    deterministic importance samples (`det=(perturb==0.) or True`,
    …inference_handler.py:238) and forces raw_noise_std=0
    (…inference_handler.py:225); `eval_settings()` reproduces both.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from nerf_workspaces_explorer_tpu.models.encoding import positional_encoding
from nerf_workspaces_explorer_tpu.models.mlp import NerfMLPSpec, apply_nerf_mlp
from nerf_workspaces_explorer_tpu.rays.raygen import RayBundle
from nerf_workspaces_explorer_tpu.rays.sampling import (
    coarse_z_vals,
    merge_sorted_z,
    sample_pdf,
    stratified_perturb,
)
from nerf_workspaces_explorer_tpu.render.volume import composite_rays


class RenderSettings(NamedTuple):
    """Static rendering hyperparameters (hashable -> jit-static).

    Defaults follow reference office_tokyo_config.yaml:20-31.
    """

    n_samples: int = 64
    n_importance: int = 128
    perturb: float = 1.0
    raw_noise_std: float = 0.0
    white_background: bool = False
    endpoint_feat: bool = False
    num_freqs_3d: int = 10
    num_freqs_2d: int = 4
    use_view_dirs: bool = True
    train: bool = False  # enables perturb/noise/stochastic importance
    # Field (encode+MLP) implementation: "xla" (reference path, default) or
    # "pallas" (fused custom-VJP kernels — the training fast path).
    field_impl: str = "xla"
    # Proposal-network sampling (extension, see render/proposal.py): replace
    # the coarse 8x256 pass with a tiny density-only net. Off by default —
    # changes sample placement relative to the reference.
    use_proposal: bool = False
    proposal_num_freqs: int = 6
    # Fine-pass sample placement (extension — the "fast" serving preset):
    # True (default) reproduces the reference's sort(cat(z_vals, z_samples))
    # (…inference_handler.py:243) — the fine net re-evaluates all coarse
    # depths. False evaluates ONLY the importance samples in the fine pass
    # (n_samples + n_importance -> n_importance fine MLP evals per ray),
    # the standard proposal-sampling placement (mip-NeRF 360); quality-
    # gated by scripts/validate_quality.py --fast-preset.
    merge_coarse: bool = True
    # Coarse/proposal-pass ray subsampling (extension — fused serving path
    # only): run the density pass and importance sampling on every
    # `proposal_subsample`-th ray in each image axis and give all rays of an
    # s x s pixel block the block corner's fine-sample depths. Depth
    # PLACEMENT needs far less angular resolution than radiance — the fine
    # pass still evaluates every true ray, only where it places its samples
    # is shared. 1 (default) = exact per-ray placement; 2 cuts the
    # coarse+importance stage cost ~4x. Takes effect only when the fused
    # renderer knows the ray grid (`render_rays_fused(grid_hw=...)`) and the
    # grid divides; otherwise ignored. Quality-gated by
    # scripts/validate_quality.py --prop-subsample.
    proposal_subsample: int = 1

    @property
    def deterministic_importance(self) -> bool:
        # Reference: det = (perturb == 0.) or (not train_mode)
        # (…training_handler.py:579); inference is always det
        # (…inference_handler.py:238).
        return (self.perturb == 0.0) or (not self.train)

    def for_eval(self) -> "RenderSettings":
        """Inference variant: no perturbation, no sigma noise, det sampling."""
        return self._replace(train=False, raw_noise_std=0.0)


def _eval_network(
    params: Dict[str, Any],
    spec: NerfMLPSpec,
    pts: jnp.ndarray,
    viewdirs: Optional[jnp.ndarray],
    settings: RenderSettings,
    *,
    show_endpoint: bool = False,
) -> jnp.ndarray:
    """Encode sample points (+ per-ray viewdirs) and apply the MLP.

    Equivalent of reference run_network (model_utils.py:13-30) minus the
    Python `batchify` loop.

    Args:
      pts: [R, S, 3] world-space sample positions.
      viewdirs: [R, 3] unit view directions or None.
    Returns:
      [R, S, out] raw predictions.
    """
    if settings.field_impl == "pallas":
        assert settings.use_view_dirs and viewdirs is not None
        assert not show_endpoint, "endpoint features use the xla field path"
        # The fused field derives its encoding from spec.input_ch* — fail
        # loudly if the settings disagree (the xla path would error on the
        # dot shapes; silence here would train with the wrong frequencies).
        assert 3 * (1 + 2 * settings.num_freqs_3d) == spec.input_ch, (
            f"settings.num_freqs_3d={settings.num_freqs_3d} inconsistent "
            f"with spec.input_ch={spec.input_ch}"
        )
        assert 3 * (1 + 2 * settings.num_freqs_2d) == spec.input_ch_views, (
            f"settings.num_freqs_2d={settings.num_freqs_2d} inconsistent "
            f"with spec.input_ch_views={spec.input_ch_views}"
        )
        from nerf_workspaces_explorer_tpu.ops.pallas_train import make_field_train_fn

        field = make_field_train_fn(spec)
        n_rays, n_samples = pts.shape[0], pts.shape[1]
        pts_flat = pts.reshape(-1, 3)
        views_flat = jnp.broadcast_to(
            viewdirs[:, None, :], (n_rays, n_samples, 3)
        ).reshape(-1, 3)
        return field(params, pts_flat, views_flat).reshape(n_rays, n_samples, 4)

    encoded_pts = positional_encoding(pts, settings.num_freqs_3d, scalar_factor=10.0)
    encoded_views = None
    if settings.use_view_dirs:
        assert viewdirs is not None
        encoded_v = positional_encoding(viewdirs, settings.num_freqs_2d, scalar_factor=1.0)
        encoded_views = jnp.broadcast_to(
            encoded_v[:, None, :], (pts.shape[0], pts.shape[1], encoded_v.shape[-1])
        )
    return apply_nerf_mlp(
        params, spec, encoded_pts, encoded_views, show_endpoint=show_endpoint
    )


def render_ray_bundle(
    params: Dict[str, Any],
    rays: RayBundle,
    settings: RenderSettings,
    *,
    spec: Optional[NerfMLPSpec] = None,
    key: Optional[jax.Array] = None,
    full_outputs: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Render a flat bundle of rays through the coarse+fine pipeline.

    Args:
      params: {"coarse": Params, "fine": Params}.
      rays: RayBundle with batch shape [R].
      key: PRNG key; required when settings.train and perturb/noise active.
      full_outputs: include raw/weights/aux maps (training + parity tests);
        False keeps only the fine rgb/depth/disp/acc (fast inference path).

    Returns a dict with the reference's output names
    (…inference_handler.py:256-268).
    """
    if spec is None:
        spec = NerfMLPSpec(use_view_dirs=settings.use_view_dirs)

    perturb_key = noise_key_c = noise_key_f = importance_key = None
    if settings.train:
        if key is None:
            raise ValueError("training-mode rendering requires a PRNG key")
        perturb_key, noise_key_c, noise_key_f, importance_key = jax.random.split(key, 4)

    z_vals = coarse_z_vals(rays.near, rays.far, settings.n_samples)  # [R, S]
    if settings.train and settings.perturb > 0.0:
        z_vals = stratified_perturb(z_vals, perturb_key)

    viewdirs = rays.viewdirs if settings.use_view_dirs else None
    noise_std = settings.raw_noise_std if settings.train else 0.0

    pts_coarse = (
        rays.origins[..., None, :] + rays.dirs[..., None, :] * z_vals[..., :, None]
    )  # [R, S, 3]
    if settings.use_proposal:
        # Extension: tiny density-only proposal net instead of the coarse
        # 8x256 network (render/proposal.py). Its rgb logits are meaningless
        # and its sigma drives the importance weights.
        from nerf_workspaces_explorer_tpu.render.proposal import proposal_spec

        prop_spec = proposal_spec(settings.proposal_num_freqs)
        prop_settings = settings._replace(
            num_freqs_3d=settings.proposal_num_freqs, num_freqs_2d=2
        )
        raw_coarse = _eval_network(
            params["proposal"], prop_spec, pts_coarse, viewdirs, prop_settings
        )
    else:
        raw_coarse = _eval_network(params["coarse"], spec, pts_coarse, viewdirs, settings)
    out_coarse = composite_rays(
        raw_coarse,
        z_vals,
        rays.dirs,
        raw_noise_std=noise_std,
        noise_key=noise_key_c,
        white_background=settings.white_background,
        endpoint_feat=False,
    )

    outputs: Dict[str, jnp.ndarray] = {}

    if settings.n_importance > 0:
        z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        z_samples = sample_pdf(
            z_mid,
            out_coarse.weights[..., 1:-1],
            settings.n_importance,
            key=importance_key,
            deterministic=settings.deterministic_importance,
        )
        z_samples = jax.lax.stop_gradient(z_samples)
        if settings.merge_coarse:
            z_fine = merge_sorted_z(z_vals, z_samples)  # [R, S + I]
        else:
            # Fast preset: the fine net sees only the importance samples.
            # Deterministic samples are already ascending (the inverse CDF
            # is monotone in u); random (training) samples need the sort.
            z_fine = (
                z_samples
                if settings.deterministic_importance
                else jnp.sort(z_samples, axis=-1)
            )

        pts_fine = (
            rays.origins[..., None, :] + rays.dirs[..., None, :] * z_fine[..., :, None]
        )
        raw_fine = _eval_network(
            params["fine"],
            spec,
            pts_fine,
            viewdirs,
            settings,
            show_endpoint=settings.endpoint_feat,
        )
        out_fine = composite_rays(
            raw_fine,
            z_fine,
            rays.dirs,
            raw_noise_std=noise_std,
            noise_key=noise_key_f,
            white_background=settings.white_background,
            endpoint_feat=settings.endpoint_feat,
        )

        outputs["rgb_fine"] = out_fine.rgb
        outputs["disp_fine"] = out_fine.disp
        outputs["acc_fine"] = out_fine.acc
        outputs["depth_fine"] = out_fine.depth
        if full_outputs:
            outputs["raw_fine"] = raw_fine
            outputs["weights_fine"] = out_fine.weights
            outputs["z_vals_fine"] = z_fine
            outputs["z_std"] = jnp.std(z_samples, axis=-1)
            if settings.endpoint_feat:
                outputs["feat_map_fine"] = out_fine.feature

    if full_outputs or settings.n_importance == 0:
        outputs["rgb_coarse"] = out_coarse.rgb
        outputs["disp_coarse"] = out_coarse.disp
        outputs["acc_coarse"] = out_coarse.acc
        outputs["depth_coarse"] = out_coarse.depth
        if full_outputs:
            outputs["raw_coarse"] = raw_coarse
            outputs["weights_coarse"] = out_coarse.weights
            outputs["z_vals_coarse"] = z_vals

    return outputs


def render_rays_chunked(
    params: Dict[str, Any],
    rays: RayBundle,
    settings: RenderSettings,
    *,
    spec: Optional[NerfMLPSpec] = None,
    chunk: int = 8192,
    full_outputs: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Render a large flat bundle in fixed-size tiles via `jax.lax.map`.

    Replaces the reference's Python chunk loop (utils/batch_utils.py:7-25;
    inference chunk 8192 per office_tokyo_config.yaml:41). The ray count is
    padded to a multiple of `chunk` so every tile has the same static shape —
    one compiled program, reused across tiles and frames.
    """
    n = rays.origins.shape[0]
    n_chunks = -(-n // chunk)
    padded = n_chunks * chunk

    def pad(x: jnp.ndarray) -> jnp.ndarray:
        # edge-mode: padded lanes re-render the last real ray, keeping every
        # lane finite (zero-padding would put 0/0 NaNs in discarded outputs).
        return jnp.pad(x, ((0, padded - n), (0, 0)), mode="edge")

    rays_padded = RayBundle(*(pad(field) for field in rays))
    tiled = rays_padded.reshape(n_chunks, chunk)

    def render_tile(tile: RayBundle) -> Dict[str, jnp.ndarray]:
        return render_ray_bundle(
            params, tile, settings.for_eval(), spec=spec, full_outputs=full_outputs
        )

    out = jax.lax.map(render_tile, tiled)
    return {k: v.reshape(padded, *v.shape[2:])[:n] for k, v in out.items()}
