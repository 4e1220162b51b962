"""The jitted NeRF training step.

Parity target: reference NeRFReplicaTrainingHandler.step
(nerf/training/nerf_replica_training_handler.py:265-339) and
`_sample_training_data` (:341-370): sample one random training image and
`n_rays` random pixels, render through the training-mode coarse+fine
pipeline (stratified perturb + sigma noise), take the summed coarse+fine MSE
loss, apply one Adam update with a continuously decayed learning rate
lr * 0.1^(step / 50000) (:312-315).

TPU-native design: the ENTIRE step — pixel sampling, rendering, loss,
backward, optimizer — is one XLA program with donated state; nothing touches
the host between steps. Randomness is a threaded PRNG key (split per step on
device). The precomputed per-image ray tensors the reference keeps on the
GPU (:243-263) are device arrays gathered with dynamic indices inside jit.

Multi-chip: `make_train_step(..., mesh=...)` wraps the step in `shard_map`
over the ray batch axis (pure data parallelism) with a `jax.lax.pmean` over
the loss gradients — the collective rides ICI; params/optimizer state are
replicated.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from nerf_workspaces_explorer_tpu.models.mlp import (
    NerfMLPSpec,
    init_nerf_params,
)
from nerf_workspaces_explorer_tpu.rays.raygen import RayBundle
from nerf_workspaces_explorer_tpu.render.pipeline import (
    RenderSettings,
    render_ray_bundle,
)
from nerf_workspaces_explorer_tpu.utils.metrics import img2mse, mse2psnr


class TrainState(NamedTuple):
    params: Dict[str, Any]  # {"coarse": Params, "fine": Params}
    opt_state: Any
    step: jnp.ndarray  # scalar int32


def make_optimizer(
    learning_rate: float = 5e-4,
    decay_rate: float = 0.1,
    decay_steps: float = 50_000.0,
) -> optax.GradientTransformation:
    """Adam with the reference's continuous exponential decay
    (reference …training_handler.py:234, :312-315)."""
    schedule = optax.exponential_decay(
        init_value=learning_rate,
        transition_steps=decay_steps,
        decay_rate=decay_rate,
        staircase=False,
    )
    return optax.adam(learning_rate=schedule)


def init_train_state(
    key: jax.Array,
    spec: NerfMLPSpec,
    optimizer: optax.GradientTransformation,
    *,
    proposal_spec: Optional[NerfMLPSpec] = None,
) -> TrainState:
    """With `proposal_spec`, the coarse net is replaced by a tiny proposal
    density net (render/proposal.py extension)."""
    k_coarse, k_fine = jax.random.split(key)
    params = {"fine": init_nerf_params(k_fine, spec)}
    if proposal_spec is not None:
        params["proposal"] = init_nerf_params(k_coarse, proposal_spec)
    else:
        params["coarse"] = init_nerf_params(k_coarse, spec)
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), dtype=jnp.int32),
    )


def sample_training_rays(
    key: jax.Array,
    rays: RayBundle,
    rgbs: jnp.ndarray,
    n_rays: int,
) -> Tuple[RayBundle, jnp.ndarray]:
    """One random image, `n_rays` random pixels (with replacement).

    Matches reference _sample_training_data (…training_handler.py:341-370).

    Args:
      rays: RayBundle with batch shape [N_img, H*W].
      rgbs: [N_img, H*W, 3] ground-truth colors.
    """
    img_key, pix_key = jax.random.split(key)
    n_img = rgbs.shape[0]
    hw = rgbs.shape[1]
    img_idx = jax.random.randint(img_key, (), 0, n_img)
    pix_idx = jax.random.randint(pix_key, (n_rays,), 0, hw)
    sampled = RayBundle(*(field[img_idx][pix_idx] for field in rays))
    gt = rgbs[img_idx][pix_idx]
    return sampled, gt


def _loss_and_metrics(
    params: Dict[str, Any],
    sampled_rays: RayBundle,
    gt: jnp.ndarray,
    settings: RenderSettings,
    spec: NerfMLPSpec,
    render_key: jax.Array,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    out = render_ray_bundle(
        params, sampled_rays, settings, spec=spec, key=render_key, full_outputs=True
    )
    rgb_loss_fine = img2mse(out["rgb_fine"], gt)
    if settings.use_proposal:
        # Proposal mode: the coarse level has no color; its loss is the
        # interlevel histogram bound (render/proposal.py).
        from nerf_workspaces_explorer_tpu.render.proposal import interlevel_loss
        from nerf_workspaces_explorer_tpu.render.volume import sigma_to_weights

        # Histograms for the interlevel bound are recomposited WITHOUT the
        # raw_noise_std sigma noise: the rendering losses keep the
        # reference's noise regularizer, but a noisy target histogram vs a
        # noisy proposal histogram makes the proposal chase per-step noise
        # (measured: loss oscillating 0.3-1000, and the fast serving preset
        # losing 0.74 dB on proposal checkpoints). Gradient flows to the
        # proposal through its raw sigma; the fine target is stopped inside
        # interlevel_loss.
        w_prop = sigma_to_weights(
            out["raw_coarse"][..., 3], out["z_vals_coarse"], sampled_rays.dirs
        )
        w_fine = sigma_to_weights(
            out["raw_fine"][..., 3], out["z_vals_fine"], sampled_rays.dirs
        )
        rgb_loss_coarse = interlevel_loss(
            out["z_vals_coarse"], w_prop, out["z_vals_fine"], w_fine
        )
        psnr_coarse = jnp.zeros(())  # no coarse rgb to score
    else:
        rgb_loss_coarse = img2mse(out["rgb_coarse"], gt)
        psnr_coarse = mse2psnr(jax.lax.stop_gradient(rgb_loss_coarse))
    total_loss = rgb_loss_coarse + rgb_loss_fine
    metrics = {
        "rgb_loss_coarse": rgb_loss_coarse,
        "rgb_loss_fine": rgb_loss_fine,
        "total_loss": total_loss,
        "psnr_coarse": psnr_coarse,
        "psnr_fine": mse2psnr(jax.lax.stop_gradient(rgb_loss_fine)),
        # Sigma histograms for TensorBoard (reference :383-388).
        "trans_coarse": jax.lax.stop_gradient(out["raw_coarse"][..., 3]),
        "trans_fine": jax.lax.stop_gradient(out["raw_fine"][..., 3]),
    }
    return total_loss, metrics


def make_train_step(
    settings: RenderSettings,
    spec: NerfMLPSpec,
    optimizer: optax.GradientTransformation,
    n_rays: int,
    *,
    mesh: Optional[jax.sharding.Mesh] = None,
    axis_name: str = "data",
    donate: bool = True,
    field_impl: str = "xla",
    steps_per_call: int = 1,
):
    """Build the jitted train step.

    Returns fn(state, rays, rgbs, key) -> (state, metrics) where rays is a
    RayBundle [N_img, H*W] and rgbs is [N_img, H*W, 3], both device-resident.

    With a mesh, the step runs under `shard_map`: every device samples and
    renders `n_rays / n_devices` rays and gradients are `pmean`-reduced over
    ICI before the (replicated) optimizer update.

    With `steps_per_call` > 1, ONE dispatch advances that many optimizer
    steps via `lax.scan` (keys still fold per-step from state.step, so the
    trajectory reproduces repeated single calls to f32 rounding) and
    returns the LAST step's metrics. Amortizes per-dispatch host latency;
    measured ~5% at the office config on the v5e (where async dispatch
    already pipelines the single-step loop: 103 -> 109 fused steps/s at
    K=64) — worth more on dispatch-bound hosts or smaller models. The
    reference's Python loop pays full host latency every step
    (nerf/train.py:48-56).
    """
    train_settings = settings._replace(train=True, field_impl=field_impl)

    def _scanned(single, state, rays, rgbs, key):
        def body(state, _):
            return single(state, rays, rgbs, key)

        state, ms = jax.lax.scan(body, state, None, length=steps_per_call)
        return state, jax.tree.map(lambda x: x[-1], ms)

    if mesh is None:

        def single_step(state: TrainState, rays, rgbs, key):
            sample_key, render_key = jax.random.split(
                jax.random.fold_in(key, state.step)
            )
            sampled, gt = sample_training_rays(sample_key, rays, rgbs, n_rays)

            def loss_fn(params):
                return _loss_and_metrics(
                    params, sampled, gt, train_settings, spec, render_key
                )

            grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
            updates, opt_state = optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.step + 1), metrics

        if steps_per_call > 1:

            def step_fn(state, rays, rgbs, key):
                return _scanned(single_step, state, rays, rgbs, key)

        else:
            step_fn = single_step
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    # Data-parallel step over the mesh: each device draws its own pixel
    # subset (distinct fold_in per device index) from the SAME random image,
    # so the global batch matches the reference's one-image sampling.
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    n_devices = mesh.devices.size
    if n_rays % n_devices != 0:
        raise ValueError(f"n_rays={n_rays} not divisible by mesh size {n_devices}")
    rays_per_device = n_rays // n_devices

    def sharded_step(state: TrainState, rays, rgbs, key):
        def device_fn(state, rays, rgbs):
            idx = jax.lax.axis_index(axis_name)

            def one_step(state):
                step_key = jax.random.fold_in(key, state.step)
                img_key, render_base = jax.random.split(step_key)
                pix_key = jax.random.fold_in(img_key, idx + 1)  # per-device pixels
                render_key = jax.random.fold_in(render_base, idx)
                n_img, hw = rgbs.shape[0], rgbs.shape[1]
                img_idx = jax.random.randint(img_key, (), 0, n_img)  # shared image
                pix_idx = jax.random.randint(pix_key, (rays_per_device,), 0, hw)
                sampled = RayBundle(*(f[img_idx][pix_idx] for f in rays))
                gt = rgbs[img_idx][pix_idx]

                def loss_fn(params):
                    return _loss_and_metrics(
                        params, sampled, gt, train_settings, spec, render_key
                    )

                grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
                # The ONLY cross-chip communication: mean of grads (and
                # scalar metrics) over the data axis.
                grads = jax.lax.pmean(grads, axis_name)
                metrics = {
                    k: (jax.lax.pmean(v, axis_name) if v.ndim == 0 else v)
                    for k, v in metrics.items()
                }
                updates, opt_state = optimizer.update(
                    grads, state.opt_state, state.params
                )
                params = optax.apply_updates(state.params, updates)
                return TrainState(params, opt_state, state.step + 1), metrics

            if steps_per_call > 1:
                state, ms = jax.lax.scan(
                    lambda s, _: one_step(s), state, None, length=steps_per_call
                )
                return state, jax.tree.map(lambda x: x[-1], ms)
            return one_step(state)

        replicated = P()
        return shard_map(
            device_fn,
            mesh=mesh,
            in_specs=(replicated, replicated, replicated),
            out_specs=(
                replicated,
                {
                    "rgb_loss_coarse": replicated,
                    "rgb_loss_fine": replicated,
                    "total_loss": replicated,
                    "psnr_coarse": replicated,
                    "psnr_fine": replicated,
                    "trans_coarse": P(axis_name),
                    "trans_fine": P(axis_name),
                },
            ),
        )(state, rays, rgbs)

    return jax.jit(sharded_step, donate_argnums=(0,) if donate else ())
