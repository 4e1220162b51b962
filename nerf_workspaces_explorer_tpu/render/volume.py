"""Volume rendering compositing: raw network outputs -> per-ray maps.

Parity target: reference nerf/models/model_utils.py:33-100 (`raw2outputs`):
  - dists between consecutive z values, last dist 1e10, scaled by |ray dir|;
  - rgb = sigmoid(raw[..., :3]);
  - alpha = 1 - exp(-relu(sigma + noise) * dists);
  - weights = alpha * exclusive-cumprod(1 - alpha + 1e-10);
  - rgb/depth/disp/acc maps; optional white background; optional composited
    128-d endpoint feature map.

TPU-native notes: the exclusive cumulative product uses `jnp.cumprod`,
which already lowers to an O(log n) associative scan on TPU — no serial
loop — and fuses into neighbouring kernels. A log-space variant
(exp(exclusive-cumsum(log))) exists behind `use_logspace=True` for
reference only: it is NOT gradient-safe (1/x explodes as the factor
1 - alpha + 1e-10 -> 1e-10 when density saturates, NaN-ing training; see
`exclusive_cumprod`) and is never used on the training path.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class RenderOutputs(NamedTuple):
    rgb: jnp.ndarray  # [..., 3]
    disp: jnp.ndarray  # [...]
    acc: jnp.ndarray  # [...]
    weights: jnp.ndarray  # [..., S]
    depth: jnp.ndarray  # [...]
    feature: Optional[jnp.ndarray] = None  # [..., 128] when endpoint_feat


def exclusive_cumprod(x: jnp.ndarray, *, use_logspace: bool = False) -> jnp.ndarray:
    """Exclusive cumulative product along the last axis: [1, x0, x0*x1, ...].

    Reference computes this via cat([ones, x]).cumprod()[..., :-1]
    (model_utils.py:75-80). `jnp.cumprod` already lowers to an O(log n)
    associative scan on TPU. The log-space variant is kept for reference but
    is NOT differentiation-safe: d log(x)/dx = 1/x explodes as
    x = 1 - alpha + 1e-10 -> 1e-10 when density saturates, NaN-ing training.
    """
    if use_logspace:
        logx = jnp.log(x)
        csum = jnp.cumsum(logx, axis=-1)
        exclusive = jnp.concatenate(
            [jnp.zeros_like(csum[..., :1]), csum[..., :-1]], axis=-1
        )
        return jnp.exp(exclusive)
    ones = jnp.ones_like(x[..., :1])
    return jnp.cumprod(jnp.concatenate([ones, x], axis=-1), axis=-1)[..., :-1]


def sigma_to_weights(
    sigma: jnp.ndarray, z_vals: jnp.ndarray, rays_d: jnp.ndarray
) -> jnp.ndarray:
    """Noiseless compositing weights from raw sigma ([..., S] each).

    The weights-only slice of `composite_rays` (same dists/alpha/cumprod
    math, reference model_utils.py:60-84) without the sigma noise. Used to
    build the proposal interlevel-loss target: with raw_noise_std=1 both
    histograms jitter independently every step and the proposal net chases
    noise instead of geometry (measured: interlevel loss oscillating
    0.3-1000 over 20k steps).
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
    )
    dists = dists * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)
    return alpha * exclusive_cumprod(1.0 - alpha + 1e-10)


def composite_rays(
    raw: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    *,
    raw_noise_std: float = 0.0,
    noise_key: jax.Array | None = None,
    white_background: bool = False,
    endpoint_feat: bool = False,
) -> RenderOutputs:
    """Alpha-composite raw predictions along each ray.

    Args:
      raw: [..., S, 4] (or [..., S, 4+128] with endpoint_feat) network output.
      z_vals: [..., S] sample depths.
      rays_d: [..., 3] unnormalized ray directions.
      raw_noise_std: std of Gaussian noise added to sigma before the ReLU
        (training regularizer, reference model_utils.py:64-71).
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
    )  # [..., S]
    dists = dists * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    rgb = jax.nn.sigmoid(raw[..., :3])  # [..., S, 3]

    sigma = raw[..., 3]
    if raw_noise_std > 0.0:
        if noise_key is None:
            raise ValueError("raw_noise_std > 0 requires noise_key")
        sigma = sigma + jax.random.normal(noise_key, sigma.shape, sigma.dtype) * raw_noise_std

    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)  # [..., S]
    weights = alpha * exclusive_cumprod(1.0 - alpha + 1e-10)

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)  # [..., 3]
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    # Reference: 1 / max(1e-10, depth/acc) (model_utils.py:94) — which is NaN
    # when acc == 0 (empty rays). Guarding the division keeps disp finite and
    # agrees with the reference whenever acc is non-negligible.
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / jnp.maximum(acc_map, 1e-10))

    if white_background:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    feature_map = None
    if endpoint_feat:
        feat = raw[..., -128:]
        feature_map = jnp.sum(weights[..., None] * feat, axis=-2)

    return RenderOutputs(
        rgb=rgb_map,
        disp=disp_map,
        acc=acc_map,
        weights=weights,
        depth=depth_map,
        feature=feature_map,
    )
