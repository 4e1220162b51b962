"""Proposal-network sampling (framework extension, mip-NeRF-360 style).

The reference's hierarchical sampling spends a full 8x256 MLP pass on the
coarse level whose ONLY inference-time product is the importance weights
(reference …inference_handler.py:226-238). This extension replaces it with a
tiny density-only proposal MLP (default 2x64) trained so its weight
histogram upper-bounds the fine network's — the interlevel loss of
mip-NeRF 360 (Barron et al., CVPR 2022, Eq. 13). Opt-in: it changes sample
placement relative to the reference, so it is off by default.

Everything is gather-free: the histogram outer measure uses the same sorted
prefix-sum masked reductions as `rays/sampling.py` (searchsorted is ~1s per
frame on TPU).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from nerf_workspaces_explorer_tpu.models.mlp import NerfMLPSpec


def proposal_spec(num_freqs_3d: int = 6, width: int = 64, depth: int = 2) -> NerfMLPSpec:
    """Architecture of the proposal net.

    use_view_dirs=True keeps it compatible with the fused kernels (their
    density-only path never evaluates the view/rgb heads; at training time
    those heads simply receive zero gradient).
    """
    return NerfMLPSpec(
        depth=depth,
        width=width,
        input_ch=3 * (1 + 2 * num_freqs_3d),
        input_ch_views=3 * (1 + 2 * 2),
        skips=(),
        use_view_dirs=True,
    )


def _sample_edges(z_vals: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-sample interval edges: midpoints between samples, clamped at the
    first/last sample (the convention of the stratified perturbation,
    reference …training_handler.py:556-558)."""
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
    upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
    return lower, upper


def _cumweight_at(
    fine_upper: jnp.ndarray, fine_cum: jnp.ndarray, query: jnp.ndarray
) -> jnp.ndarray:
    """W(q) = total fine weight in intervals fully below q.

    fine_upper: [..., F] sorted interval upper edges; fine_cum: [..., F]
    inclusive prefix sums of fine weights; query: [..., P]. Gather-free:
    prefix max over {cum_i : upper_i <= q} (cum is nondecreasing).
    """
    le = fine_upper[..., None, :] <= query[..., :, None]  # [..., P, F]
    neg = jnp.asarray(-jnp.inf, fine_cum.dtype)
    w = jnp.max(jnp.where(le, fine_cum[..., None, :], neg), axis=-1)
    return jnp.maximum(w, 0.0)  # empty prefix -> 0


def interlevel_loss(
    z_prop: jnp.ndarray,
    w_prop: jnp.ndarray,
    z_fine: jnp.ndarray,
    w_fine: jnp.ndarray,
    *,
    eps: float = 1e-7,
) -> jnp.ndarray:
    """Penalize proposal bins that under-cover the fine weight histogram.

    loss = mean_bins max(0, bound(T) - w_prop)^2 / (w_prop + eps), where
    bound(T) is the total fine weight overlapping the proposal bin
    (mip-NeRF 360 Eq. 13). Fine weights are treated as ground truth
    (stop-gradient); gradient flows to the proposal only.

    Args:
      z_prop:  [..., P] proposal sample depths (sorted).
      w_prop:  [..., P] proposal weights.
      z_fine:  [..., F] fine sample depths (sorted).
      w_fine:  [..., F] fine weights.
    """
    w_fine = jax.lax.stop_gradient(w_fine)
    z_fine = jax.lax.stop_gradient(z_fine)

    prop_lower, prop_upper = _sample_edges(z_prop)
    fine_lower, fine_upper = _sample_edges(z_fine)

    # Overlap bound via cumulative weights: intervals that INTERSECT
    # [lower, upper] are those with upper_edge > lower and lower_edge < upper.
    # bound = W_by_upper(upper_q) - W_by_lower(lower_q) where
    #   W_by_upper(q) = sum of w_i with lower_i < q   (started before q)
    #   W_by_lower(q) = sum of w_i with upper_i <= q  (finished by q)
    # so the difference counts every interval overlapping the bin (and none
    # fully outside).
    cum = jnp.cumsum(w_fine, axis=-1)
    started_before = cum[..., -1:] - _suffix_weight(fine_lower, w_fine, prop_upper)
    finished_by = _cumweight_at(fine_upper, cum, prop_lower)
    bound = jnp.maximum(started_before - finished_by, 0.0)

    excess = jnp.maximum(bound - w_prop, 0.0)
    return jnp.mean(excess**2 / (w_prop + eps))


def _suffix_weight(
    fine_lower: jnp.ndarray, w_fine: jnp.ndarray, query: jnp.ndarray
) -> jnp.ndarray:
    """Total fine weight of intervals with lower_edge >= q (not started
    before q). Gather-free: suffix sums are nonincreasing in i, so the sum
    over the suffix {lower_i >= q} is the MAX of the suffix-sum array over
    that set (its first element)."""
    rev_cum = jnp.cumsum(w_fine[..., ::-1], axis=-1)[..., ::-1]  # suffix sums
    ge = fine_lower[..., None, :] >= query[..., :, None]  # [..., P, F]
    neg = jnp.asarray(-jnp.inf, rev_cum.dtype)
    s = jnp.max(jnp.where(ge, rev_cum[..., None, :], neg), axis=-1)
    return jnp.maximum(s, 0.0)  # empty set -> 0
