"""Fused importance sampling for the inference path: inverse-CDF sampling +
coarse/fine depth merge in ONE Pallas kernel.

Replaces the XLA `sample_pdf` + `merge_sorted_z` stage of
`render_rays_fused`, which costs ~75 ms of a 640x480 frame on one v5e
(measured: 62 ms sample_pdf + 44 ms sort, scripts/profile_importance.py).
Both stages are memory-bound in XLA — sample_pdf materializes a [R, Q, B]
comparison tensor and the merge is a full bitonic sort of [R, 192] — while
per-ray all state fits VMEM: this kernel streams each ray tile once.

Semantics match `rays/sampling.py::sample_pdf(deterministic=True)` +
`merge_sorted_z`, i.e. the reference inference path (reference
nerf/rays/rays.py:74-121 inverse CDF with the +1e-5 and degenerate-bin
guards; nerf/inference/nerf_replica_inference_handler.py:238-243
deterministic u + sort of the concatenation). Deterministic-u only — the
training path (random u, stratified perturb) stays in XLA.

Kernel design (transposed [feature, ray] layout, like ops/pallas_render):
  - exclusive-cumsum CDF via a strict lower-triangular matmul (MXU);
  - inverse CDF by iterating the 62 CDF intervals (static unroll): every
    quantile row u_q accumulates its interpolated depth from the single
    interval [cdf_b, cdf_{b+1}) containing it. Full-sublane [Q, T] ops —
    no [R, Q, B] tensor ever exists.
  - quantiles are generated DESCENDING so [z asc | +inf pad | samples desc]
    is bitonic, then an 8-stage bitonic merge network over the 256 sublanes
    (roll + compare-exchange) yields the ascending union; rows [0:192] are
    exactly `sort(concat(z, z_samples))`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _importance_merge_kernel(
    w_ref, z_ref, out_ref, *, n_importance: int, merge: bool = True
):
    z = z_ref[:]  # [S, T] coarse depths, ascending along sublanes
    w = w_ref[:]  # [S, T] coarse weights
    s, t = z.shape
    n_bins = s - 1

    bins = 0.5 * (z[1:] + z[:-1])  # [S-1, T] midpoints (reference rays.py:79)
    wt = w[1:-1] + 1e-5  # nan/zero-division guard (reference rays.py:87)
    pdf = wt / jnp.sum(wt, axis=0, keepdims=True)  # [S-2, T]

    # Exclusive cumsum: cdf[r] = sum_{j<r} pdf[j]; row 0 is the leading zero
    # the XLA path gets from concat([0, cumsum]). Strict lower-triangular
    # matmul instead of a sublane scan — one tiny MXU op.
    ri = jax.lax.broadcasted_iota(jnp.int32, (n_bins, s - 2), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (n_bins, s - 2), 1)
    tri = (ci < ri).astype(jnp.float32)
    cdf = jnp.dot(tri, pdf, preferred_element_type=jnp.float32)  # [S-1, T]

    # Quantile row order: DESCENDING when merging (row q holds
    # u = (I-1-q)/(I-1)) so the merge input below is bitonic without a
    # reverse; ASCENDING in importance-only mode (the inverse CDF is
    # monotone in u, so ascending u yields the sorted samples directly —
    # no merge network at all).
    qio = jax.lax.broadcasted_iota(jnp.int32, (n_importance, t), 0)
    qi = qio if not merge else (n_importance - 1 - qio)
    u = qi.astype(jnp.float32) * (1.0 / (n_importance - 1))  # [I, T]

    # Interval-accumulation inverse CDF. u in [cdf_b, cdf_{b+1}) interpolates
    # bin b; empty (tied) intervals contribute to no quantile, reproducing
    # the XLA path's last-tie prefix/first-tie suffix selection. u >= the
    # last cdf entry clamps to the last bin (suffix-empty fallback).
    #
    # Each bin's interpolation b0 + (u - c0)/denom * (b1 - b0) is affine in
    # u, so precompute per-bin slope/intercept [S-1, T] rows ONCE (one
    # divide per bin) and keep the hot [I, T] loop divide-free — the
    # per-iteration divide was ~half the kernel's VPU time.
    denom = cdf[1:] - cdf[:-1]  # [S-2, T]
    denom = jnp.where(denom < 1e-5, 1.0, denom)  # reference rays.py:108
    slope = (bins[1:] - bins[:-1]) / denom
    icept = bins[:-1] - cdf[:-1] * slope
    z_s = jnp.zeros((n_importance, t), jnp.float32)
    for b in range(n_bins - 1):
        m = (u >= cdf[b : b + 1]) & (u < cdf[b + 1 : b + 2])
        z_s = z_s + jnp.where(m, icept[b : b + 1] + u * slope[b : b + 1], 0.0)
    z_s = z_s + jnp.where(u >= cdf[-1:], bins[-1:], 0.0)

    if not merge:
        # Importance-only (fast preset): ascending u already produced the
        # sorted sample set — write it out and skip the merge network.
        out_ref[:] = z_s
        return

    # Bitonic merge: [z asc (S) | +inf pad | z_s desc (I)] is bitonic; the
    # log2(n) compare-exchange stages sort it ascending, +inf pad last.
    n = _next_pow2(s + n_importance)
    x = jnp.concatenate(
        [z, jnp.full((n - s - n_importance, t), jnp.inf, jnp.float32), z_s],
        axis=0,
    )
    sub = jax.lax.broadcasted_iota(jnp.int32, (n, t), 0)
    d = n // 2
    while d >= 1:
        up = pltpu.roll(x, n - d, 0)  # cyclic shift by -d (roll needs >= 0)
        down = pltpu.roll(x, d, 0)
        is_lo = (sub % (2 * d)) < d
        x = jnp.where(is_lo, jnp.minimum(x, up), jnp.maximum(x, down))
        d //= 2
    out_ref[:] = x[: s + n_importance]


def importance_merge_pallas(
    weights_t: jnp.ndarray,
    z_t: jnp.ndarray,
    n_importance: int,
    *,
    ray_tile: int = 256,  # fastest measured tile at frame scale (7.4 ms vs
    # 9.7 at 512 on a 640x480 frame, scripts/profile_coarse_stage.py)
    interpret: bool = False,
    merge: bool = True,
) -> jnp.ndarray:
    """weights_t, z_t: [S, R] transposed coarse outputs (R % ray_tile == 0).

    Returns z_fine_t [S + n_importance, R]: per ray, the sorted union of the
    coarse depths and the deterministic inverse-CDF importance samples —
    bit-compatible (up to f32 summation order in the CDF) with
    `merge_sorted_z(z, sample_pdf(z_mid, w[1:-1], I, deterministic=True))`.

    With merge=False (the fast serving preset, RenderSettings.merge_coarse
    == False) returns only the sorted importance samples
    [n_importance, R] — equivalent to
    `sample_pdf(z_mid, w[1:-1], I, deterministic=True)` (already ascending).
    """
    s, r = z_t.shape
    if n_importance < 2:
        raise ValueError(
            "importance_merge_pallas needs n_importance >= 2 (deterministic "
            "quantiles are linspace(0, 1, n_importance)); use the XLA "
            "sample_pdf path for fewer"
        )
    if r % ray_tile != 0:
        raise ValueError(f"ray count {r} not divisible by ray_tile {ray_tile}")
    kernel = functools.partial(
        _importance_merge_kernel, n_importance=n_importance, merge=merge
    )
    out_rows = s + n_importance if merge else n_importance
    return pl.pallas_call(
        kernel,
        grid=(r // ray_tile,),
        in_specs=[
            pl.BlockSpec((s, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (out_rows, ray_tile),
            lambda i: (0, i),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((out_rows, r), jnp.float32),
        interpret=interpret,
    )(weights_t, z_t)
