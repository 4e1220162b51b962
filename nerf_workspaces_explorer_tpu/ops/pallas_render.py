"""Fused Pallas TPU render kernel: encoding + MLP + volume compositing.

This replaces the reference's entire hot loop — `run_network`'s embed +
chunked MLP apply plus `raw2outputs` compositing (reference
nerf/models/model_utils.py:13-100 driven by utils/batch_utils.py:7-39) —
with one Pallas kernel per hierarchical pass.

Layout: everything is TRANSPOSED — features on sublanes, rays on lanes
([C, N] instead of [N, C]). TPU tiles rank-2 arrays as (8, 128); a
[N, 3] points array would pad its lane dim 3 -> 128 (42x HBM blowup — at
640x480 that alone OOMs the chip), while [C, N] keeps every array exactly
dense: C is always a multiple of 8 (64/256/384/128) and N a multiple of 128.

Ray-major structure: the grid runs over ray tiles; inside the kernel a
`fori_loop` walks the samples of each ray in depth order and composites
on the fly (running transmittance), so:
  - per-sample positional encoding is ONE fused-multiply-add
    `phases = o_ph + z_s * d_ph` on [64, R] — the frequency scaling lives in
    precomputed per-ray phase vectors (o/10 * 2^k etc.), not a per-sample
    matmul;
  - cos columns are sin columns with a +pi/2 phase bias folded into o_ph, so
    the entire encoding costs ONE jnp.sin per sample step;
  - the view-direction encoding is computed once per ray (the reference
    re-embeds the same direction for all 192 samples of a ray,
    model_utils.py:23-26);
  - raw rgba never touches HBM: alpha-compositing happens in-registers and
    only [8, R] maps (rgb/depth/acc) are written; the coarse pass writes the
    per-sample weights needed by the importance sampler.

The MLP matmuls are bf16 with fp32 accumulation (the reference's CUDA path
is fp32; bf16+fp32-accum keeps per-pixel error below 1/255 — see tests).
The skip concat (reference nerf_model.py:58-59) and the view concat
(nerf_model.py:66) are folded into sums of two matmuls; the alpha and
feature heads fuse into one [384, 256] matmul.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_workspaces_explorer_tpu.models.mlp import NerfMLPSpec
from nerf_workspaces_explorer_tpu.rays.raygen import RayBundle
from nerf_workspaces_explorer_tpu.rays.sampling import (
    coarse_z_vals,
    merge_sorted_z,
    sample_pdf,
)
from nerf_workspaces_explorer_tpu.render.pipeline import RenderSettings

# Kernel encoding feature layout (sublane rows of the feature matrix):
# [identity(3) | sin(F*3) | cos(F*3) | zero-pad]. Cos rows are produced by
# the same jnp.sin thanks to a +pi/2 bias folded into the phase offsets.
# Frequency counts derive from the model spec (input_ch = 3 + 6F); the
# flagship office model is F=10 (pts, enc dim 63->64) and F=4 (views,
# 27->32). Enc dims round up to a sublane multiple of 8.
PTS_FREQS = 10
PTS_ENC_DIM = 64
VIEW_FREQS = 4
VIEW_ENC_DIM = 32

DEFAULT_RAY_TILE = 4096


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _freqs_from_input_ch(input_ch: int) -> int:
    """input_ch = 3 * (1 + 2F) (reference embedding.py:24-38)."""
    assert (input_ch - 3) % 6 == 0, f"bad encoded input width {input_ch}"
    return (input_ch - 3) // 6


def _enc_dim(num_freqs: int) -> int:
    return _round_up(3 + 6 * num_freqs, 8)


def _phase_scales(num_freqs: int, enc_dim: int, scalar_factor: float) -> np.ndarray:
    """[3, enc_dim] per-coordinate scale: row c spreads coord c to its
    identity/sin/cos feature rows."""
    f = np.zeros((3, enc_dim), dtype=np.float32)
    for c in range(3):
        f[c, c] = 1.0 / scalar_factor
    for k in range(num_freqs):
        for c in range(3):
            f[c, 3 + 3 * k + c] = (2.0**k) / scalar_factor
            f[c, 3 + 3 * num_freqs + 3 * k + c] = (2.0**k) / scalar_factor
    return f


def _cos_bias(num_freqs: int, enc_dim: int) -> np.ndarray:
    """[enc_dim] +pi/2 on the cos rows (sin(x + pi/2) = cos(x))."""
    b = np.zeros((enc_dim,), dtype=np.float32)
    b[3 + 3 * num_freqs : 3 + 6 * num_freqs] = np.pi / 2.0
    return b


def _encoding_permutation(num_freqs: int, enc_dim: int) -> np.ndarray:
    """kernel_row -> reference_row map (-1 = zero pad).

    Reference encoding order (reference nerf/models/embedding.py:24-38):
    [x,y,z, sin(f0)xyz, cos(f0)xyz, sin(f1)xyz, ...]. Kernel order groups
    all sin rows then all cos rows.
    """
    perm = np.full((enc_dim,), -1, dtype=np.int64)
    perm[0:3] = [0, 1, 2]
    for k in range(num_freqs):
        for c in range(3):
            perm[3 + 3 * k + c] = 3 + 6 * k + c
            perm[3 + 3 * num_freqs + 3 * k + c] = 6 + 6 * k + c
    return perm


def _permute_pad_in_rows(w: jnp.ndarray, perm: np.ndarray) -> jnp.ndarray:
    """Reorder input-side rows of a [in, out] weight to kernel feature order."""
    gather = np.maximum(perm, 0)
    out = w[gather]
    mask = (perm >= 0).astype(w.dtype)[:, None]
    return out * mask


class KernelParams(NamedTuple):
    """Weights in transposed kernel layout [out, in], bf16.

    When `shift_layers` is non-empty the trunk is int8-quantized (serving
    mode, ops/quantize.py): w_layers/w_skip_enc hold int8 weights, b_layers
    hold int32 biases (with the rounding offset pre-added), and
    shift_layers/skip_shift/feat_qscale are the compile-time power-of-2
    requantization constants (see _trunk).
    """

    w_layers: tuple  # depth x [256, in]
    w_skip_enc: tuple  # per skip layer [256, 64]
    b_layers: tuple  # depth x [256, 1] fp32
    w_fa: jnp.ndarray  # [384, 256]: rows 0-255 feature, row 256 alpha
    b_fa: jnp.ndarray  # [384, 1]
    w_view_h: jnp.ndarray  # [128, 256]
    w_view_enc: jnp.ndarray  # [128, 32]
    b_view: jnp.ndarray  # [128, 1]
    w_rgb: jnp.ndarray  # [8, width//2] rows 0-2 live
    b_rgb: jnp.ndarray  # [8, 1]
    skips: tuple
    width: int = 256
    pts_freqs: int = PTS_FREQS
    view_freqs: int = VIEW_FREQS
    shift_layers: tuple = ()  # int8 mode: per-layer requant shift (ints)
    skip_shift: tuple = ()  # int8 mode: per-skip scale-match shift (ints)
    feat_qscale: Optional[float] = None  # int8 mode: encoding quant scale
    # int8-HEAD mode (shift_layers non-empty AND int8_heads): the fa/view/rgb
    # head matmuls are int8 too; only the [1, R] sigma and [8, R] rgb
    # epilogues touch fp32. All statics below bake into the compile.
    int8_heads: bool = False
    k_feat: int = 0  # feature-head requant shift (signed clip)
    k_hv: int = 0  # view-layer requant shift (relu clip)
    s_alpha: float = 1.0  # sigma int32-acc -> fp32 scale
    inv_s_view: float = 1.0  # 1 / view-acc scale (hv_enc int32 conversion)
    s_rgb: float = 1.0  # rgb int32-acc -> fp32 scale


def _balanced_requant(
    w_unit: float, in_unit: float, target: float
) -> Tuple[float, int]:
    """Pick the requant shift k and (possibly inflated) weight unit so the
    post-shift activation unit lands as close to the calibrated target as
    int8 weights + power-of-2 shifts allow.

    The accumulator's real scale is raw = w_unit * in_unit and the
    activation quant unit is raw * 2^k, which must be >= target (k >= 0,
    right shifts only) to cover the calibrated activation max. Plain
    k = ceil(log2(target / raw)) overshoots the target by up to 2x — a full
    bit of activation resolution lost. When that overshoot exceeds sqrt(2),
    floor k instead and absorb the residual factor into the WEIGHT unit
    (the layer's weights then still use >= 89 of the 127 int8 levels and
    the activation unit lands exactly on target): the worst-case
    resolution loss per requant stage drops from 2x to sqrt(2)x.
    Returns (w_unit, k)."""
    t = target / (w_unit * in_unit)
    if t <= 1.0:
        # The accumulator is already coarser than the target unit; k = 0 is
        # the finest reachable activation unit.
        return w_unit, 0
    k = math.floor(math.log2(t))
    s = t / 2.0**k  # overshoot of the floored shift, in [1, 2)
    if s <= math.sqrt(2.0):
        return w_unit * s, k  # activation unit == target exactly
    return w_unit, k + 1


def prepare_kernel_params(
    params: Dict[str, Any],
    spec: Optional[NerfMLPSpec] = None,
    dtype=jnp.bfloat16,
    quant=None,
) -> KernelParams:
    """Convert one model's [in, out] param pytree to kernel layout.

    With `quant` (an ops.quantize.TrunkQuant of static calibration maxima)
    the trunk weights quantize to per-tensor symmetric int8 and the dequant/
    requant scales bake in as compile-time floats; heads stay `dtype`.
    """
    if spec is None:
        spec = NerfMLPSpec()
    assert spec.use_view_dirs, "the fused kernel implements the view-dirs model"
    assert spec.width % 16 == 0, "kernel needs width divisible by 16"
    pts_freqs = _freqs_from_input_ch(spec.input_ch)
    view_freqs = _freqs_from_input_ch(spec.input_ch_views)
    pts_perm = _encoding_permutation(pts_freqs, _enc_dim(pts_freqs))
    view_perm = _encoding_permutation(view_freqs, _enc_dim(view_freqs))
    width = spec.width
    fa_rows = _round_up(width + 8, 128)

    n_layers = len(params["pts"])
    shift_layers, skip_shift = [], []
    feat_qscale = None
    a_last = 1.0  # last trunk layer's real scale, folded into the heads
    h_unit = None  # running activation quant unit
    int8_heads = bool(quant is not None and getattr(quant, "int8_heads", False))
    if quant is not None:
        feat_qscale = 127.0 / quant.feat_max

    def quantize_w(w_t: jnp.ndarray, unit: float) -> jnp.ndarray:
        return jnp.clip(jnp.round(w_t / unit), -127, 127).astype(jnp.int8)

    w_layers, w_skip_enc, b_layers = [], [], []
    for i, layer in enumerate(params["pts"]):
        w = layer["w"].astype(jnp.float32)  # [in, out]
        b = layer["b"].astype(jnp.float32)[:, None]  # [out, 1]
        if i == 0:
            w_t = _permute_pad_in_rows(w, pts_perm).T
            w_skip_t = None
        elif (i - 1) in spec.skips:
            # Concat order [input_pts, h] (reference nerf_model.py:59).
            w_skip_t = _permute_pad_in_rows(w[: spec.input_ch], pts_perm).T
            w_t = w[spec.input_ch :].T
        else:
            w_t = w.T
            w_skip_t = None

        if quant is None:
            if w_skip_t is not None:
                w_skip_enc.append(w_skip_t)
            w_layers.append(w_t)
            b_layers.append(b)
            continue

        # int8 trunk with POWER-OF-2 requantization: acc_i32 carries real
        # scale `raw = w_unit * in_unit`; the next activation's quant unit
        # is forced to raw * 2^k (k and w_unit balanced by
        # _balanced_requant so the unit covers the calibrated h_max while
        # losing at most sqrt(2)x resolution), so the whole
        # dequant+bias+relu+requant epilogue is integer-only:
        # clip((acc + b_i32) >> k, 0, 127). Rounding rides for free as a
        # +2^(k-1) offset inside b_i32; the 0-clip IS the relu. The last
        # layer's real scale folds into the bf16 head weights instead
        # (zero per-sample cost).
        feat_unit = quant.feat_max / 127.0
        in_unit = feat_unit if i == 0 else h_unit
        w_unit = quant.w_max[i] / 127.0
        k = None
        if i < n_layers - 1 or int8_heads:
            target = (
                quant.h_max[i] if i < n_layers - 1 else quant.h_last_max
            ) / 127.0
            if target <= 0.0:
                # Layer dead (all-zero post-ReLU) on the calibration batch —
                # measured on a room-interior checkpoint whose pre-skip
                # layer never fires on box points. Zeros quantize to zero
                # under ANY unit, so the unit choice only matters for scale
                # propagation: k=0 would hand the next layer an absurdly
                # fine in_unit (raw ~1e-6 here), pushing the skip-match
                # shift to -14 and saturating the skip weights (int8 SSIM
                # 0.03). Anchor the dead layer's activation unit at the
                # encode-feature unit instead — the natural mid-scale —
                # which keeps every downstream requant in range. If the
                # layer DOES fire at serving time, the coarse unit clips
                # conservatively instead of exploding.
                target = quant.feat_max / 127.0
            w_unit, k = _balanced_requant(w_unit, in_unit, target)
        raw = w_unit * in_unit
        if w_skip_t is not None:
            # Match the skip dot's scale to raw via a power-of-2 shift: the
            # skip weight unit raw * 2^-j / feat_unit stays >= the true
            # |w| max (j floored), so no skip weight clips. j may be
            # NEGATIVE (checkpoints whose trunk activations are small
            # relative to their skip weights) — the kernel then LEFT-shifts
            # the skip accumulator; clamped at -8 (skip_acc <= ~2^20, so
            # <= 8 bits of headroom stay overflow-safe in int32).
            skip_ideal = quant.skip_w_max[len(w_skip_enc)] / 127.0 * feat_unit
            j_raw = math.floor(math.log2(raw / skip_ideal))
            if j_raw < -8:
                # Below -8 the skip weights would need > 8 extra bits of
                # left-shift headroom; quantize_w's +-127 clip would then
                # silently saturate them. Fail loudly so extreme checkpoints
                # fall back to bf16 instead of rendering wrong.
                import warnings

                warnings.warn(
                    f"int8 calibration out of range for skip layer "
                    f"{len(w_skip_enc)}: needs shift {j_raw} < -8; skip "
                    f"weights will saturate — use bf16/parity precision "
                    f"for this checkpoint",
                    RuntimeWarning,
                    stacklevel=2,
                )
            j = max(-8, j_raw)
            skip_unit = raw / (2.0**j) / feat_unit
            skip_shift.append(j)
            w_skip_enc.append(quantize_w(w_skip_t, skip_unit))
        if k is not None:
            # int8-head mode also requantizes the FINAL trunk activation to
            # int8 so the fa head matmul runs int8 x int8 on the MXU.
            h_unit = raw * (2.0**k)
            shift_layers.append(k)
            b_q = jnp.round(b / raw).astype(jnp.int32)
            if k > 0:
                b_q = b_q + (1 << (k - 1))  # free round-to-nearest
            b_layers.append(b_q)
        else:
            shift_layers.append(0)
            a_last = raw
            b_layers.append(jnp.round(b / raw).astype(jnp.int32))
        w_layers.append(quantize_w(w_t, w_unit))

    w_fa = jnp.zeros((fa_rows, width), dtype=jnp.float32)
    w_fa = (
        w_fa.at[:width].set(params["feature"]["w"].astype(jnp.float32).T)
        .at[width : width + 1]
        .set(params["alpha"]["w"].astype(jnp.float32).T)
    )
    # int8 trunk-only mode: the trunk's final activations arrive UNscaled
    # (integer domain); absorb their real scale into the head weights for
    # free. (In int8-head mode a_last stays 1.0 — the scale chain continues
    # through the quantized heads instead.)
    w_fa = w_fa * a_last
    b_fa = jnp.zeros((fa_rows, 1), dtype=jnp.float32)
    b_fa = (
        b_fa.at[:width, 0]
        .set(params["feature"]["b"].astype(jnp.float32))
        .at[width, 0]
        .set(params["alpha"]["b"].astype(jnp.float32)[0])
    )

    w_view = params["views"][0]["w"].astype(jnp.float32)  # [256+27, 128]
    w_view_h = w_view[:width].T
    w_view_enc = _permute_pad_in_rows(w_view[width:], view_perm).T
    b_view = params["views"][0]["b"].astype(jnp.float32)[:, None]

    w_rgb = jnp.zeros((8, width // 2), dtype=jnp.float32)
    w_rgb = w_rgb.at[:3].set(params["rgb"]["w"].astype(jnp.float32).T)
    b_rgb = jnp.zeros((8, 1), dtype=jnp.float32)
    b_rgb = b_rgb.at[:3, 0].set(params["rgb"]["b"].astype(jnp.float32))

    k_feat = k_hv = 0
    s_alpha = inv_s_view = s_rgb = 1.0
    if int8_heads:
        # Continue the power-of-2 scale chain through the heads: every head
        # matmul is int8 x int8 -> int32; requantizations are integer
        # shift+clip; only sigma ([1, R]) and rgb ([8, R]) dequantize to
        # fp32, and the per-ray view-encoding contribution converts to the
        # view accumulator's integer domain ONCE per tile (kernel g==0).
        u_feat_w = quant.w_feat_max / 127.0
        u_alpha_w = quant.w_alpha_max / 127.0
        # Feature head output is SIGNED: requant clips to [-127, 127].
        u_feat_w, k_feat = _balanced_requant(
            u_feat_w, h_unit, quant.feature_max / 127.0
        )  # h_unit = final trunk activation unit
        s_feat_acc = u_feat_w * h_unit
        s_alpha = u_alpha_w * h_unit
        w_fa_q = jnp.zeros((fa_rows, width), dtype=jnp.int8)
        w_fa_q = w_fa_q.at[:width].set(quantize_w(w_fa[:width], u_feat_w))
        w_fa_q = w_fa_q.at[width : width + 1].set(
            quantize_w(w_fa[width : width + 1], u_alpha_w)
        )
        w_fa = w_fa_q
        feat_unit = s_feat_acc * (2.0**k_feat)
        b_fa_q = jnp.zeros((fa_rows, 1), dtype=jnp.int32)
        b_feat_q = jnp.round(b_fa[:width] / s_feat_acc).astype(jnp.int32)
        if k_feat > 0:
            b_feat_q = b_feat_q + (1 << (k_feat - 1))
        b_fa_q = b_fa_q.at[:width].set(b_feat_q)
        b_fa_q = b_fa_q.at[width : width + 1].set(
            jnp.round(b_fa[width : width + 1] / s_alpha).astype(jnp.int32)
        )
        b_fa = b_fa_q

        u_vh_w = quant.w_view_h_max / 127.0
        u_vh_w, k_hv = _balanced_requant(u_vh_w, feat_unit, quant.hv_max / 127.0)
        s_view_acc = u_vh_w * feat_unit
        inv_s_view = 1.0 / s_view_acc
        w_view_h = quantize_w(w_view_h, u_vh_w)
        hv_unit = s_view_acc * (2.0**k_hv)

        u_rgb_w = quant.w_rgb_max / 127.0
        w_rgb = quantize_w(w_rgb, u_rgb_w)
        s_rgb = u_rgb_w * hv_unit

    cast = lambda x: x.astype(dtype)
    trunk_cast = (lambda x: x) if quant is not None else cast  # int8 stays
    head_cast = (lambda x: x) if int8_heads else cast  # int8 stays
    return KernelParams(
        w_layers=tuple(trunk_cast(w) for w in w_layers),
        w_skip_enc=tuple(trunk_cast(w) for w in w_skip_enc),
        b_layers=tuple(b_layers),
        w_fa=head_cast(w_fa),
        b_fa=b_fa,
        w_view_h=head_cast(w_view_h),
        w_view_enc=cast(w_view_enc),
        b_view=b_view,
        w_rgb=head_cast(w_rgb),
        b_rgb=b_rgb,
        skips=tuple(spec.skips),
        width=width,
        pts_freqs=pts_freqs,
        view_freqs=view_freqs,
        shift_layers=tuple(shift_layers),
        skip_shift=tuple(skip_shift),
        feat_qscale=feat_qscale,
        int8_heads=int8_heads,
        k_feat=k_feat,
        k_hv=k_hv,
        s_alpha=s_alpha,
        inv_s_view=inv_s_view,
        s_rgb=s_rgb,
    )


def ray_phase_vectors(
    origins: jnp.ndarray, dirs: jnp.ndarray, num_freqs: int = PTS_FREQS
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-ray phase offset/slope so that the sample-s encoding phases are
    `o_ph + z * d_ph` (with the cos pi/2 bias folded into o_ph).

    Args:
      origins, dirs: [R, 3] fp32.
    Returns:
      (o_ph, d_ph): [enc_dim, R] fp32 each.
    """
    enc_dim = _enc_dim(num_freqs)
    scales = jnp.asarray(_phase_scales(num_freqs, enc_dim, 10.0))
    bias = jnp.asarray(_cos_bias(num_freqs, enc_dim))
    o_ph = origins @ scales + bias
    d_ph = dirs @ scales
    return o_ph.T, d_ph.T


def encode_viewdirs_kernel_order(
    viewdirs: jnp.ndarray, dtype=jnp.bfloat16, num_freqs: int = VIEW_FREQS
) -> jnp.ndarray:
    """Per-ray view encoding in kernel row order -> [enc_dim, R]."""
    enc_dim = _enc_dim(num_freqs)
    scales = jnp.asarray(_phase_scales(num_freqs, enc_dim, 1.0))
    bias = jnp.asarray(_cos_bias(num_freqs, enc_dim))
    phases = viewdirs @ scales + bias
    row = jnp.arange(enc_dim)
    live = 3 + 6 * num_freqs
    feat = jnp.where(
        row < 3, phases, jnp.where(row < live, jnp.sin(phases), 0.0)
    )
    return feat.T.astype(dtype)


# Quadrant-reduced polynomial sin/cos (cephes sinf/cosf coefficients on
# [-pi/4, pi/4]; Cody-Waite two-term pi/2 split for the reduction).
_SIN_C = (-1.6666654611e-1, 8.3321608736e-3, -1.9515295891e-4)
_COS_C = (-0.5, 4.166664568298827e-2, -1.388731625493765e-3, 2.443315711809948e-5)
_PIO2_HI = 1.5707855224609375
_PIO2_LO = math.pi / 2.0 - _PIO2_HI


def _sincos_poly(p: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """sin(p), cos(p) in fp32 via one quadrant reduction + two short
    even/odd polynomials (~25 VPU ops for BOTH values vs ~110 for a pair
    of XLA transcendentals — the encode chain was measured at ~81% of the
    narrow-student fine pass, scripts/profile_fine_ablation.py).

    Max abs error ~8e-8 over |p|<=4 (validated through the octave-doubling
    ladder: top-frequency error equals the exact-fp32-base ladder's, so
    this is numerically free). |p| is bounded by scene_extent/10 here, far
    inside fp32 reduction range.
    """
    q = jnp.round(p * (2.0 / math.pi))
    r = (p - q * _PIO2_HI) - q * _PIO2_LO
    r2 = r * r
    s0 = r + r * r2 * (_SIN_C[0] + r2 * (_SIN_C[1] + r2 * _SIN_C[2]))
    c0 = 1.0 + r2 * (
        _COS_C[0] + r2 * (_COS_C[1] + r2 * (_COS_C[2] + r2 * _COS_C[3]))
    )
    qi = q.astype(jnp.int32)
    swap = (qi & 1) == 1
    s = jnp.where(swap, c0, s0)
    c = jnp.where(swap, -s0, c0)
    sign = jnp.where((qi & 2) == 2, -1.0, 1.0)
    return s * sign, c * sign


def _encode_step(o_ph, d_ph, z_row, num_freqs, compute_dtype, qscale=None):
    """One sample step's [enc_dim, R] features from per-ray phase vectors.

    With `qscale` (int8 trunk mode) the features quantize to symmetric int8
    in the same fused elementwise chain that the bf16 cast used.
    """
    p = o_ph[0:3] + z_row * d_ph[0:3]  # base phases coord/sf, fp32 FMA
    return _encode_ladder(p, num_freqs, compute_dtype, qscale)


def _encode_ladder(p, num_freqs, compute_dtype, qscale=None):
    """[3, T] base phases -> [enc_dim, T] features in kernel row order.

    The frequency ladder is built by octave doubling from ONE sin/cos pair
    on the 3 base rows (sin 2x = 2 sin x cos x, cos 2x = 1 - 2 sin^2 x)
    instead of a transcendental over all 6F frequency rows: the full-block
    sin chain was measured at ~81% of the narrow-student fine pass
    (scripts/profile_fine_ablation.py, 4x128@8f 48s: 44.5 -> 8.5 ms with
    the encode ablated). Doubling amplifies the base sin/cos rounding
    error ~2x per octave, so the top frequency carries ~2^(F-1) * eps_f32
    ~= 1e-5 absolute error — far below bf16 resolution and the int8
    quantization step (1/127), and covered by tests/test_pallas.py.
    """
    s, c = _sincos_poly(p)
    sin_rows, cos_rows = [s], [c]
    for _ in range(num_freqs - 1):
        s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
        sin_rows.append(s)
        cos_rows.append(c)
    rows = [p] + sin_rows + cos_rows
    live = 3 + 6 * num_freqs
    enc_dim = _enc_dim(num_freqs)
    if enc_dim > live:
        rows.append(jnp.zeros((enc_dim - live,) + p.shape[1:], p.dtype))
    feat = jnp.concatenate(rows, axis=0)
    if qscale is not None:
        return jnp.clip(jnp.round(feat * qscale), -127, 127).astype(jnp.int8)
    return feat.astype(compute_dtype)


def _trunk(
    feat, w_layers, w_skip_enc, b_layers, skips, compute_dtype,
    shift_layers=(), skip_shift=(), int8_out=False,
):
    """Density trunk: [64, R] features -> [256, R] activations.

    bf16 mode: acc fp32 on the MXU, bias+relu+cast per layer.
    int8 mode (`shift_layers` non-empty): int8 x int8 -> int32 MXU dots (2x
    throughput on the v5e MXU, measured 374 vs 183 TOP/s) with INTEGER-ONLY
    requantization — activation quant units are powers of two of the
    accumulator's real scale, so each layer's whole
    dequant+bias+round+relu+requant epilogue is
    `clip((acc + b_i32) >> k, 0, 127)` (rounding offset pre-added to b_i32;
    the 0-clip is the relu). The last layer stays integer; its real scale
    is folded into the bf16 head weights by prepare_kernel_params.
    """
    h = None
    skip_i = 0
    n = len(w_layers)
    for i, w in enumerate(w_layers):
        if shift_layers:
            acc = jnp.dot(
                w, feat if i == 0 else h, preferred_element_type=jnp.int32
            )
            if i > 0 and (i - 1) in skips:
                skip_acc = jnp.dot(
                    w_skip_enc[skip_i], feat, preferred_element_type=jnp.int32
                )
                j = skip_shift[skip_i]
                if j > 0:
                    skip_acc = skip_acc >> j
                elif j < 0:
                    skip_acc = skip_acc << (-j)
                acc = acc + skip_acc
                skip_i += 1
            pre = acc + b_layers[i]
            if i < n - 1 or int8_out:
                h = jnp.clip(pre >> shift_layers[i], 0, 127).astype(jnp.int8)
            else:
                h = jnp.maximum(pre, 0).astype(compute_dtype)
            continue
        if i == 0:
            acc = jnp.dot(w, feat, preferred_element_type=jnp.float32)
        elif (i - 1) in skips:
            acc = jnp.dot(w, h, preferred_element_type=jnp.float32) + jnp.dot(
                w_skip_enc[skip_i], feat, preferred_element_type=jnp.float32
            )
            skip_i += 1
        else:
            acc = jnp.dot(w, h, preferred_element_type=jnp.float32)
        h = jax.nn.relu(acc + b_layers[i]).astype(compute_dtype)
    return h


def _render_kernel(
    o_ph_ref,
    d_ph_ref,
    zd_ref,
    venc_ref,
    *refs,
    n_layers: int,
    n_skips: int,
    skips: tuple,
    n_samples: int,
    samples_per_step: int,
    density_only: bool,
    pts_freqs: int,
    width: int,
    early_stop_eps: float,
    compute_dtype,
    et_chunk: int = 8,
    shift_layers: tuple = (),
    skip_shift: tuple = (),
    feat_qscale=None,
    int8_heads: bool = False,
    k_feat: int = 0,
    k_hv: int = 0,
    s_alpha: float = 1.0,
    inv_s_view: float = 1.0,
    s_rgb: float = 1.0,
):
    """One (ray tile, sample group) grid step: evaluate the field at
    `samples_per_step` depth slices of a ray tile and fold them into the
    running composite.

    The sample-group axis is the LAST grid dimension, so for each ray tile
    the groups run front-to-back sequentially on-core; the composite state
    (transmittance + accumulated rgb/depth/acc) lives in a VMEM scratch that
    persists across grid steps. The body is straight-line code (the group's
    samples are statically unrolled) — no in-kernel loop over all samples,
    no dynamic slicing — so Mosaic pipelines the per-group zd DMAs against
    compute and the program compiles once.

    Outputs (transposed):
      density_only: weight slabs [G, 8, R] (sublane k = sample g*sub+k; the
        reference's raw2outputs weights, model_utils.py:71-76).
      full: maps [8, R]: rows 0-2 rgb, 3 depth, 4 acc — written on the last
        group.
    """
    idx = 0
    w_layers = [refs[idx + i][:] for i in range(n_layers)]
    idx += n_layers
    w_skip_enc = [refs[idx + i][:] for i in range(n_skips)]
    idx += n_skips
    b_layers = [refs[idx + i][:] for i in range(n_layers)]
    idx += n_layers
    if density_only:
        w_alpha, b_alpha = refs[idx][:], refs[idx + 1][:]
        idx += 2
    else:
        w_fa, b_fa = refs[idx][:], refs[idx + 1][:]
        w_view_h, w_view_enc, b_view = refs[idx + 2][:], refs[idx + 3][:], refs[idx + 4][:]
        w_rgb, b_rgb = refs[idx + 5][:], refs[idx + 6][:]
        idx += 7
    out_ref = refs[idx]
    acc_ref = refs[idx + 1]  # [8, R] fp32 scratch: 0-2 rgb, 3 depth, 4 acc, 5 trans
    hv_enc_ref = refs[idx + 2] if not density_only else None  # [128, R] fp32

    g = pl.program_id(1)  # sample-group index; group g covers samples
    # [g*samples_per_step, (g+1)*samples_per_step).
    n_groups = n_samples // samples_per_step

    @pl.when(g == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        acc_ref[5:6, :] = jnp.ones_like(acc_ref[5:6, :])
        if not density_only:
            # View encoding contribution is per-ray: compute once per tile.
            venc = venc_ref[:].astype(compute_dtype)
            enc = jnp.dot(w_view_enc, venc, preferred_element_type=jnp.float32)
            if int8_heads:
                # Convert to the view accumulator's integer domain (with the
                # view bias and the hv requant rounding offset folded in) so
                # the per-sample epilogue stays integer-only.
                q = jnp.round((enc + b_view) * inv_s_view).astype(jnp.int32)
                if k_hv > 0:
                    q = q + (1 << (k_hv - 1))
                hv_enc_ref[:] = q
            else:
                hv_enc_ref[:] = enc

    # Early ray termination (framework extension, NerfAcc-style): once every
    # ray in the tile has transmittance below eps, remaining samples cannot
    # contribute a visible amount (< eps < 1/255) — skip their MLP entirely.
    # Samples run front-to-back, so this is exact up to eps.
    tile_alive = (
        jnp.max(acc_ref[5:6, :]) > early_stop_eps
        if early_stop_eps > 0.0
        else (g <= n_groups)  # always true
    )

    if density_only:

        @pl.when(jnp.logical_not(tile_alive))
        def _dead():
            out_ref[0] = jnp.zeros_like(out_ref[0])

        @pl.when(tile_alive)
        def _live():
            # zd block is [1, 8, R]: sublane 2k = z_k, 2k+1 = dist_k for the
            # group's samples (DMA'd per group, pipelined against compute).
            zd = zd_ref[0]  # [8, R]
            o_ph = o_ph_ref[:]
            d_ph = d_ph_ref[:]
            trans = acc_ref[5:6, :]
            for k in range(samples_per_step):
                z_row = zd[2 * k : 2 * k + 1, :]
                dist_row = zd[2 * k + 1 : 2 * k + 2, :]
                feat = _encode_step(
                    o_ph, d_ph, z_row, pts_freqs, compute_dtype, feat_qscale
                )
                h = _trunk(
                    feat, w_layers, w_skip_enc, b_layers, skips,
                    compute_dtype, shift_layers, skip_shift, int8_heads,
                )
                if int8_heads:
                    sig = (
                        jnp.dot(w_alpha, h, preferred_element_type=jnp.int32)
                        + b_alpha
                    )
                    sigma1 = sig[:1].astype(jnp.float32) * s_alpha
                else:
                    sig = (
                        jnp.dot(w_alpha, h, preferred_element_type=jnp.float32)
                        + b_alpha
                    )
                    sigma1 = sig[:1]
                alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma1) * dist_row)
                out_ref[0, k : k + 1, :] = alpha * trans
                trans = trans * (1.0 - alpha + 1e-10)
            acc_ref[5:6, :] = trans

        return

    # Intra-group early-termination chunks: the group's unrolled samples are
    # split into chunks of `et_chunk`; every chunk after the first re-checks
    # the tile's max transmittance before issuing its MLP work. The skip
    # stays exact up to eps (front-to-back order) at any chunk size;
    # et_chunk == samples_per_step (the default) reproduces per-group
    # granularity bit-for-bit. See the et_check_every note in
    # nerf_render_pallas for the measured trade.
    n_chunks = (
        samples_per_step // et_chunk if early_stop_eps > 0.0 else 1
    )
    chunk_len = samples_per_step // n_chunks

    def _full_chunk(zd, o_ph, d_ph, hv_enc, sample_range):
        trans = acc_ref[5:6, :]
        rgb_acc = acc_ref[0:3, :]
        depth_acc = acc_ref[3:4, :]
        w_acc = acc_ref[4:5, :]
        for k in sample_range:
            z_row = zd[2 * k : 2 * k + 1, :]
            dist_row = zd[2 * k + 1 : 2 * k + 2, :]
            feat = _encode_step(
                o_ph, d_ph, z_row, pts_freqs, compute_dtype, feat_qscale
            )
            h = _trunk(
                feat, w_layers, w_skip_enc, b_layers, skips,
                compute_dtype, shift_layers, skip_shift, int8_heads,
            )
            if int8_heads:
                # Fully-int8 head pipeline: fa/view/rgb matmuls are int8 on
                # the MXU; requants are shift+clip; only sigma [1, R] and
                # rgb [3, R] dequantize to fp32.
                fa = jnp.dot(w_fa, h, preferred_element_type=jnp.int32) + b_fa
                feature = jnp.clip(fa[:width] >> k_feat, -127, 127).astype(
                    jnp.int8
                )
                sigma = fa[width : width + 1].astype(jnp.float32) * s_alpha
                acc_v = jnp.dot(
                    w_view_h, feature, preferred_element_type=jnp.int32
                )
                hv = jnp.clip((acc_v + hv_enc) >> k_hv, 0, 127).astype(
                    jnp.int8
                )
                rgb_i = jnp.dot(w_rgb, hv, preferred_element_type=jnp.int32)
                rgb = jax.nn.sigmoid(
                    rgb_i[:3].astype(jnp.float32) * s_rgb + b_rgb[:3]
                )
            else:
                fa = jnp.dot(w_fa, h, preferred_element_type=jnp.float32) + b_fa
                feature = fa[:width].astype(compute_dtype)
                sigma = fa[width : width + 1]
                hv = jax.nn.relu(
                    jnp.dot(w_view_h, feature, preferred_element_type=jnp.float32)
                    + hv_enc
                    + b_view
                ).astype(compute_dtype)
                rgb = jnp.dot(w_rgb, hv, preferred_element_type=jnp.float32) + b_rgb
                rgb = jax.nn.sigmoid(rgb[:3])

            alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dist_row)  # [1, R]
            weight = alpha * trans
            rgb_acc = rgb_acc + weight * rgb
            depth_acc = depth_acc + weight * z_row
            w_acc = w_acc + weight
            trans = trans * (1.0 - alpha + 1e-10)
        acc_ref[0:3, :] = rgb_acc
        acc_ref[3:4, :] = depth_acc
        acc_ref[4:5, :] = w_acc
        acc_ref[5:6, :] = trans

    @pl.when(tile_alive)
    def _live_full():
        _full_chunk(
            zd_ref[0], o_ph_ref[:], d_ph_ref[:], hv_enc_ref[:],
            range(chunk_len),
        )

    for c in range(1, n_chunks):

        @pl.when(jnp.max(acc_ref[5:6, :]) > early_stop_eps)
        def _live_chunk(c=c):
            _full_chunk(
                zd_ref[0], o_ph_ref[:], d_ph_ref[:], hv_enc_ref[:],
                range(c * chunk_len, (c + 1) * chunk_len),
            )

    @pl.when(g == n_groups - 1)
    def _finish():
        out_ref[:] = acc_ref[:]


def _pad_rays_axis(x: jnp.ndarray, padded: int) -> jnp.ndarray:
    n = x.shape[-1]
    if padded == n:
        return x
    return jnp.pad(x, ((0, 0), (0, padded - n)))


def nerf_render_pallas(
    kparams: KernelParams,
    o_ph: jnp.ndarray,
    d_ph: jnp.ndarray,
    z_vals: jnp.ndarray,
    dists: jnp.ndarray,
    venc: Optional[jnp.ndarray] = None,
    *,
    density_only: bool = False,
    ray_tile: int = DEFAULT_RAY_TILE,
    compute_dtype=jnp.bfloat16,
    early_stop_eps: float = 1e-4,
    samples_per_step: Optional[int] = None,
    et_check_every: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the fused render kernel over a flat set of rays.

    All arrays are transposed (rays on the last axis):
      o_ph, d_ph: [64, R] fp32 per-ray phase vectors (`ray_phase_vectors`).
      z_vals, dists: [S, R] fp32 sorted sample depths / |d|-scaled interval
        lengths (last interval 1e10 * |d|, reference model_utils.py:51-60).
      venc: [32, R] view encodings (required unless density_only).
    Returns:
      density_only: weights [S, R] fp32; else maps [8, R] fp32
      (rgb rows 0-2, depth row 3, acc row 4).
    """
    n_rays = o_ph.shape[-1]
    n_samples = z_vals.shape[0]
    n_tiles = -(-n_rays // ray_tile)
    padded = n_tiles * ray_tile

    # 4 samples per grid step when the count divides: the zd slab's 8
    # sublanes hold (z0,d0,..,z3,d3) exactly (no padding waste) and per-step
    # fixed costs amortize 4x. (8 also works — 16-sublane slabs — but
    # doubles kernel code size for a marginal win; see ROADMAP.)
    if samples_per_step is None:
        # 8-sample groups amortize per-step fixed costs best for the wide
        # nets (coarse pass 168->154 ms, fine pass 635->540 ms at 640x480)
        # and still compile in ~20 s; fall back to 4 or 1 when the sample
        # count doesn't divide. Narrow trunks (width <= 128, the turbo
        # students) have a higher per-step fixed-cost share and prefer the
        # largest group that divides (4x128@8f fine pass at 640x480, tile
        # 4096: 96s 89.5 -> 84.6 -> 82.1 ms and 64s 58.5 -> 56.4 ms for
        # sps 8 -> 16 -> 32 — scripts/profile_width_sweep.py 2026-08-18;
        # 16 measured WORSE for 8x256: 320 vs 310 ms).
        trunk_width = kparams.w_layers[0].shape[0]
        preferred = (
            (32, 16, 8, 4, 2, 1) if trunk_width <= 128 else (8, 4, 2, 1)
        )
        samples_per_step = next(
            (k for k in preferred if n_samples % k == 0)
        )
    assert n_samples % samples_per_step == 0
    n_groups = n_samples // samples_per_step
    zd_rows = max(8, 2 * samples_per_step)
    # Early-termination check interval inside a sample group (full pass
    # only). Default: once per group — finer 8-sample chunks were probed
    # on the trained fixture (4x128@8f, 64 importance samples, sps=32)
    # and measured SLOWER (57.4 vs 55.9 ms at 640x480): with importance
    # placement on real content at 4096-ray tiles some ray in the tile
    # is always alive, so the extra checks only break Mosaic's pipeline.
    # Kept as a knob for scenes/tilings where the trade flips.
    if et_check_every is None:
        et_check_every = samples_per_step
    et_chunk = max(1, min(int(et_check_every), samples_per_step))
    while samples_per_step % et_chunk:
        et_chunk -= 1

    o_ph = _pad_rays_axis(o_ph, padded)
    d_ph = _pad_rays_axis(d_ph, padded)
    # [G, 8, R]: group slabs with sublane 2k = z of sample k, 2k+1 = dist.
    z_g = _pad_rays_axis(z_vals, padded).reshape(n_groups, samples_per_step, padded)
    d_g = _pad_rays_axis(dists, padded).reshape(n_groups, samples_per_step, padded)
    zd = jnp.stack([z_g, d_g], axis=2).reshape(n_groups, 2 * samples_per_step, padded)
    if 2 * samples_per_step < zd_rows:
        zd = jnp.pad(zd, ((0, 0), (0, zd_rows - 2 * samples_per_step), (0, 0)))
    if venc is None:
        venc = jnp.zeros((_enc_dim(kparams.view_freqs), padded), dtype=compute_dtype)
    else:
        venc = _pad_rays_axis(venc, padded)

    n_layers = len(kparams.w_layers)
    n_skips = len(kparams.w_skip_enc)

    def wide(b):
        # Biases live pre-broadcast as [C, ray_tile]: a [C, 1] operand would
        # need a per-step lane-splat in the kernel (slow on TPU); a resident
        # full-width block makes the bias add a plain VPU add.
        return jnp.broadcast_to(b, (b.shape[0], ray_tile))

    weights = (
        list(kparams.w_layers)
        + list(kparams.w_skip_enc)
        + [wide(b) for b in kparams.b_layers]
    )
    scratch = [pltpu.VMEM((8, ray_tile), jnp.float32)]  # composite accumulators
    width = kparams.width
    if density_only:
        # Alpha head only: [8, width] (row 0 live) from the fused fa weights.
        w_alpha = kparams.w_fa[width : width + 8]
        b_alpha = wide(kparams.b_fa[width : width + 8])
        weights += [w_alpha, b_alpha]
        out_rows = max(8, samples_per_step)
        out_shape = jax.ShapeDtypeStruct((n_groups, out_rows, padded), jnp.float32)
        # One [1, out_rows, tile] weights slab per group (sublane k = sample k).
        out_spec = pl.BlockSpec(
            (1, out_rows, ray_tile), lambda i, s: (s, 0, i), memory_space=pltpu.VMEM
        )
    else:
        weights += [
            kparams.w_fa,
            wide(kparams.b_fa),
            kparams.w_view_h,
            kparams.w_view_enc,
            wide(kparams.b_view),
            kparams.w_rgb,
            wide(kparams.b_rgb),
        ]
        out_shape = jax.ShapeDtypeStruct((8, padded), jnp.float32)
        out_spec = pl.BlockSpec(
            (8, ray_tile), lambda i, s: (0, i), memory_space=pltpu.VMEM
        )
        # hv_enc per-ray scratch: fp32 accumulator domain (bf16 heads) or
        # int32 view-accumulator domain (int8 heads).
        scratch.append(
            pltpu.VMEM(
                (width // 2, ray_tile),
                jnp.int32 if kparams.int8_heads else jnp.float32,
            )
        )

    def per_ray_spec(rows):
        return pl.BlockSpec(
            (rows, ray_tile), lambda i, s: (0, i), memory_space=pltpu.VMEM
        )

    weight_specs = [
        pl.BlockSpec(w.shape, lambda i, s: (0, 0), memory_space=pltpu.VMEM)
        for w in weights
    ]

    kernel = functools.partial(
        _render_kernel,
        n_layers=n_layers,
        n_skips=n_skips,
        skips=kparams.skips,
        n_samples=n_samples,
        samples_per_step=samples_per_step,
        density_only=density_only,
        pts_freqs=kparams.pts_freqs,
        width=width,
        early_stop_eps=early_stop_eps,
        compute_dtype=compute_dtype,
        et_chunk=et_chunk,
        shift_layers=kparams.shift_layers,
        skip_shift=kparams.skip_shift,
        feat_qscale=kparams.feat_qscale,
        int8_heads=kparams.int8_heads,
        k_feat=kparams.k_feat,
        k_hv=kparams.k_hv,
        s_alpha=kparams.s_alpha,
        inv_s_view=kparams.inv_s_view,
        s_rgb=kparams.s_rgb,
    )

    def kernel_entry(*args):
        kernel(*args)

    out = pl.pallas_call(
        kernel_entry,
        # Sample-group axis LAST: for each ray tile, groups run sequentially
        # front-to-back on-core; the scratch carries the composite.
        grid=(n_tiles, n_groups),
        in_specs=[
            per_ray_spec(o_ph.shape[0]),
            per_ray_spec(d_ph.shape[0]),
            pl.BlockSpec(
                (1, zd_rows, ray_tile), lambda i, s: (s, 0, i),
                memory_space=pltpu.VMEM,
            ),  # per-group z/dist slab
            per_ray_spec(venc.shape[0]),
        ]
        + weight_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(o_ph, d_ph, zd, venc, *weights)
    if density_only:
        # [G, 8, R] -> [S, R]: sublane k of group g is sample g*sub + k.
        return out[:, :samples_per_step, :n_rays].reshape(n_samples, n_rays)
    return out[:, :n_rays]


def _dists_from_z(z_vals_t: jnp.ndarray, dir_norm: jnp.ndarray) -> jnp.ndarray:
    """[S, R] z values -> |d|-scaled interval lengths (last = 1e10)."""
    d = z_vals_t[1:] - z_vals_t[:-1]
    d = jnp.concatenate([d, jnp.full_like(d[:1], 1e10)], axis=0)
    return d * dir_norm


class FusedRenderOutputs(NamedTuple):
    rgb: jnp.ndarray  # [R, 3]
    depth: jnp.ndarray  # [R]
    acc: jnp.ndarray  # [R]
    disp: jnp.ndarray  # [R] inverse depth (reference model_utils.py:88-97)


def render_rays_fused(
    params: Dict[str, Any],
    rays: RayBundle,
    settings: RenderSettings,
    *,
    spec: Optional[NerfMLPSpec] = None,
    ray_tile: int = DEFAULT_RAY_TILE,
    interpret: bool = False,
    full: bool = False,
    early_stop_eps: float = 1e-4,
    quant: Optional[Dict[str, Any]] = None,
    sort_rays: bool = False,
    grid_hw: Optional[tuple] = None,
):
    """Coarse+fine inference through the fused kernel.

    Semantics match the reference inference path (deterministic importance
    sampling, zero sigma noise — reference …inference_handler.py:225,238).
    The coarse pass runs density-only: at inference its only consumer is the
    importance sampler (rgb_coarse is computed but unused in the reference,
    …inference_handler.py:256-268).

    quant: optional {'coarse': TrunkQuant, 'fine': TrunkQuant} static
    calibration (ops/quantize.py) enabling the int8 trunk serving mode.

    grid_hw: optional (rows, cols) shape of the flat ray axis (rows * cols
    == len(rays); a batch of n frames passes (n * H, W)). Only used by
    `settings.proposal_subsample` > 1: the coarse/proposal density pass and
    the importance sampler then run on the subsampled ray lattice
    [::s, ::s] and every ray of an s x s block shares its corner's fine
    depths (the fine pass itself still evaluates every true ray). Ignored —
    exact per-ray placement — when grid_hw is None or either axis does not
    divide by s.

    Returns rgb [R, 3] (or FusedRenderOutputs when full=True).
    """
    eval_settings = settings.for_eval()
    quant = quant or {}
    if eval_settings.use_proposal:
        from nerf_workspaces_explorer_tpu.render.proposal import proposal_spec

        kp_coarse = prepare_kernel_params(
            params["proposal"],
            proposal_spec(eval_settings.proposal_num_freqs),
            quant=quant.get("proposal"),
        )
    else:
        kp_coarse = prepare_kernel_params(
            params["coarse"], spec, quant=quant.get("coarse")
        )
    kp_fine = prepare_kernel_params(params["fine"], spec, quant=quant.get("fine"))

    origins = rays.origins.astype(jnp.float32)
    dirs = rays.dirs.astype(jnp.float32)
    viewdirs = rays.viewdirs.astype(jnp.float32)
    near = rays.near.astype(jnp.float32)
    far = rays.far.astype(jnp.float32)
    n_rays_full = origins.shape[0]

    # Coarse-pass ray lattice: exact (every ray) or the proposal_subsample
    # stride over the image grid (see docstring). The coarse pass exists
    # only to PLACE the fine samples; placement varies smoothly across
    # neighboring rays, so an s-strided lattice shared per s x s block
    # costs ~s^2 less for a near-invisible placement change (gated:
    # scripts/validate_quality.py --prop-subsample).
    sub = int(getattr(eval_settings, "proposal_subsample", 1) or 1)
    sub_grid = None
    if sub > 1 and grid_hw is not None:
        gh, gw = int(grid_hw[0]), int(grid_hw[1])
        if gh * gw == n_rays_full and gh % sub == 0 and gw % sub == 0:
            sub_grid = (gh, gw)

    if sub_grid is not None:
        gh, gw = sub_grid

        def lattice(x: jnp.ndarray) -> jnp.ndarray:
            # [R, ...] -> [R/s^2, ...], the block-corner rays of the grid.
            return x.reshape(gh, gw, *x.shape[1:])[::sub, ::sub].reshape(
                (gh // sub) * (gw // sub), *x.shape[1:]
            )

        origins_c, dirs_c = lattice(origins), lattice(dirs)
        near_c, far_c = lattice(near), lattice(far)
    else:
        origins_c, dirs_c, near_c, far_c = origins, dirs, near, far

    o_ph_c, d_ph_c = ray_phase_vectors(origins_c, dirs_c, kp_coarse.pts_freqs)
    if kp_fine.pts_freqs == kp_coarse.pts_freqs and sub_grid is None:
        o_ph_f, d_ph_f = o_ph_c, d_ph_c
    else:
        o_ph_f, d_ph_f = ray_phase_vectors(origins, dirs, kp_fine.pts_freqs)
    venc = encode_viewdirs_kernel_order(viewdirs, num_freqs=kp_fine.view_freqs)
    dir_norm = jnp.linalg.norm(dirs, axis=-1)[None, :]  # [1, R]
    dir_norm_c = (
        jnp.linalg.norm(dirs_c, axis=-1)[None, :] if sub_grid is not None
        else dir_norm
    )

    # Coarse: density-only -> per-sample weights.
    z_coarse = coarse_z_vals(near_c, far_c, eval_settings.n_samples).T  # [S, R]
    weights_t = nerf_render_pallas(
        kp_coarse,
        o_ph_c,
        d_ph_c,
        z_coarse,
        _dists_from_z(z_coarse, dir_norm_c),
        density_only=True,
        ray_tile=ray_tile,
        early_stop_eps=early_stop_eps,
        interpret=interpret,
    )

    # Importance sampling + depth merge in one Pallas pass (ops/
    # pallas_sampling.py): the XLA sample_pdf + sort costs ~75 ms/frame at
    # 640x480 (memory-bound), the fused kernel ~a tenth of that. weights
    # is still needed in [R, S] orientation for the optional ray sort.
    from nerf_workspaces_explorer_tpu.ops.pallas_sampling import (
        importance_merge_pallas,
    )

    weights = weights_t.T
    n_rays = weights_t.shape[1]
    # The fused kernel's deterministic quantiles divide by n_importance - 1
    # (linspace semantics); n_importance < 2 takes the XLA fallback.
    imp_tile = next(
        (tl for tl in (256, 512, 128) if n_rays % tl == 0), None
    ) if eval_settings.n_importance >= 2 else None
    if imp_tile is not None:
        z_fine = importance_merge_pallas(
            weights_t,
            z_coarse,
            eval_settings.n_importance,
            ray_tile=imp_tile,
            interpret=interpret,
            merge=eval_settings.merge_coarse,
        )
    else:
        # XLA fallback for ray counts not divisible by a lane tile.
        z_c = z_coarse.T
        z_mid = 0.5 * (z_c[..., 1:] + z_c[..., :-1])
        z_samples = sample_pdf(
            z_mid, weights[..., 1:-1], eval_settings.n_importance,
            deterministic=True,
        )
        z_samples = jax.lax.stop_gradient(z_samples)
        if eval_settings.merge_coarse:
            z_fine = merge_sorted_z(z_c, z_samples).T
        else:
            # Deterministic inverse-CDF samples are already ascending.
            z_fine = z_samples.T

    if sub_grid is not None:
        # Broadcast the lattice placement to every ray of its s x s block:
        # [S_f, R/s^2] -> [S_f, R]. Depths stay inside [near, far] (shared
        # across rays), so the fine pass below is exact for the true rays.
        gh, gw = sub_grid
        s_f = z_fine.shape[0]
        z_fine = z_fine.reshape(s_f, gh // sub, gw // sub)
        z_fine = jnp.repeat(jnp.repeat(z_fine, sub, axis=1), sub, axis=2)
        z_fine = z_fine.reshape(s_f, n_rays_full)

    inv_perm = None
    if sort_rays and early_stop_eps > 0.0:
        # Saturation-ordered fine pass: early termination is tile-granular
        # (a 4096-ray tile runs until its SLOWEST ray saturates), so sort
        # rays by the coarse saturation index — the sample where cumulative
        # opacity crosses 1 - eps — to make tiles homogeneous. The fine
        # pass is per-ray independent, so permuting is exact; outputs are
        # unsorted by the inverse permutation. Cost: one [rows, R] column
        # gather per kernel operand (HBM-bandwidth, ~ms at frame scale).
        csum = jnp.cumsum(weights, axis=-1)  # [R(, /s^2), S]
        sat = jnp.argmax(csum > 1.0 - early_stop_eps, axis=-1)
        never = csum[:, -1] <= 1.0 - early_stop_eps
        key = jnp.where(never, weights.shape[-1], sat)
        if sub_grid is not None:
            # The saturation key came from the lattice pass: spread it to
            # the full grid so the sort covers every ray.
            gh, gw = sub_grid
            key = key.reshape(gh // sub, gw // sub)
            key = jnp.repeat(jnp.repeat(key, sub, axis=0), sub, axis=1)
            key = key.reshape(n_rays_full)
        perm = jnp.argsort(key)
        inv_perm = jnp.argsort(perm)
        z_fine = z_fine[:, perm]
        o_ph_f = o_ph_f[:, perm]
        d_ph_f = d_ph_f[:, perm]
        venc = venc[:, perm]
        dir_norm = dir_norm[:, perm]

    maps = nerf_render_pallas(
        kp_fine,
        o_ph_f,
        d_ph_f,
        z_fine,
        _dists_from_z(z_fine, dir_norm),
        venc,
        ray_tile=ray_tile,
        early_stop_eps=early_stop_eps,
        interpret=interpret,
    )
    if inv_perm is not None:
        maps = maps[:, inv_perm]
    rgb = maps[0:3].T
    if eval_settings.white_background:
        rgb = rgb + (1.0 - maps[4:5].T)
    if full:
        depth, acc = maps[3], maps[4]
        # disp = 1 / max(1e-10, depth / acc): one VPU op on [R] at the
        # epilogue (reference disp_map, model_utils.py:88-97; same guarded
        # form as render/volume.py composite_rays).
        disp = 1.0 / jnp.maximum(1e-10, depth / jnp.maximum(acc, 1e-10))
        return FusedRenderOutputs(rgb=rgb, depth=depth, acc=acc, disp=disp)
    return rgb


def render_rays_single_pass(
    net_params: Dict[str, Any],
    rays,
    settings,
    *,
    spec,
    n_samples: Optional[int] = None,
    ray_tile: int = DEFAULT_RAY_TILE,
    interpret: bool = False,
    early_stop_eps: float = 1e-3,
    quant=None,
):
    """One full-pipeline fused pass over uniform depths with a single net.

    The progressive-preview path (GUI): n_samples uniform z values through
    ONE network — no importance sampling, no fine pass — so a preview frame
    costs ~n_samples/192 of the hierarchical render. With a coarse+fine
    checkpoint the natural net is "coarse" (trained on exactly this uniform
    64-sample distribution); coarse-only rendering crashes the reference
    (undefined rgb_fine, …inference_handler.py:234-268) so this is a
    framework extension. Returns rgb [R, 3].
    """
    eval_settings = settings.for_eval()
    kp = prepare_kernel_params(net_params, spec, quant=quant)
    origins = rays.origins.astype(jnp.float32)
    dirs = rays.dirs.astype(jnp.float32)
    o_ph, d_ph = ray_phase_vectors(origins, dirs, kp.pts_freqs)
    venc = encode_viewdirs_kernel_order(
        rays.viewdirs.astype(jnp.float32), num_freqs=kp.view_freqs
    )
    dir_norm = jnp.linalg.norm(dirs, axis=-1)[None, :]
    s = n_samples if n_samples is not None else eval_settings.n_samples
    z = coarse_z_vals(
        rays.near.astype(jnp.float32), rays.far.astype(jnp.float32), s
    ).T
    maps = nerf_render_pallas(
        kp,
        o_ph,
        d_ph,
        z,
        _dists_from_z(z, dir_norm),
        venc,
        ray_tile=ray_tile,
        early_stop_eps=early_stop_eps,
        interpret=interpret,
    )
    rgb = maps[0:3].T
    if eval_settings.white_background:
        rgb = rgb + (1.0 - maps[4:5].T)
    return rgb
