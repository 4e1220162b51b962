"""int8 quantization for the fused render kernel (trunk + heads).

The v5e MXU runs int8 x int8 -> int32 matmuls at 2x bf16 throughput
(measured 374 vs 183 TOP/s on this chip). The NeRF trunk — 8 [256, 256]
layers — carries ~79% of the fine pass MACs and ~98% of the density-only
coarse pass; the fa/view/rgb heads carry the remaining ~20% of the fine
pass. With `heads=True` (the default) BOTH quantize, so every per-sample
matmul in the serving path runs int8 and only the [1, R] sigma and [8, R]
rgb epilogues touch fp32.

Scheme: per-tensor symmetric int8 (TensorRT-style static calibration):
  - weights:      w_q = round(w / (max|w| / 127))        (per layer/head;
    the fused feature+alpha matmul uses per-row-group scales)
  - activations:  h_q = clip(round(h / unit), 0, 127)  (signed [-127, 127]
    for the activation-free feature head), with maxima measured by pushing
    a calibration batch of scene points + unit view directions through the
    fp32 network once, eagerly, at model-load time.
Activation quant units are powers of two of the incoming accumulator's
real scale, so every requantization inside the kernel is an integer
`clip((acc + b_i32) >> k, lo, 127)` — see ops/pallas_render.py `_trunk`.
All scales are plain Python floats that bake into the kernel compile.

The reference has no quantization (pure fp32 CUDA); this is a TPU-native
serving extension (precision="int8" on NeRFRenderer / bench.py).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import numpy as np

from nerf_workspaces_explorer_tpu.models.mlp import NerfMLPSpec


class TrunkQuant(NamedTuple):
    """Static calibration maxima for one network (plain floats — they bake
    into the kernel as compile-time constants).

    The trunk fields are always populated; the head fields (`heads=True`,
    the default) additionally enable the fully-int8 serving pipeline where
    the feature/alpha, view, and rgb head matmuls also run int8 on the MXU
    and only the final sigma/rgb epilogues touch fp32 (on [1, R] / [8, R]
    rows — negligible VPU cost)."""

    feat_max: float  # max |encoded feature| (layer-0 / skip input)
    h_max: Tuple[float, ...]  # per-layer activation max, layers 0..D-2
    w_max: Tuple[float, ...]  # per-layer |weight| max, layers 0..D-1
    skip_w_max: Tuple[float, ...]  # per skip-layer encoding-weight max
    # int8-head fields (None/0.0 -> heads stay bf16, the round-2 behavior):
    h_last_max: Optional[float] = None  # final trunk activation max
    feature_max: Optional[float] = None  # |feature head output| max (signed)
    hv_max: Optional[float] = None  # view-layer activation max (post-relu)
    w_feat_max: Optional[float] = None  # |feature head weight| max
    w_alpha_max: Optional[float] = None  # |alpha head weight| max
    w_view_h_max: Optional[float] = None  # |view-layer h-block weight| max
    w_rgb_max: Optional[float] = None  # |rgb head weight| max

    @property
    def int8_heads(self) -> bool:
        return self.h_last_max is not None


def _encode_np(pts: np.ndarray, num_freqs: int, scalar_factor: float) -> np.ndarray:
    """Reference-ordered positional encoding in numpy (embedding.py:24-38).
    Only magnitudes matter for calibration; the kernel's row permutation
    preserves them."""
    x = pts / scalar_factor
    feats = [x]
    for k in range(num_freqs):
        feats.append(np.sin(2.0**k * x))
        feats.append(np.cos(2.0**k * x))
    return np.concatenate(feats, axis=-1)


def calibrate_trunk(
    params: Dict[str, Any],
    spec: Optional[NerfMLPSpec] = None,
    *,
    seed: int = 0,
    n_points: int = 4096,
    box: float = 8.0,
    margin: float = 1.05,
    heads: bool = True,
    pts: Optional[np.ndarray] = None,
    percentile: Optional[float] = 99.5,
) -> TrunkQuant:
    """Measure trunk (and, with `heads`, head) activation/weight maxima on a
    batch of scene points.

    Runs EAGERLY on concrete fp32 params (call before jit tracing). Points
    sample U(-box, box)^3 — the workspaces' cameras and geometry live well
    inside +-8 m (application/workspace.py calibration extents); view
    directions sample the unit sphere. Pass `pts` ([N, 3]) to calibrate on
    REAL scene samples instead (e.g. stratified points along probe-pose
    rays — what the serving path actually evaluates). With `percentile`,
    ACTIVATION maxima clip at that percentile of the calibration batch
    (TensorRT-style saturation of rare outliers buys resolution for the
    bulk; weight maxima always stay exact — weight clipping is a
    deterministic, permanent error). The 99.5 default halves the int8
    error vs exact maxima on the trained fixture (mean 1.69e-3 ->
    7.2e-4, p99 7.2e-3 -> 2.5e-3 — /tmp probe 2026-08-17); pass
    percentile=None for exact-max calibration."""
    if spec is None:
        spec = NerfMLPSpec()
    rng = np.random.default_rng(seed)
    if pts is None:
        pts = rng.uniform(-box, box, size=(n_points, 3)).astype(np.float32)
    else:
        pts = np.asarray(pts, dtype=np.float32).reshape(-1, 3)
        n_points = pts.shape[0]

    def amax(x: np.ndarray) -> float:
        a = np.abs(x)
        if percentile is None:
            return float(a.max())
        # Percentile over the NONZERO support: post-ReLU trunk activations
        # can be >99.5% zeros on calibration points outside the trained
        # geometry (measured on a room-interior checkpoint: the pre-skip
        # layer's plain percentile collapsed to 0, which cascaded into a
        # 2^23 requant shift and a saturating skip unit — int8 SSIM 0.03).
        # A percentile of zero would clip EVERY real activation, not rare
        # outliers; restricting to the activated support keeps the
        # outlier-suppression semantics under sparsity.
        nz = a[a > 0.0]
        if nz.size == 0:
            return 0.0
        return float(np.percentile(nz, percentile))

    num_freqs = (spec.input_ch - 3) // 6
    feat = _encode_np(pts, num_freqs, 10.0)

    feat_max = amax(feat)
    h = feat
    h_max, w_max, skip_w_max = [], [], []
    for i, layer in enumerate(params["pts"]):
        w = np.asarray(layer["w"], dtype=np.float32)  # [in, out]
        b = np.asarray(layer["b"], dtype=np.float32)
        if i > 0 and (i - 1) in spec.skips:
            # Reference concat order [input_pts, h] (nerf_model.py:59).
            skip_w_max.append(float(np.max(np.abs(w[: spec.input_ch]))))
            w_max.append(float(np.max(np.abs(w[spec.input_ch :]))))
            h = np.concatenate([feat, h], axis=-1)
        else:
            w_max.append(float(np.max(np.abs(w))))
        h = np.maximum(h @ w + b, 0.0)
        if i < len(params["pts"]) - 1:
            h_max.append(amax(h) * margin)

    if not heads or not spec.use_view_dirs or "feature" not in params:
        return TrunkQuant(
            feat_max=feat_max * margin,
            h_max=tuple(h_max),
            w_max=tuple(w_max),
            skip_w_max=tuple(skip_w_max),
        )

    # Head calibration: push the same batch through feature/view/rgb with a
    # random unit view direction per point (reference nerf_model.py:61-76).
    w_f = np.asarray(params["feature"]["w"], dtype=np.float32)
    b_f = np.asarray(params["feature"]["b"], dtype=np.float32)
    w_a = np.asarray(params["alpha"]["w"], dtype=np.float32)
    w_v = np.asarray(params["views"][0]["w"], dtype=np.float32)
    b_v = np.asarray(params["views"][0]["b"], dtype=np.float32)
    w_r = np.asarray(params["rgb"]["w"], dtype=np.float32)

    feature = h @ w_f + b_f
    dirs = rng.normal(size=(n_points, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-9
    view_freqs = (spec.input_ch_views - 3) // 6
    venc = _encode_np(dirs, view_freqs, 1.0)
    hv = np.maximum(np.concatenate([feature, venc], axis=-1) @ w_v + b_v, 0.0)

    return TrunkQuant(
        feat_max=feat_max * margin,
        h_max=tuple(h_max),
        w_max=tuple(w_max),
        skip_w_max=tuple(skip_w_max),
        h_last_max=amax(h) * margin,
        feature_max=amax(feature) * margin,
        hv_max=amax(hv) * margin,
        w_feat_max=float(np.max(np.abs(w_f))),
        w_alpha_max=float(np.max(np.abs(w_a))),
        w_view_h_max=float(np.max(np.abs(w_v[: spec.width]))),
        w_rgb_max=float(np.max(np.abs(w_r))),
    )


def spec_from_net_params(net: Dict[str, Any]) -> NerfMLPSpec:
    """Recover a net's architecture from its parameter shapes.

    Needed because a proposal-mode param dict mixes architectures (2x64
    proposal net + 8x256 fine net) while the caller holds one flagship spec;
    calibration must walk each net with ITS OWN layer/encoding dims."""
    in_ch = int(net["pts"][0]["w"].shape[0])
    width = int(net["pts"][0]["w"].shape[1])
    depth = len(net["pts"])
    skips = tuple(
        i - 1
        for i in range(1, depth)
        if int(net["pts"][i]["w"].shape[0]) == width + in_ch
    )
    use_view_dirs = bool(net.get("views"))
    in_views = (
        int(net["views"][0]["w"].shape[0]) - width if use_view_dirs else 27
    )
    return NerfMLPSpec(
        depth=depth,
        width=width,
        input_ch=in_ch,
        input_ch_views=in_views,
        skips=skips,
        use_view_dirs=use_view_dirs,
    )


def calibrate_model_quant(
    params: Dict[str, Any], spec: Optional[NerfMLPSpec] = None, **kw
) -> Dict[str, TrunkQuant]:
    """Per-network trunk calibration for a {'coarse'/'proposal', 'fine'}
    param dict (each net has its own weight statistics). Nets whose shapes
    disagree with `spec` (the proposal net) calibrate with a spec inferred
    from their own parameters."""
    if spec is None:
        spec = NerfMLPSpec()

    def net_spec(net):
        inferred = spec_from_net_params(net)
        return spec if inferred == spec else inferred

    return {
        name: calibrate_trunk(net, net_spec(net), **kw)
        for name, net in params.items()
        if isinstance(net, dict) and "pts" in net
    }
