"""int8 quantization for the fused render kernel's MLP trunk.

The v5e MXU runs int8 x int8 -> int32 matmuls at 2x bf16 throughput
(measured 374 vs 183 TOP/s on this chip). The NeRF trunk — 8 [256, 256]
layers — carries ~79% of the fine pass MACs and ~98% of the density-only
coarse pass, so serving it in int8 takes a full frame well below the bf16
floor while the quality-sensitive heads (alpha/feature/view/rgb) stay bf16.

Scheme: per-tensor symmetric int8 (TensorRT-style static calibration):
  - weights:      w_q = round(w / (max|w| / 127))        (per layer)
  - activations:  h_q = clip(round(h / (max|h| / 127)), 0, 127)
    with max|h| measured by pushing a calibration batch of scene points
    through the fp32 trunk once, eagerly, at model-load time.
All scales are plain Python floats, so inside the kernel the requantization
folds to ONE fused elementwise chain per layer (scale-mul + bias-add +
clip + cast) — the same VPU cost as the bf16 path's bias+relu+cast.

The reference has no quantization (pure fp32 CUDA); this is a TPU-native
serving extension (precision="int8" on NeRFRenderer / bench.py).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import numpy as np

from nerf_workspaces_explorer_tpu.models.mlp import NerfMLPSpec


class TrunkQuant(NamedTuple):
    """Static calibration maxima for one network's trunk (plain floats —
    they bake into the kernel as compile-time constants)."""

    feat_max: float  # max |encoded feature| (layer-0 / skip input)
    h_max: Tuple[float, ...]  # per-layer activation max, layers 0..D-2
    w_max: Tuple[float, ...]  # per-layer |weight| max, layers 0..D-1
    skip_w_max: Tuple[float, ...]  # per skip-layer encoding-weight max


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
) -> TrunkQuant:
    """Measure trunk activation/weight maxima on a batch of scene points.

    Runs EAGERLY on concrete fp32 params (call before jit tracing). Points
    sample U(-box, box)^3 — the workspaces' cameras and geometry live well
    inside +-8 m (application/workspace.py calibration extents).
    """
    if spec is None:
        spec = NerfMLPSpec()
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-box, box, size=(n_points, 3)).astype(np.float32)
    num_freqs = (spec.input_ch - 3) // 6
    feat = _encode_np(pts, num_freqs, 10.0)

    feat_max = float(np.max(np.abs(feat)))
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
            h_max.append(float(np.max(h)) * margin)

    return TrunkQuant(
        feat_max=feat_max * margin,
        h_max=tuple(h_max),
        w_max=tuple(w_max),
        skip_w_max=tuple(skip_w_max),
    )


def calibrate_model_quant(
    params: Dict[str, Any], spec: Optional[NerfMLPSpec] = None, **kw
) -> Dict[str, TrunkQuant]:
    """Per-network trunk calibration for a {'coarse'/'proposal', 'fine'}
    param dict (each net has its own weight statistics)."""
    return {
        name: calibrate_trunk(net, spec, **kw)
        for name, net in params.items()
        if isinstance(net, dict) and "pts" in net
    }
