"""Numerical debugging utilities.

Parity target: the reference's runtime self-checking (SURVEY.md §5) — a
NaN/Inf print-scan over every rendered output (reference
nerf/inference/nerf_replica_inference_handler.py:273-276,
…training_handler.py:614-616) and globally enabled autograd anomaly
detection (nerf/models/nerf_model.py:7). The TPU-native equivalents are
jax's debug_nans mode (behind a flag, not import-time global) and an
explicit finite-scan helper usable in tests and the trainer.
"""

from __future__ import annotations

from typing import Any, List, Mapping

import jax
import numpy as np


def enable_nan_debugging(enabled: bool = True) -> None:
    """Make jax raise on the first NaN produced inside jitted code.

    The analog of the reference's `torch.autograd.set_detect_anomaly(True)`
    (nerf_model.py:7) — but opt-in, because it forces per-op sync."""
    jax.config.update("jax_debug_nans", enabled)


def scan_outputs_finite(
    outputs: Mapping[str, Any], *, raise_on_error: bool = False
) -> List[str]:
    """Check every output array for NaN/Inf; returns the offending keys.

    Matches the reference's per-key scan-and-print
    (…inference_handler.py:273-276)."""
    bad: List[str] = []
    for key, value in outputs.items():
        if value is None:
            continue
        arr = np.asarray(value)
        if not np.all(np.isfinite(arr)):
            bad.append(key)
            print(f"[Numerical Error] {key} contains NaN or inf.")
    if bad and raise_on_error:
        raise FloatingPointError(f"non-finite outputs: {bad}")
    return bad
