"""Device mesh construction.

The reference has no distributed layer at all (single hardcoded CUDA device,
SURVEY.md §2 parallelism table). Here the unit of scaling is a 1-D
`jax.sharding.Mesh` over the ray/batch axis — NeRF ray work is embarrassingly
parallel, so a flat data axis with gradient `pmean` (training) and sharded
ray rendering (inference) is the idiomatic TPU mapping; collectives ride ICI
within a slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def device_count() -> int:
    return jax.device_count()


def data_mesh(
    n_devices: Optional[int] = None,
    *,
    axis_name: str = "data",
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """1-D mesh over the first `n_devices` devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)}"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))
