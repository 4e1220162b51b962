"""Multi-chip ray-sharded rendering.

Replaces the reference's only "parallelism" — sequential Python chunk loops
(reference utils/batch_utils.py:7-39) — with `shard_map` over a device mesh:
the flat ray axis splits across devices (zero cross-chip data dependencies;
the structural analog of sequence parallelism per SURVEY.md §5), each device
runs the same jitted coarse+fine pipeline on its shard, and the output frame
is gathered when materialized. Parameters are fully replicated (the whole
model is ~4 MB).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from nerf_workspaces_explorer_tpu.models.mlp import NerfMLPSpec
from nerf_workspaces_explorer_tpu.rays.raygen import RayBundle
from nerf_workspaces_explorer_tpu.render.pipeline import (
    RenderSettings,
    render_ray_bundle,
    render_rays_chunked,
)


def shard_render(
    params: Dict[str, Any],
    rays: RayBundle,
    settings: RenderSettings,
    mesh: Mesh,
    *,
    spec: Optional[NerfMLPSpec] = None,
    chunk: int = 8192,
    full_outputs: bool = False,
    axis_name: Optional[str] = None,
    use_pallas: bool = False,
    interpret: bool = False,
    quant: Optional[Dict[str, Any]] = None,
    early_stop_eps: float = 1e-3,
    sort_rays: bool = False,
    grid_hw: Optional[tuple] = None,
) -> Dict[str, jnp.ndarray]:
    """Render a flat RayBundle with rays sharded across the mesh.

    Args:
      rays: flat RayBundle [N]. Padded (edge mode) so each device gets an
        equal static shard.
      chunk: per-device tile size; shards smaller than one chunk render in a
        single unchunked call.
      use_pallas: run the fused render kernel on each device's shard (the
        production multi-chip path: kernel per shard, zero collectives).
      quant: per-net int8 calibration (ops/quantize.py) for the fused path —
        the serving configuration's full-int8 kernels on every shard.
      early_stop_eps, sort_rays: fused-kernel early-termination settings —
        forwarded so mesh-sharded frames match single-chip NeRFRenderer
        frames (which default eps to 1e-3) bit-for-bit and in cost.
      grid_hw: optional (rows, cols) image-grid shape of the flat ray axis,
        enabling `settings.proposal_subsample` on the fused path. Each
        shard is a contiguous row block, so the per-shard grid is
        (rows/n_devices, cols); when rows don't divide by n_devices (or
        rows-per-shard by the stride) the shards fall back to exact
        placement. With an even row split the subsampled lattice matches
        the single-chip one exactly (blocks never straddle shards).
    Returns:
      Output dict with leading dim N (same contract as render_rays_chunked).
    """
    if axis_name is None:
        axis_name = mesh.axis_names[0]
    n_devices = mesh.devices.size
    n = rays.origins.shape[0]
    shard = -(-n // n_devices)
    padded = shard * n_devices
    shard_grid = None
    if grid_hw is not None and padded == n:
        rows, cols = int(grid_hw[0]), int(grid_hw[1])
        if rows * cols == n and rows % n_devices == 0:
            shard_grid = (rows // n_devices, cols)

    def pad(x: jnp.ndarray) -> jnp.ndarray:
        return jnp.pad(x, ((0, padded - n), (0, 0)), mode="edge")

    rays_padded = RayBundle(*(pad(f) for f in rays))

    def device_fn(params: Dict[str, Any], local_rays: RayBundle):
        if use_pallas:
            from nerf_workspaces_explorer_tpu.ops.pallas_render import (
                render_rays_fused,
            )

            ray_tile = min(2048, max(128, shard))
            out = render_rays_fused(
                params, local_rays, settings, spec=spec,
                ray_tile=ray_tile, interpret=interpret, full=True,
                quant=quant, early_stop_eps=early_stop_eps,
                sort_rays=sort_rays, grid_hw=shard_grid,
            )
            return {"rgb_fine": out.rgb, "depth_fine": out.depth[:, None],
                    "acc_fine": out.acc[:, None],
                    "disp_fine": out.disp[:, None]}
        if shard <= chunk:
            return render_ray_bundle(
                params, local_rays, settings.for_eval(), spec=spec,
                full_outputs=full_outputs,
            )
        return render_rays_chunked(
            params, local_rays, settings, spec=spec, chunk=chunk,
            full_outputs=full_outputs,
        )

    out = shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=P(axis_name),
        # pallas_call outputs don't carry varying-mesh-axis metadata yet.
        check_vma=not use_pallas,
    )(params, rays_padded)
    return {k: v[:n] for k, v in out.items()}
