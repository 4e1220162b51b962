from nerf_workspaces_explorer_tpu.ops.pallas_render import (
    nerf_render_pallas,
    prepare_kernel_params,
    render_rays_fused,
)

__all__ = ["nerf_render_pallas", "prepare_kernel_params", "render_rays_fused"]
