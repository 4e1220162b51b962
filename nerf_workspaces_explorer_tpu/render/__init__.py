from nerf_workspaces_explorer_tpu.render.volume import RenderOutputs, composite_rays
from nerf_workspaces_explorer_tpu.render.pipeline import (
    RenderSettings,
    render_ray_bundle,
    render_rays_chunked,
)

__all__ = [
    "RenderOutputs",
    "RenderSettings",
    "composite_rays",
    "render_ray_bundle",
    "render_rays_chunked",
]
