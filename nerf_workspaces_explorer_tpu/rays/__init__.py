from nerf_workspaces_explorer_tpu.rays.raygen import (
    RayBundle,
    camera_ray_dirs,
    create_rays,
    pack_rays,
    unpack_rays,
)
from nerf_workspaces_explorer_tpu.rays.sampling import (
    coarse_z_vals,
    merge_sorted_z,
    sample_pdf,
    stratified_perturb,
)

__all__ = [
    "RayBundle",
    "camera_ray_dirs",
    "coarse_z_vals",
    "create_rays",
    "merge_sorted_z",
    "pack_rays",
    "sample_pdf",
    "stratified_perturb",
    "unpack_rays",
]
