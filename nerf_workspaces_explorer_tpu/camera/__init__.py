from nerf_workspaces_explorer_tpu.camera.poses import (
    camera_to_world_matrix,
    poses_from_coordinates,
    rodrigues,
)
from nerf_workspaces_explorer_tpu.camera.intrinsics import PinholeIntrinsics

__all__ = [
    "PinholeIntrinsics",
    "camera_to_world_matrix",
    "poses_from_coordinates",
    "rodrigues",
]
