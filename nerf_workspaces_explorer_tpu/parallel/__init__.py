from nerf_workspaces_explorer_tpu.parallel.mesh import data_mesh, device_count
from nerf_workspaces_explorer_tpu.parallel.sharding import shard_render

__all__ = ["data_mesh", "device_count", "shard_render"]
