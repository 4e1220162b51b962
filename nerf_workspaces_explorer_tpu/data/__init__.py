from nerf_workspaces_explorer_tpu.data.replica import ReplicaDataset, SceneData
from nerf_workspaces_explorer_tpu.data.synthetic import make_synthetic_scene

__all__ = ["ReplicaDataset", "SceneData", "make_synthetic_scene"]
