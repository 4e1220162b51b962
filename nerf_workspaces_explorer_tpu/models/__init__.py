from nerf_workspaces_explorer_tpu.models.encoding import (
    embedding_output_dim,
    positional_encoding,
)
from nerf_workspaces_explorer_tpu.models.mlp import (
    NerfMLPSpec,
    apply_nerf_mlp,
    init_nerf_params,
)

__all__ = [
    "NerfMLPSpec",
    "apply_nerf_mlp",
    "embedding_output_dim",
    "init_nerf_params",
    "positional_encoding",
]
