from nerf_workspaces_explorer_tpu.infer.checkpoint import (
    load_checkpoint,
    load_torch_checkpoint,
    params_to_torch_state_dict,
    save_checkpoint,
    torch_state_dict_to_params,
)
from nerf_workspaces_explorer_tpu.infer.renderer import NeRFRenderer

__all__ = [
    "NeRFRenderer",
    "load_checkpoint",
    "load_torch_checkpoint",
    "params_to_torch_state_dict",
    "save_checkpoint",
    "torch_state_dict_to_params",
]
