from nerf_workspaces_explorer_tpu.obs.tb import TensorboardWriter
from nerf_workspaces_explorer_tpu.obs.profiler import StepTimer, trace_context
from nerf_workspaces_explorer_tpu.obs.debug import (
    enable_nan_debugging,
    scan_outputs_finite,
)

__all__ = [
    "StepTimer",
    "TensorboardWriter",
    "enable_nan_debugging",
    "scan_outputs_finite",
    "trace_context",
]
