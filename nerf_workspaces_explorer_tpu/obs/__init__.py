from nerf_workspaces_explorer_tpu.obs.tb import TensorboardWriter
from nerf_workspaces_explorer_tpu.obs.profiler import StepTimer, trace_context

__all__ = ["StepTimer", "TensorboardWriter", "trace_context"]
