"""nerf_workspaces_explorer_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of the
NeRF Workspaces Explorer (reference: dmjovan/NeRF-Workspaces-Explorer).

The framework renders first-person views of Replica office scenes from floor-plan
clicks using coarse+fine NeRF models, and trains those models from Replica RGB
sequences. Unlike the reference (single-GPU PyTorch with Python chunk loops,
see reference utils/batch_utils.py:7-39), every hot path here is a jitted,
statically-shaped JAX program: ray generation, stratified + inverse-CDF
hierarchical sampling, sinusoidal encoding, the 8x256 MLP, and volume
compositing all trace into single XLA programs, with a fused Pallas kernel for
the encode+MLP+composite inner loop and `shard_map` ray sharding across a
`jax.sharding.Mesh` for multi-chip scaling.
"""

__version__ = "0.1.0"
