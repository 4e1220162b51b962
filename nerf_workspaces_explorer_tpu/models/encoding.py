"""Sinusoidal positional encoding.

Parity target: reference nerf/models/embedding.py:6-48. The encoding maps
x -> [x, sin(2^0 x), cos(2^0 x), ..., sin(2^(F-1) x), cos(2^(F-1) x)] with the
input pre-divided by `scalar_factor`. 3D locations use F=10, factor=10
(-> 63 dims); view directions use F=4, factor=1 (-> 27 dims)
(reference …inference_handler.py:93-103).

TPU-native notes: the reference concatenates 2F+1 per-function tensors in a
Python loop; here a single broadcasted multiply produces all frequency
products at once and one sin + one cos evaluate them — two transcendental VPU
ops regardless of F. The interleaved [sin_f, cos_f] ordering per frequency is
preserved so weights are layout-compatible with reference checkpoints.
"""

from __future__ import annotations

import jax.numpy as jnp


def embedding_output_dim(num_freqs: int, input_dims: int = 3) -> int:
    """Output dim: identity + (sin, cos) per frequency per input dim."""
    return input_dims * (1 + 2 * num_freqs)


def positional_encoding(
    x: jnp.ndarray, num_freqs: int, scalar_factor: float = 1.0
) -> jnp.ndarray:
    """Encode [..., D] -> [..., D * (1 + 2 * num_freqs)].

    Output ordering matches the reference's function list (embedding.py:24-38):
    [x, sin(1*x), cos(1*x), sin(2*x), cos(2*x), ..., sin(2^(F-1) x), cos(2^(F-1) x)].
    """
    x = x / scalar_factor
    if num_freqs == 0:
        return x
    freqs = 2.0 ** jnp.arange(num_freqs, dtype=x.dtype)  # [F]
    # [..., F, D]: every frequency times every input dim.
    scaled = x[..., None, :] * freqs[:, None]
    sin = jnp.sin(scaled)
    cos = jnp.cos(scaled)
    # Interleave to [..., F, 2, D] -> [..., 2*F*D] giving per-frequency
    # [sin_f(x0..xD), cos_f(x0..xD)] blocks, identical to the reference concat.
    sincos = jnp.stack([sin, cos], axis=-2).reshape(*x.shape[:-1], -1)
    return jnp.concatenate([x, sincos], axis=-1)
