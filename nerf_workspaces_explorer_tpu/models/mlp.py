"""The NeRF MLP as pure init/apply functions over a parameter pytree.

Parity target: reference nerf/models/nerf_model.py:10-83. Architecture (with
view dirs, the shipped configuration):
  - D=8 density layers of width W=256 with ReLU; the original 63-dim encoded
    position is re-concatenated onto the activations *after* layer index 4
    (skips=(4,)), so layer 5 consumes W+63 inputs (nerf_model.py:32-34,55-59);
  - heads: alpha (W->1, no activation), feature (W->W, no activation), one
    view layer (W+27 -> W//2=128, ReLU), rgb (128->3) (nerf_model.py:36-41,
    61-76);
  - output = concat([rgb(3), alpha(1)]) and optionally the 128-dim view-layer
    activations when `show_endpoint` (nerf_model.py:72-81).

TPU-native notes: parameters are a plain dict pytree of [in, out]-shaped
weight matrices (column-major relative to torch's nn.Linear [out, in]),
which is the layout `jnp.dot` feeds the MXU without transposes. Apply is a
statically unrolled 8-layer loop — fully fused by XLA — and dtype-polymorphic
(bf16 params/activations supported for the fast path; callers pin fp32 via
`jax.default_matmul_precision` for reference-parity rendering).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


class NerfMLPSpec(NamedTuple):
    """Static architecture description (hashable -> jit-static)."""

    depth: int = 8
    width: int = 256
    input_ch: int = 63
    input_ch_views: int = 27
    skips: tuple = (4,)
    use_view_dirs: bool = True
    output_ch: int = 4  # only used when use_view_dirs=False

    def layer_dims(self):
        """[(in, out)] for the density trunk, reproducing the skip layout of
        reference nerf_model.py:32-34."""
        dims = [(self.input_ch, self.width)]
        for i in range(self.depth - 1):
            in_dim = self.width + self.input_ch if i in self.skips else self.width
            dims.append((in_dim, self.width))
        return dims


def _init_linear(key: jax.Array, in_dim: int, out_dim: int) -> Dict[str, jnp.ndarray]:
    """Torch-style nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in)) for both
    weight and bias (what the reference trains from)."""
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(jnp.asarray(in_dim, dtype=jnp.float32))
    weight = jax.random.uniform(
        wkey, (in_dim, out_dim), minval=-bound, maxval=bound, dtype=jnp.float32
    )
    bias = jax.random.uniform(
        bkey, (out_dim,), minval=-bound, maxval=bound, dtype=jnp.float32
    )
    return {"w": weight, "b": bias}


def init_nerf_params(key: jax.Array, spec: NerfMLPSpec) -> Params:
    """Initialize the parameter pytree for one NeRF MLP."""
    n_keys = spec.depth + 4
    keys = jax.random.split(key, n_keys)
    params: Params = {
        "pts": [
            _init_linear(keys[i], in_dim, out_dim)
            for i, (in_dim, out_dim) in enumerate(spec.layer_dims())
        ]
    }
    if spec.use_view_dirs:
        params["feature"] = _init_linear(keys[spec.depth], spec.width, spec.width)
        params["alpha"] = _init_linear(keys[spec.depth + 1], spec.width, 1)
        params["views"] = [
            _init_linear(
                keys[spec.depth + 2],
                spec.width + spec.input_ch_views,
                spec.width // 2,
            )
        ]
        params["rgb"] = _init_linear(keys[spec.depth + 3], spec.width // 2, 3)
    else:
        params["output"] = _init_linear(keys[spec.depth], spec.width, spec.output_ch)
    return params


def _linear(layer: Dict[str, jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
    return jnp.dot(x, layer["w"]) + layer["b"]


def apply_nerf_mlp(
    params: Params,
    spec: NerfMLPSpec,
    encoded_pts: jnp.ndarray,
    encoded_views: jnp.ndarray | None = None,
    *,
    show_endpoint: bool = False,
) -> jnp.ndarray:
    """Forward pass: encoded inputs -> raw [rgb(3), sigma(1)] (+128-d feature).

    Matches reference nerf_model.py:45-83 exactly, including the post-ReLU
    skip concat ordering cat([input_pts, h]) and the activation-free alpha /
    feature heads.

    Args:
      encoded_pts: [..., input_ch].
      encoded_views: [..., input_ch_views] (required when use_view_dirs).
    Returns:
      [..., 4] (or [..., 4+width//2] when show_endpoint).
    """
    h = encoded_pts
    for i, layer in enumerate(params["pts"]):
        h = jax.nn.relu(_linear(layer, h))
        if i in spec.skips:
            h = jnp.concatenate([encoded_pts, h], axis=-1)

    if spec.use_view_dirs:
        if encoded_views is None:
            raise ValueError("use_view_dirs=True requires encoded_views")
        alpha = _linear(params["alpha"], h)
        feature = _linear(params["feature"], h)
        h = jnp.concatenate([feature, encoded_views], axis=-1)
        for layer in params["views"]:
            h = jax.nn.relu(_linear(layer, h))
        rgb = _linear(params["rgb"], h)
        outputs = jnp.concatenate([rgb, alpha], axis=-1)
        if show_endpoint:
            outputs = jnp.concatenate([outputs, h], axis=-1)
        return outputs

    return _linear(params["output"], h)
