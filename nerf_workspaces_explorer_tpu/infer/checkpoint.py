"""Checkpoint save/load and torch-checkpoint conversion.

The native format is a single `.npz` of path-flattened arrays plus a JSON
metadata blob — dependency-free, memory-mappable, and restorable without
pickles. The reference's torch format (a dict with `global_step`,
`network_coarse_state_dict`, `network_fine_state_dict`,
`optimizer_state_dict`; reference
nerf/training/nerf_replica_training_handler.py:404-407) is supported through
a converter so pretrained reference models drop straight into this framework.

Quirk parity: reference checkpoints may store param keys either with or
without the leading underscore of the module attribute names; the reference
re-prefixes `weight`/`bias` keys with `_` on load
(…inference_handler.py:150-164). The converter here accepts both spellings.

Layout conversion: torch `nn.Linear.weight` is [out, in]; our matmul-ready
layout is [in, out], so weights transpose on the way through.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Mapping, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from nerf_workspaces_explorer_tpu.models.mlp import NerfMLPSpec

Params = Dict[str, Any]

_SEP = "||"


def _flatten(tree: Any, prefix: str = "") -> List[Tuple[str, np.ndarray]]:
    out: List[Tuple[str, np.ndarray]] = []
    if isinstance(tree, Mapping):
        for k in sorted(tree):
            out.extend(_flatten(tree[k], f"{prefix}{k}{_SEP}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.extend(_flatten(v, f"{prefix}{i}{_SEP}"))
    elif tree is None:
        pass
    else:
        out.append((prefix.rstrip(_SEP), np.asarray(tree)))
    return out


def _unflatten(flat: Mapping[str, np.ndarray]) -> Any:
    """Rebuild nested dict/list structure from _SEP-joined key paths.

    Integer path components become list indices; everything else dict keys.
    """
    root: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split(_SEP)
        node = root
        for i, part in enumerate(parts):
            last = i == len(parts) - 1
            if last:
                node[part] = value
            else:
                node = node.setdefault(part, {})

    def fixup(node: Any) -> Any:
        if not isinstance(node, dict):
            return node
        if node and all(k.isdigit() for k in node):
            return [fixup(node[str(i)]) for i in range(len(node))]
        return {k: fixup(v) for k, v in node.items()}

    return fixup(root)


def save_checkpoint(
    path: str,
    params: Params,
    *,
    step: int = 0,
    opt_state: Any = None,
    metadata: Optional[Dict[str, Any]] = None,
) -> None:
    """Save params (+ optional optimizer state) as a flat .npz."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arrays = dict(_flatten({"params": params}))
    if opt_state is not None:
        import jax

        leaves, _ = jax.tree_util.tree_flatten(opt_state)
        for i, leaf in enumerate(leaves):
            arrays[f"opt{_SEP}{i}"] = np.asarray(leaf)
    meta = dict(metadata or {})
    meta["step"] = int(step)
    arrays["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_checkpoint(
    path: str, *, opt_state_template: Any = None
) -> Tuple[Params, int, Any, Dict[str, Any]]:
    """Load a native checkpoint. Returns (params, step, opt_state, metadata)."""
    with np.load(path) as data:
        arrays = {k: data[k] for k in data.files}
    meta = json.loads(bytes(arrays.pop("__meta__").tobytes()).decode())
    step = int(meta.pop("step", 0))

    opt_keys = sorted(
        (k for k in arrays if k.startswith(f"opt{_SEP}")),
        key=lambda k: int(k.split(_SEP)[1]),
    )
    opt_leaves = [arrays.pop(k) for k in opt_keys]
    opt_state = None
    if opt_leaves and opt_state_template is not None:
        import jax

        _, treedef = jax.tree_util.tree_flatten(opt_state_template)
        opt_state = jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(x) for x in opt_leaves]
        )

    tree = _unflatten({k: jnp.asarray(v) for k, v in arrays.items()})
    return tree["params"], step, opt_state, meta


def _strip_underscore(key: str) -> str:
    return key[1:] if key.startswith("_") else key


def torch_state_dict_to_params(
    state_dict: Mapping[str, Any], spec: Optional[NerfMLPSpec] = None
) -> Params:
    """Convert one torch NeRFModel state dict to our param pytree.

    Accepts keys with or without the `_` attribute prefix (the reference
    loader's transform_state_dict quirk, …inference_handler.py:150-164).
    Torch weights [out, in] transpose to [in, out].
    """
    norm: Dict[str, np.ndarray] = {}
    for key, value in state_dict.items():
        arr = np.asarray(getattr(value, "numpy", lambda: value)())
        parts = [_strip_underscore(p) for p in key.split(".")]
        norm[".".join(parts)] = arr

    def linear(name: str) -> Dict[str, jnp.ndarray]:
        return {
            "w": jnp.asarray(norm[f"{name}.weight"].T),
            "b": jnp.asarray(norm[f"{name}.bias"]),
        }

    n_pts = len({k.split(".")[1] for k in norm if k.startswith("pts_linears.")})
    params: Params = {"pts": [linear(f"pts_linears.{i}") for i in range(n_pts)]}
    if "alpha_linear.weight" in norm:
        params["alpha"] = linear("alpha_linear")
        params["feature"] = linear("feature_linear")
        n_views = len({k.split(".")[1] for k in norm if k.startswith("views_linears.")})
        params["views"] = [linear(f"views_linears.{i}") for i in range(n_views)]
        params["rgb"] = linear("rgb_linear")
    else:
        params["output"] = linear("output_linear")
    return params


def params_to_torch_state_dict(params: Params, *, underscore: bool = True) -> Dict[str, Any]:
    """Convert our param pytree to a torch-layout state dict (numpy values).

    Used by parity tests and to export checkpoints consumable by the
    reference application.
    """
    prefix = "_" if underscore else ""
    out: Dict[str, Any] = {}

    def put(name: str, layer: Mapping[str, Any]) -> None:
        out[f"{prefix}{name}.weight"] = np.asarray(layer["w"]).T.copy()
        out[f"{prefix}{name}.bias"] = np.asarray(layer["b"]).copy()

    for i, layer in enumerate(params["pts"]):
        put(f"pts_linears.{i}", layer)
    if "alpha" in params:
        put("alpha_linear", params["alpha"])
        put("feature_linear", params["feature"])
        for i, layer in enumerate(params["views"]):
            put(f"views_linears.{i}", layer)
        put("rgb_linear", params["rgb"])
    else:
        put("output_linear", params["output"])
    return out


def save_torch_checkpoint(
    path: str, coarse: Params, fine: Params, *, step: int = 0
) -> None:
    """Export a reference-format torch checkpoint so models trained with this
    framework load in the reference application (format per reference
    …training_handler.py:404-407)."""
    import torch

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    torch.save(
        {
            "global_step": int(step),
            "network_coarse_state_dict": {
                k: torch.tensor(v) for k, v in params_to_torch_state_dict(coarse).items()
            },
            "network_fine_state_dict": {
                k: torch.tensor(v) for k, v in params_to_torch_state_dict(fine).items()
            },
            "optimizer_state_dict": {},
        },
        path,
    )


def load_torch_checkpoint(path: str) -> Tuple[Params, Params, int]:
    """Load a reference-format torch checkpoint -> (coarse, fine, step).

    Requires torch (CPU build is fine); reference format per
    …training_handler.py:404-407.
    """
    import torch

    checkpoint = torch.load(path, map_location="cpu", weights_only=False)
    coarse = torch_state_dict_to_params(checkpoint["network_coarse_state_dict"])
    fine = torch_state_dict_to_params(checkpoint["network_fine_state_dict"])
    return coarse, fine, int(checkpoint.get("global_step", 0))
