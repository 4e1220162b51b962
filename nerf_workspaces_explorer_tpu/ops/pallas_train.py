"""Fused Pallas field evaluation with a custom VJP (training fast path).

The training step's cost is dominated by the coarse+fine MLP forward and
backward over ~260k sample points (reference scale: 1024 rays x (64 + 192)
samples). XLA runs these with every layer's activations round-tripping HBM
in both directions. `nerf_field_train(params, pts, viewdirs)` is
functionally identical to encode + `apply_nerf_mlp` (reference run_network,
model_utils.py:13-30; returns raw rgb-logits + sigma) but:

  - the forward is one Pallas kernel (transposed [feature, point] layout,
    same encoding-permutation scheme as ops/pallas_render.py) with all
    activations resident in VMEM;
  - the backward is one Pallas kernel that RECOMPUTES the forward per tile
    (zero activation HBM traffic) and accumulates every weight/bias grad in
    VMEM scratch across the grid, flushing once at the last tile;
  - a hand-written pullback maps kernel-layout grads back to the model's
    param pytree (inverse encoding permutation, concat splits, head
    un-padding).

Gradients flow ONLY to params: points/view directions get zero cotangents
(the NeRF loss never needs them — importance z values are stop-gradient'ed
and rays are data; reference …training_handler.py:580).

Selected via `make_train_step(..., field_impl=...)`. Since round 4 this IS
the TPU training default (train/loop.py `field_impl="auto"` resolves to
"pallas" on TPU after the 50k-step drift study measured -0.05 dB vs the
XLA field — reports/long_horizon_50k_room.md); the XLA field remains the
CPU default and the fp32 cross-check path.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_workspaces_explorer_tpu.models.mlp import NerfMLPSpec
from nerf_workspaces_explorer_tpu.ops.pallas_render import (
    _enc_dim,
    _encode_ladder,
    _encoding_permutation,
    _freqs_from_input_ch,
    _permute_pad_in_rows as _perm_pad,
)

DEFAULT_ROW_TILE = 2048


def _inverse_perm_rows(dwk_t: jnp.ndarray, perm: np.ndarray, n_ref_rows: int) -> jnp.ndarray:
    """[enc_dim, out] kernel-row grads -> [n_ref_rows, out] reference rows."""
    inv = np.zeros((n_ref_rows,), dtype=np.int64)
    for kernel_row, ref_row in enumerate(perm):
        if ref_row >= 0:
            inv[ref_row] = kernel_row
    return dwk_t[inv]


def _build_kernel_inputs(
    params: Dict[str, Any], spec: NerfMLPSpec, dtype=jnp.bfloat16,
    *, with_transposed: bool = True,
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, Any]]:
    """Named kernel-layout arrays + static meta. Shared by fwd and bwd.

    `with_transposed=False` (the forward pass) omits the `*_t` weight
    transposes — only the backward kernel's gradient chain reads them, and
    shipping them to the fwd kernel doubled its VMEM weight footprint.
    w0 never needs a transpose: the trunk backward stops its g_h chain at
    layer 1 (input gradients are discarded)."""
    pts_freqs = _freqs_from_input_ch(spec.input_ch)
    view_freqs = _freqs_from_input_ch(spec.input_ch_views)
    pts_perm = _encoding_permutation(pts_freqs, _enc_dim(pts_freqs))
    view_perm = _encoding_permutation(view_freqs, _enc_dim(view_freqs))
    width = spec.width
    cast = lambda x: x.astype(dtype)
    f32 = lambda x: x.astype(jnp.float32)

    inputs: Dict[str, jnp.ndarray] = {}
    for i, layer in enumerate(params["pts"]):
        w = f32(layer["w"])
        if i == 0:
            wk = _perm_pad(w, pts_perm).T
        elif (i - 1) in spec.skips:
            inputs[f"wskip{i}"] = cast(_perm_pad(w[: spec.input_ch], pts_perm).T)
            wk = w[spec.input_ch :].T
        else:
            wk = w.T
        inputs[f"w{i}"] = cast(wk)
        if with_transposed and i > 0:
            inputs[f"w{i}_t"] = cast(wk.T)
        inputs[f"b{i}"] = f32(layer["b"])[:, None]

    w_feature = f32(params["feature"]["w"]).T
    inputs["w_feature"] = cast(w_feature)
    if with_transposed:
        inputs["w_feature_t"] = cast(w_feature.T)
    inputs["b_feature"] = f32(params["feature"]["b"])[:, None]
    w_alpha = jnp.zeros((8, width), jnp.float32).at[0:1].set(f32(params["alpha"]["w"]).T)
    inputs["w_alpha"] = cast(w_alpha)
    if with_transposed:
        inputs["w_alpha_t"] = cast(w_alpha.T)
    inputs["b_alpha"] = jnp.zeros((8, 1), jnp.float32).at[0, 0].set(
        f32(params["alpha"]["b"])[0]
    )
    w_view = f32(params["views"][0]["w"])
    w_view_h = w_view[:width].T
    inputs["w_view_h"] = cast(w_view_h)
    if with_transposed:
        inputs["w_view_h_t"] = cast(w_view_h.T)
    inputs["w_view_enc"] = cast(_perm_pad(w_view[width:], view_perm).T)
    inputs["b_view"] = f32(params["views"][0]["b"])[:, None]
    w_rgb = jnp.zeros((8, width // 2), jnp.float32).at[:3].set(f32(params["rgb"]["w"]).T)
    inputs["w_rgb"] = cast(w_rgb)
    if with_transposed:
        inputs["w_rgb_t"] = cast(w_rgb.T)
    inputs["b_rgb"] = jnp.zeros((8, 1), jnp.float32).at[:3, 0].set(f32(params["rgb"]["b"]))

    meta = dict(
        n_layers=len(params["pts"]),
        skips=tuple(spec.skips),
        pts_freqs=pts_freqs,
        view_freqs=view_freqs,
        width=width,
        input_ch=spec.input_ch,
        input_ch_views=spec.input_ch_views,
        dtype=dtype,
    )
    return inputs, meta


# Grad outputs, in a fixed named order built from meta.
def _grad_names(meta) -> List[str]:
    names = []
    for i in range(meta["n_layers"]):
        names.append(f"dw{i}")
        if i >= 1 and (i - 1) in meta["skips"]:
            names.append(f"dwskip{i}")
        names.append(f"db{i}")
    names += [
        "dw_feature", "db_feature", "dw_alpha", "db_alpha",
        "dw_view_h", "dw_view_enc", "db_view", "dw_rgb", "db_rgb",
    ]
    return names


def _grad_shapes(meta) -> Dict[str, Tuple[int, ...]]:
    width = meta["width"]
    enc = _enc_dim(meta["pts_freqs"])
    venc = _enc_dim(meta["view_freqs"])
    shapes = {}
    for i in range(meta["n_layers"]):
        in_dim = enc if i == 0 else width
        shapes[f"dw{i}"] = (width, in_dim)
        if i >= 1 and (i - 1) in meta["skips"]:
            shapes[f"dwskip{i}"] = (width, enc)
        shapes[f"db{i}"] = (width, 1)
    shapes["dw_feature"] = (width, width)
    shapes["db_feature"] = (width, 1)
    shapes["dw_alpha"] = (8, width)
    shapes["db_alpha"] = (8, 1)
    shapes["dw_view_h"] = (width // 2, width)
    shapes["dw_view_enc"] = (width // 2, venc)
    shapes["db_view"] = (width // 2, 1)
    shapes["dw_rgb"] = (8, width // 2)
    shapes["db_rgb"] = (8, 1)
    return shapes


def _encode(x, num_freqs, scalar_factor, dtype):
    """[3, T] coords -> [enc, T] features in kernel row order, via the
    shared octave-doubling ladder (see pallas_render._encode_ladder — the
    full-block `sin(phase_mat @ x)` this replaced was measured 2.3x more
    expensive on the render kernel's identical encode chain)."""
    return _encode_ladder(x * (1.0 / scalar_factor), num_freqs, dtype)


def _forward_from_refs(pts, views, get, meta):
    """Forward pass; returns (acts for bwd, raw [8, T])."""
    dtype = meta["dtype"]
    feat = _encode(pts, meta["pts_freqs"], 10.0, dtype)
    venc = _encode(views, meta["view_freqs"], 1.0, dtype)

    hs = []
    h = feat
    for i in range(meta["n_layers"]):
        acc = jnp.dot(get(f"w{i}"), h, preferred_element_type=jnp.float32)
        if i >= 1 and (i - 1) in meta["skips"]:
            acc = acc + jnp.dot(
                get(f"wskip{i}"), feat, preferred_element_type=jnp.float32
            )
        h = jax.nn.relu(acc + get(f"b{i}")).astype(dtype)
        hs.append(h)

    # Heads: feature/alpha have NO activation (reference nerf_model.py:63-64).
    feature = (
        jnp.dot(get("w_feature"), h, preferred_element_type=jnp.float32)
        + get("b_feature")
    ).astype(dtype)
    sigma = jnp.dot(get("w_alpha"), h, preferred_element_type=jnp.float32) + get("b_alpha")
    hv = jax.nn.relu(
        jnp.dot(get("w_view_h"), feature, preferred_element_type=jnp.float32)
        + jnp.dot(get("w_view_enc"), venc, preferred_element_type=jnp.float32)
        + get("b_view")
    ).astype(dtype)
    rgb = jnp.dot(get("w_rgb"), hv, preferred_element_type=jnp.float32) + get("b_rgb")

    raw = jnp.concatenate(
        [rgb[0:3], sigma[0:1], jnp.zeros_like(rgb[0:4])], axis=0
    )  # [8, T]: rows 0-2 rgb logits, 3 sigma
    return dict(feat=feat, venc=venc, hs=hs, feature=feature, hv=hv), raw


def _make_getter(names: List[str], refs) -> Any:
    index = {name: i for i, name in enumerate(names)}
    return lambda name: refs[index[name]][:]


def _fwd_kernel(pts_ref, views_ref, *refs, input_names, meta):
    get = _make_getter(input_names, refs[:-1])
    _, raw = _forward_from_refs(pts_ref[:], views_ref[:], get, meta)
    refs[-1][:] = raw



def _outer(g, h):
    """dW[a, b] = sum_t g[a, t] * h[b, t] — MXU contraction over the lane
    axis of both operands, avoiding any in-kernel transpose."""
    return jax.lax.dot_general(
        g, h, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

def _bwd_kernel(pts_ref, views_ref, g_ref, *refs, input_names, grad_names, meta):
    n_in = len(input_names)
    get = _make_getter(input_names, refs[:n_in])
    # Output blocks have constant index maps, so they stay resident in VMEM
    # across the whole grid and serve directly as the accumulators (no
    # separate scratch; they flush to HBM once at the end).
    acc_refs = {name: refs[n_in + i] for i, name in enumerate(grad_names)}

    t = pl.program_id(0)
    dtype = meta["dtype"]

    @pl.when(t == 0)
    def _init():
        for name in grad_names:
            acc_refs[name][:] = jnp.zeros_like(acc_refs[name])

    acts, _ = _forward_from_refs(pts_ref[:], views_ref[:], get, meta)
    feat, venc, hs = acts["feat"], acts["venc"], acts["hs"]
    feature, hv = acts["feature"], acts["hv"]

    def add(name, val):
        acc_refs[name][:] = acc_refs[name][:] + val

    def rowsum(x):
        return jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)

    g = g_ref[:]  # [8, T] fp32
    zeros5 = jnp.zeros_like(g[0:5])
    g_rgb = jnp.concatenate([g[0:3], zeros5], axis=0)
    g_sigma = jnp.concatenate([g[3:4], jnp.zeros_like(g[0:7])], axis=0)

    # rgb head
    g_rgb_c = g_rgb.astype(dtype)
    add("dw_rgb", _outer(g_rgb_c, hv))
    add("db_rgb", rowsum(g_rgb))
    g_hv = jnp.dot(get("w_rgb_t"), g_rgb_c, preferred_element_type=jnp.float32)
    # bf16 cmpf is unsupported on this target — compare in fp32.
    g_hv = (g_hv * (hv.astype(jnp.float32) > 0)).astype(dtype)

    # view layer
    add("dw_view_h", _outer(g_hv, feature))
    add("dw_view_enc", _outer(g_hv, venc))
    add("db_view", rowsum(g_hv))
    g_feature = jnp.dot(get("w_view_h_t"), g_hv, preferred_element_type=jnp.float32)
    g_feature_c = g_feature.astype(dtype)

    # feature + alpha heads (both consume h_last)
    h_last = hs[-1]
    add("dw_feature", _outer(g_feature_c, h_last))
    add("db_feature", rowsum(g_feature))
    g_sigma_c = g_sigma.astype(dtype)
    add("dw_alpha", _outer(g_sigma_c, h_last))
    add("db_alpha", rowsum(g_sigma))

    g_h = jnp.dot(get("w_feature_t"), g_feature_c, preferred_element_type=jnp.float32)
    g_h = g_h + jnp.dot(get("w_alpha_t"), g_sigma_c, preferred_element_type=jnp.float32)

    # trunk backward
    for i in range(meta["n_layers"] - 1, -1, -1):
        g_h = g_h * (hs[i].astype(jnp.float32) > 0)
        g_c = g_h.astype(dtype)
        h_prev = feat if i == 0 else hs[i - 1]
        add(f"dw{i}", _outer(g_c, h_prev))
        if i >= 1 and (i - 1) in meta["skips"]:
            add(f"dwskip{i}", _outer(g_c, feat))
        add(f"db{i}", rowsum(g_h))
        if i > 0:
            g_h = jnp.dot(get(f"w{i}_t"), g_c, preferred_element_type=jnp.float32)




def _pad_cols(x: jnp.ndarray, padded: int) -> jnp.ndarray:
    n = x.shape[-1]
    return x if n == padded else jnp.pad(x, ((0, 0), (0, padded - n)))


def _run_fwd(inputs, meta, pts_t, views_t, row_tile, interpret):
    n = pts_t.shape[-1]
    n_tiles = -(-n // row_tile)
    padded = n_tiles * row_tile
    pts_t = _pad_cols(pts_t, padded)
    views_t = _pad_cols(views_t, padded)
    names = list(inputs)

    def tile_spec(rows):
        return pl.BlockSpec((rows, row_tile), lambda i: (0, i), memory_space=pltpu.VMEM)

    in_specs = [tile_spec(3), tile_spec(3)] + [
        # bind ndim per-value (a bare `v.ndim` would late-bind to the last v)
        pl.BlockSpec(v.shape, lambda i, nd=v.ndim: (0,) * nd, memory_space=pltpu.VMEM)
        for v in inputs.values()
    ]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, input_names=names, meta=meta),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=tile_spec(8),
        out_shape=jax.ShapeDtypeStruct((8, padded), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pts_t, views_t, *inputs.values())
    return out[:, :n]


def _run_bwd(inputs, meta, pts_t, views_t, g_raw, row_tile, interpret):
    n = pts_t.shape[-1]
    n_tiles = -(-n // row_tile)
    padded = n_tiles * row_tile
    pts_t = _pad_cols(pts_t, padded)
    views_t = _pad_cols(views_t, padded)
    g_raw = _pad_cols(g_raw, padded)  # zero cotangents on padding
    names = list(inputs)
    grad_names = _grad_names(meta)
    shapes = _grad_shapes(meta)

    def tile_spec(rows):
        return pl.BlockSpec((rows, row_tile), lambda i: (0, i), memory_space=pltpu.VMEM)

    in_specs = [tile_spec(3), tile_spec(3), tile_spec(8)] + [
        # bind ndim per-value (a bare `v.ndim` would late-bind to the last v)
        pl.BlockSpec(v.shape, lambda i, nd=v.ndim: (0,) * nd, memory_space=pltpu.VMEM)
        for v in inputs.values()
    ]
    out_shapes = [jax.ShapeDtypeStruct(shapes[g], jnp.float32) for g in grad_names]
    out_specs = [
        pl.BlockSpec(shapes[g], lambda i: (0, 0), memory_space=pltpu.VMEM)
        for g in grad_names
    ]

    grads = pl.pallas_call(
        functools.partial(
            _bwd_kernel, input_names=names, grad_names=grad_names, meta=meta
        ),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(pts_t, views_t, g_raw, *inputs.values())
    return dict(zip(grad_names, grads))


def _grads_to_pytree(kgrads: Dict[str, jnp.ndarray], params, meta) -> Dict[str, Any]:
    """Map kernel-layout grads back onto the model param pytree."""
    pts_perm = _encoding_permutation(meta["pts_freqs"], _enc_dim(meta["pts_freqs"]))
    view_perm = _encoding_permutation(meta["view_freqs"], _enc_dim(meta["view_freqs"]))
    input_ch = meta["input_ch"]
    input_ch_views = meta["input_ch_views"]

    pts_grads = []
    for i in range(meta["n_layers"]):
        dwk = kgrads[f"dw{i}"]  # [width, in_k]
        if i == 0:
            dw = _inverse_perm_rows(dwk.T, pts_perm, input_ch)
        elif (i - 1) in meta["skips"]:
            d_enc = _inverse_perm_rows(kgrads[f"dwskip{i}"].T, pts_perm, input_ch)
            dw = jnp.concatenate([d_enc, dwk.T], axis=0)
        else:
            dw = dwk.T
        pts_grads.append({"w": dw, "b": kgrads[f"db{i}"][:, 0]})

    dview = jnp.concatenate(
        [
            kgrads["dw_view_h"].T,
            _inverse_perm_rows(kgrads["dw_view_enc"].T, view_perm, input_ch_views),
        ],
        axis=0,
    )
    return {
        "pts": pts_grads,
        "feature": {"w": kgrads["dw_feature"].T, "b": kgrads["db_feature"][:, 0]},
        "alpha": {"w": kgrads["dw_alpha"][0:1].T, "b": kgrads["db_alpha"][0:1, 0]},
        "views": [{"w": dview, "b": kgrads["db_view"][:, 0]}],
        "rgb": {"w": kgrads["dw_rgb"][0:3].T, "b": kgrads["db_rgb"][0:3, 0]},
    }


def make_field_train_fn(
    spec: NerfMLPSpec, *, row_tile: int = DEFAULT_ROW_TILE, interpret: bool = False
):
    """Build the custom-VJP field function for one architecture.

    Returns fn(params, pts [N, 3], viewdirs [N, 3]) -> raw [N, 4]
    (rgb logits + sigma, same contract as encode+apply_nerf_mlp).
    """
    if jax.devices()[0].platform == "cpu":
        interpret = True  # CPU runs (tests, dryrun) use the interpreter

    @jax.custom_vjp
    def field(params, pts, viewdirs):
        return _field_fwd(params, pts, viewdirs)[0]

    def _field_fwd(params, pts, viewdirs):
        inputs, meta = _build_kernel_inputs(params, spec, with_transposed=False)
        raw_t = _run_fwd(
            inputs, meta, pts.T.astype(jnp.float32), viewdirs.T.astype(jnp.float32),
            row_tile, interpret,
        )
        return raw_t[:4].T, (params, pts, viewdirs)

    def _field_bwd(residuals, g):
        params, pts, viewdirs = residuals
        inputs, meta = _build_kernel_inputs(params, spec)
        g_t = jnp.concatenate([g.T, jnp.zeros((4, g.shape[0]), g.dtype)], axis=0)
        kgrads = _run_bwd(
            inputs, meta, pts.T.astype(jnp.float32), viewdirs.T.astype(jnp.float32),
            g_t.astype(jnp.float32), row_tile, interpret,
        )
        dparams = _grads_to_pytree(kgrads, params, meta)
        return dparams, jnp.zeros_like(pts), jnp.zeros_like(viewdirs)

    field.defvjp(_field_fwd, _field_bwd)
    return field
