"""Tests for native checkpoint save/load and torch conversion."""

import numpy as np
import jax
import optax
import pytest

from nerf_workspaces_explorer_tpu.infer.checkpoint import (
    load_checkpoint,
    load_torch_checkpoint,
    params_to_torch_state_dict,
    save_checkpoint,
    torch_state_dict_to_params,
)
from nerf_workspaces_explorer_tpu.models import NerfMLPSpec, init_nerf_params


@pytest.fixture
def params():
    spec = NerfMLPSpec(depth=4, width=32, input_ch=63, input_ch_views=27)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    return {
        "coarse": init_nerf_params(k1, spec),
        "fine": init_nerf_params(k2, spec),
    }


def _trees_equal(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_save_load_roundtrip(tmp_path, params):
    path = str(tmp_path / "model.npz")
    save_checkpoint(path, params, step=1234, metadata={"office": "tokyo"})
    restored, step, opt_state, meta = load_checkpoint(path)
    assert step == 1234
    assert meta["office"] == "tokyo"
    assert opt_state is None
    _trees_equal(params, restored)


def test_save_load_with_optimizer_state(tmp_path, params):
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    # Take one update so state is nontrivial.
    grads = jax.tree.map(lambda x: x * 0.01, params)
    updates, opt_state = opt.update(grads, opt_state, params)

    path = str(tmp_path / "model.npz")
    save_checkpoint(path, params, step=7, opt_state=opt_state)
    template = opt.init(params)
    _, step, restored_opt, _ = load_checkpoint(path, opt_state_template=template)
    assert step == 7
    _trees_equal(opt_state, restored_opt)


def test_torch_checkpoint_conversion(tmp_path, params):
    torch = pytest.importorskip("torch")
    # Build a reference-format .ckpt (…training_handler.py:404-407).
    ckpt = {
        "global_step": 20000,
        "network_coarse_state_dict": {
            k: torch.tensor(v)
            for k, v in params_to_torch_state_dict(params["coarse"]).items()
        },
        "network_fine_state_dict": {
            # Old-style keys without underscore prefix exercise the requirk.
            k: torch.tensor(v)
            for k, v in params_to_torch_state_dict(params["fine"], underscore=False).items()
        },
        "optimizer_state_dict": {},
    }
    path = str(tmp_path / "model.ckpt")
    torch.save(ckpt, path)

    coarse, fine, step = load_torch_checkpoint(path)
    assert step == 20000
    _trees_equal(params["coarse"], coarse)
    _trees_equal(params["fine"], fine)


def test_state_dict_shapes(params):
    sd = params_to_torch_state_dict(params["coarse"])
    # torch layout is [out, in].
    assert sd["_pts_linears.0.weight"].shape == (32, 63)
    assert sd["_rgb_linear.weight"].shape == (3, 16)
    restored = torch_state_dict_to_params(sd)
    _trees_equal(params["coarse"], restored)


def test_torch_export_roundtrip(tmp_path, params):
    torch = pytest.importorskip("torch")
    from nerf_workspaces_explorer_tpu.infer.checkpoint import save_torch_checkpoint

    path = str(tmp_path / "export.ckpt")
    save_torch_checkpoint(path, params["coarse"], params["fine"], step=42)
    coarse, fine, step = load_torch_checkpoint(path)
    assert step == 42
    _trees_equal(params["coarse"], coarse)
    _trees_equal(params["fine"], fine)


def test_convert_cli(tmp_path, params):
    pytest.importorskip("torch")
    from nerf_workspaces_explorer_tpu.cli.convert import main as convert_main
    from nerf_workspaces_explorer_tpu.infer.checkpoint import save_torch_checkpoint

    ckpt = str(tmp_path / "m.ckpt")
    npz = str(tmp_path / "m.npz")
    back = str(tmp_path / "m2.ckpt")
    save_torch_checkpoint(ckpt, params["coarse"], params["fine"], step=7)
    convert_main([ckpt, npz])
    convert_main([npz, back])
    coarse, fine, step = load_torch_checkpoint(back)
    assert step == 7
    _trees_equal(params["coarse"], coarse)
