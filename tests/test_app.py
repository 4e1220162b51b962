"""Tests for workspace calibration transforms and the app layer."""

import numpy as np
import pytest

from nerf_workspaces_explorer_tpu.app.workspace import (
    WORKSPACE_CLASSES,
    OfficeBelgradeWorkspace,
    OfficeGeneveWorkspace,
    OfficeNewYorkWorkspace,
    OfficeTokyoWorkspace,
    make_workspaces,
)
from nerf_workspaces_explorer_tpu.core import COORD

from tests.conftest import requires_reference


def _ws(cls):
    # Construction must be cheap and not touch checkpoints (lazy-load
    # contract, reference app.py:116 / workspace.py:28-29).
    return cls()


@pytest.mark.parametrize(
    "cls, rel, expected_xz",
    [
        # tokyo: rel_y -> x', rel_x -> z'; angle -10; at (0,0) -> (x'max, z'max)/cos
        (OfficeTokyoWorkspace, (0.0, 0.0), (2.0 / np.cos(np.deg2rad(-10)), 1.5 / np.cos(np.deg2rad(-10)))),
        (OfficeTokyoWorkspace, (1.0, 1.0), (-2.0 / np.cos(np.deg2rad(-10)), -3.0 / np.cos(np.deg2rad(-10)))),
        # new_york swaps axes: rel_x -> x', rel_y -> z'; angle 45
        (OfficeNewYorkWorkspace, (0.0, 1.0), (1.8 / np.cos(np.deg2rad(45)), -1.6 / np.cos(np.deg2rad(45)))),
        (OfficeGeneveWorkspace, (0.5, 0.5), ((1.7 - 2.5) / 2 / np.cos(np.deg2rad(35)), (4.2 - 2.8) / 2 / np.cos(np.deg2rad(35)))),
        (OfficeBelgradeWorkspace, (0.0, 0.0), (4.7 / np.cos(np.deg2rad(-10)), 3.5 / np.cos(np.deg2rad(-10)))),
    ],
)
def test_calibration_transforms(cls, rel, expected_xz):
    ws = _ws(cls)
    init, delta = ws.transform_relative_coordinates(rel[0], rel[1], 30, -15)
    assert init.x == pytest.approx(expected_xz[0], rel=1e-6)
    assert init.z == pytest.approx(expected_xz[1], rel=1e-6)
    assert init.y == -0.5
    assert init.pitch == -90.0
    # Horizontal angle is negated; vertical passes through (workspace.py:100).
    assert delta.yaw == -30.0
    assert delta.pitch == -15.0


def test_new_york_axis_swap_quirk():
    # rel_x moves x' for new_york but z' for tokyo.
    ny = _ws(OfficeNewYorkWorkspace)
    tk = _ws(OfficeTokyoWorkspace)
    ny_a, _ = ny.transform_relative_coordinates(0.0, 0.5, 0, 0)
    ny_b, _ = ny.transform_relative_coordinates(1.0, 0.5, 0, 0)
    assert ny_a.x != ny_b.x and ny_a.z == ny_b.z
    tk_a, _ = tk.transform_relative_coordinates(0.0, 0.5, 0, 0)
    tk_b, _ = tk.transform_relative_coordinates(1.0, 0.5, 0, 0)
    assert tk_a.z != tk_b.z and tk_a.x == tk_b.x


def test_make_workspaces_order_and_names():
    workspaces = make_workspaces()
    assert [w.name for w in workspaces] == [
        "Office Tokyo",
        "Office New York",
        "Office Geneve",
        "Office Belgrade",
    ]
    assert [w.office_name for w in workspaces] == list(WORKSPACE_CLASSES)
    assert workspaces[0].floor_plan_scale == (600, 600)
    assert workspaces[1].floor_plan_scale == (600, 800)


@requires_reference
def test_calibration_parity_with_reference():
    """Compare transforms against the actual reference workspace classes."""
    import sys

    sys.path.insert(0, "/root/reference")
    import application.workspace as ref_ws

    pairs = [
        (OfficeTokyoWorkspace, ref_ws.OfficeTokyoWorkspace),
        (OfficeNewYorkWorkspace, ref_ws.OfficeNewYorkWorkspace),
        (OfficeGeneveWorkspace, ref_ws.OfficeGeneveWorkspace),
        (OfficeBelgradeWorkspace, ref_ws.OfficeBelgradeWorkspace),
    ]
    rng = np.random.default_rng(0)
    for ours_cls, ref_cls in pairs:
        ours, ref = _ws(ours_cls), ref_cls()
        assert ours.name == ref.name
        assert tuple(ours.floor_plan_scale) == tuple(ref.floor_plan_scale)
        for _ in range(10):
            rel_x, rel_y = rng.uniform(0, 1, size=2)
            hor, ver = int(rng.integers(-90, 90)), int(rng.integers(-90, 90))
            init_a, delta_a = ours.transform_relative_coordinates(rel_x, rel_y, hor, ver)
            init_b, delta_b = ref._transform_relative_coordinates(rel_x, rel_y, hor, ver)
            np.testing.assert_allclose(np.asarray(init_a), np.asarray(init_b, dtype=float), atol=1e-12)
            np.testing.assert_allclose(np.asarray(delta_a), np.asarray(delta_b, dtype=float), atol=1e-12)
