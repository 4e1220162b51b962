"""Tests for toolkit-independent GUI logic and asset generation."""

import numpy as np
import pytest

from nerf_workspaces_explorer_tpu.app.assets import make_floor_plan, make_thumbnail
from nerf_workspaces_explorer_tpu.app.common import CameraViewState, click_to_relative


def test_click_to_relative_centered_image():
    # Image 600x400 centered in an 800x600 label: origin at (100, 100).
    rel = click_to_relative(100, 100, 800, 600, 600, 400)
    assert rel == (0.0, 0.0)
    rel = click_to_relative(400, 300, 800, 600, 600, 400)
    assert rel == pytest.approx((0.5, 0.5))
    rel = click_to_relative(699, 499, 800, 600, 600, 400)
    assert rel == pytest.approx((599 / 600, 399 / 400))


def test_click_outside_image_returns_none():
    assert click_to_relative(50, 300, 800, 600, 600, 400) is None
    assert click_to_relative(750, 300, 800, 600, 600, 400) is None
    assert click_to_relative(400, 50, 800, 600, 600, 400) is None
    # Right/bottom edges are exclusive (reference app.py:443).
    assert click_to_relative(700, 300, 800, 600, 600, 400) is None


def test_camera_view_state_steps_30_degrees():
    # Angle step is 30 (reference app.py:198 — code wins over docstrings).
    state = CameraViewState()
    assert state.angle_step == 30
    state.turn_left()
    assert state.horizontal_angle == -30
    state.turn_right()
    state.turn_right()
    assert state.horizontal_angle == 30
    state.turn_up()
    assert state.vertical_angle == 30
    state.turn_down()
    state.turn_down()
    assert state.vertical_angle == -30


def test_camera_view_state_reset():
    state = CameraViewState()
    state.set_position(0.3, 0.7)
    state.turn_left()
    assert state.render_args() == (0.3, 0.7, -30, 0)
    state.reset()
    assert state.render_args() == (0.0, 0.0, 0, 0)


def test_placeholder_assets():
    plan = make_floor_plan("Office Tokyo", 600, 600)
    assert plan.shape == (600, 600, 3) and plan.dtype == np.uint8
    thumb = make_thumbnail("Office Tokyo", seed=1)
    assert thumb.shape == (300, 400, 3)
    # Label pixels present (not a constant image).
    assert plan.std() > 1.0 and thumb.std() > 1.0


def test_coordinate_systems_plan_and_mapping(tmp_path):
    """Component 20 completeness: the coordinate-systems floor-plan analog
    (reference application/workspaces/office_*/floor_plan_coordinate_systems.jpg)
    and the mapping.txt analog (reference
    application/workspaces/mapping.txt:3-6)."""
    from nerf_workspaces_explorer_tpu.app.assets import (
        ensure_assets,
        ensure_mapping_file,
        make_coordinate_systems_plan,
    )

    coords = make_coordinate_systems_plan("Office Tokyo", 600, 600)
    plain = make_floor_plan("Office Tokyo", 600, 600)
    assert coords.shape == (600, 600, 3)
    assert not np.array_equal(coords, plain)  # axes annotations drawn

    path = ensure_mapping_file(str(tmp_path))
    content = open(path).read()
    for line in (
        "office0 -> office_tokyo",
        "office1 -> office_new_york",
        "office2 -> office_geneve",
        "office4 -> office_belgrade",
    ):
        assert line in content

    class FakeWorkspace:
        name = "Office Test"
        folder_path = str(tmp_path / "workspaces" / "office_test")
        floor_plan_scale = (120, 120)

    assets = ensure_assets(FakeWorkspace())
    assert set(assets) == {
        "thumbnail", "floor_plan", "floor_plan_coordinate_systems",
    }
    for p in assets.values():
        assert p.endswith(".png") and np.asarray(
            __import__("imageio").imread(p)
        ).size > 0


def test_gui_modules_importable():
    import nerf_workspaces_explorer_tpu.app.gui_tk  # noqa: F401

    try:
        import PyQt5  # noqa: F401

        import nerf_workspaces_explorer_tpu.app.gui_qt  # noqa: F401
    except ImportError:
        pass  # Qt backend is optional
