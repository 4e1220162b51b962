"""Tests for core types and config parsing."""

import dataclasses
import math

import pytest

from nerf_workspaces_explorer_tpu.core import COORD, HW, load_config
from nerf_workspaces_explorer_tpu.core.config import FrameworkConfig, parse_int_expr


def test_coord_defaults_and_str():
    c = COORD()
    assert c == (0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    c = COORD(x=1.0, pitch=-90.0)
    assert "pitch (rotation over X axis) = -90.000" in str(c)


def test_hw_comparisons():
    assert HW(600, 800) >= HW(600, 600)
    assert HW(100, 100) <= HW(600, 600)
    assert not (HW(600, 100) >= HW(100, 600))


def test_parse_int_expr():
    assert parse_int_expr("1024*32") == 32768
    assert parse_int_expr("32*32*1") == 1024
    assert parse_int_expr(64) == 64
    assert parse_int_expr(64.0) == 64
    with pytest.raises(ValueError):
        parse_int_expr("__import__('os')")
    with pytest.raises(ValueError):
        parse_int_expr("1.5")


@pytest.mark.parametrize("office", ["tokyo", "new_york", "geneve", "belgrade"])
def test_load_office_config(office):
    cfg = load_config(office_name=office)
    assert cfg.experiment.image_width == 320
    assert cfg.experiment.image_height == 240
    assert cfg.model.chunk == 32768
    assert cfg.model.net_chunk == 32768
    assert cfg.inference.chunk == 8192
    assert cfg.rendering.n_rays == 1024
    assert cfg.rendering.n_samples == 64
    assert cfg.rendering.n_importance == 128
    assert cfg.rendering.depth_range == (0.1, 10.0)
    assert cfg.training.n_iterations == 200_000


def test_intrinsics_from_hfov():
    # Reference …inference_handler.py:67-74: fx = W/2/tan(45 deg) = W/2.
    cfg = FrameworkConfig()
    assert cfg.fx == pytest.approx(cfg.experiment.image_width / 2.0)
    assert cfg.fy == cfg.fx
    assert cfg.cx == pytest.approx((320 - 1) / 2.0)
    assert cfg.cy == pytest.approx((240 - 1) / 2.0)
    assert math.isclose(cfg.fx, 160.0, rel_tol=1e-12)


def test_config_immutable_and_hashable():
    cfg = FrameworkConfig()
    with pytest.raises(dataclasses.FrozenInstanceError):
        cfg.hfov_degrees = 100.0  # type: ignore[misc]
    hash(cfg)  # usable as a jit static argument
