"""Tests for camera pose math (Euler -> c2w, Rodrigues deltas)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from nerf_workspaces_explorer_tpu.camera import (
    PinholeIntrinsics,
    camera_to_world_matrix,
    poses_from_coordinates,
    rodrigues,
)
from nerf_workspaces_explorer_tpu.core import COORD


def test_identity_pose_translation_only():
    c2w = camera_to_world_matrix(COORD(x=1.0, y=2.0, z=3.0))
    expected = np.eye(4, dtype=np.float32)
    expected[:3, 3] = [1.0, 2.0, 3.0]
    np.testing.assert_allclose(c2w, expected, atol=1e-7)


def test_rotation_applied_after_translation():
    # c2w = R @ T (reference utils/camera_poses.py:47): translation column is
    # R @ [x, y, z], not [x, y, z].
    c = COORD(x=1.0, y=0.0, z=0.0, yaw=90.0)
    c2w = camera_to_world_matrix(c)
    # yaw = +90 deg about Y maps x-hat -> (cos, 0, -sin) = (0, 0, -1).
    np.testing.assert_allclose(c2w[:3, 3], [0.0, 0.0, -1.0], atol=1e-6)


def test_euler_composition_order():
    c = COORD(yaw=10.0, pitch=20.0, roll=30.0)
    c2w = camera_to_world_matrix(c)
    deg = np.pi / 180.0
    r_yaw = Rotation.from_rotvec([0, 10 * deg, 0]).as_matrix()
    r_pitch = Rotation.from_rotvec([20 * deg, 0, 0]).as_matrix()
    r_roll = Rotation.from_rotvec([0, 0, 30 * deg]).as_matrix()
    np.testing.assert_allclose(c2w[:3, :3], r_roll @ r_pitch @ r_yaw, atol=1e-6)


def test_rodrigues_against_scipy():
    for rvec in ([0.3, -0.2, 0.9], [0.0, 0.0, 1.2], [1e-14, 0, 0], [0, 0, 0]):
        ours = rodrigues(np.array(rvec))
        scipy_r = Rotation.from_rotvec(rvec).as_matrix()
        np.testing.assert_allclose(ours, scipy_r, atol=1e-10)


def test_poses_from_coordinates_deltas():
    init = COORD(x=0.5, y=-0.5, z=1.0, pitch=-90.0)
    views = [COORD(), COORD(yaw=-30.0), COORD(pitch=30.0)]
    poses = poses_from_coordinates(init, views)
    assert poses.shape == (3, 4, 4)
    assert poses.dtype == np.float32

    base = camera_to_world_matrix(init)
    # Zero-delta view: unchanged.
    np.testing.assert_allclose(poses[0], base, atol=1e-6)
    # Yaw delta pre-multiplies a world-Z Rodrigues rotation
    # (reference utils/camera_poses.py:62-66).
    deg = np.pi / 180.0
    rz = Rotation.from_rotvec([0, 0, -30 * deg]).as_matrix()
    np.testing.assert_allclose(poses[1][:3, :3], rz @ base[:3, :3], atol=1e-6)
    # Translation column is untouched by deltas.
    np.testing.assert_allclose(poses[1][:3, 3], base[:3, 3], atol=1e-6)


def test_pinhole_intrinsics():
    intr = PinholeIntrinsics.from_hfov(240, 320, 90.0)
    assert intr.fx == pytest.approx(160.0)
    assert intr.fy == intr.fx
    assert intr.cx == pytest.approx(159.5)
    assert intr.cy == pytest.approx(119.5)
