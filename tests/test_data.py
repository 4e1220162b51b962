"""Tests for dataset loading (Replica layout + synthetic scenes)."""

import os

import numpy as np
import pytest

from nerf_workspaces_explorer_tpu.data import ReplicaDataset, make_synthetic_scene
from nerf_workspaces_explorer_tpu.utils.viz import depth2rgb


def _write_png(path, array):
    import imageio

    imageio.imwrite(path, array)


@pytest.fixture
def fake_replica(tmp_path):
    """A tiny on-disk dataset in the Replica layout
    (reference nerf/datasets/replica_dataset.py:25-52)."""
    rng = np.random.default_rng(0)
    office = tmp_path / "office_test" / "Sequence_1"
    (office / "rgb").mkdir(parents=True)
    (office / "depth").mkdir(parents=True)
    n_frames, h, w = 13, 8, 10  # 13 so the last test id (10+2) stays in range
    poses = []
    for i in range(n_frames):
        rgb = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        depth = (rng.uniform(100, 5000, size=(h, w))).astype(np.uint16)
        _write_png(str(office / "rgb" / f"rgb_{i}.png"), rgb)
        _write_png(str(office / "depth" / f"depth_{i}.png"), depth)
        pose = np.eye(4)
        pose[0, 3] = i * 0.1
        poses.append(pose.reshape(-1))
    np.savetxt(str(office / "traj_w_c.txt"), np.stack(poses), delimiter=" ")
    return str(tmp_path), n_frames, h, w


def test_replica_split_ids(fake_replica):
    root, n_frames, h, w = fake_replica
    ds = ReplicaDataset("office_test", datasets_path=root)
    # Every 5th frame trains; test ids are train+2 (replica_dataset.py:42-43).
    assert len(ds.train) == len(range(0, n_frames, 5)) == 3
    assert len(ds.test) == 3
    np.testing.assert_allclose(ds.train.camera_pose[:, 0, 3], [0.0, 0.5, 1.0], atol=1e-6)
    np.testing.assert_allclose(ds.test.camera_pose[:, 0, 3], [0.2, 0.7, 1.2], atol=1e-6)


def test_replica_units_and_ranges(fake_replica):
    root, _, h, w = fake_replica
    ds = ReplicaDataset("office_test", datasets_path=root)
    assert ds.train.rgb.shape == (3, h, w, 3)
    assert ds.train.rgb.min() >= 0.0 and ds.train.rgb.max() <= 1.0
    # Depth mm -> meters.
    assert ds.train.depth.max() <= 5.0 + 1e-6
    assert ds.train.depth.min() >= 0.1 - 1e-6


def test_replica_resize(fake_replica):
    root, _, h, w = fake_replica
    ds = ReplicaDataset("office_test", datasets_path=root, image_height=4, image_width=6)
    assert ds.train.rgb.shape == (3, 4, 6, 3)
    assert ds.train.depth.shape == (3, 4, 6)


def test_replica_reference_accessors(fake_replica):
    root, *_ = fake_replica
    ds = ReplicaDataset("office_test", datasets_path=root)
    assert ds.train_dataset_len == 3
    assert set(ds.train_dataset) == {"rgb", "depth", "camera_pose"}
    assert "train" in str(ds)


def test_replica_scene_name_mapping(fake_replica, tmp_path):
    """A real Replica drop names directories office0..office4; the loader
    must resolve the office <-> scene mapping both ways (reference
    application/workspaces/mapping.txt:3-6)."""
    import shutil

    from nerf_workspaces_explorer_tpu.data.replica import (
        OFFICE_TO_REPLICA_SCENE,
        resolve_scene_dir,
    )

    root, *_ = fake_replica
    assert OFFICE_TO_REPLICA_SCENE == {
        "office_tokyo": "office0",
        "office_new_york": "office1",
        "office_geneve": "office2",
        "office_belgrade": "office4",
    }
    # Raw Replica naming on disk, framework office name requested.
    shutil.copytree(
        os.path.join(root, "office_test"), os.path.join(root, "office0")
    )
    ds = ReplicaDataset("office_tokyo", datasets_path=root)
    assert len(ds.train) == 3
    # And the scene name itself resolves too.
    assert resolve_scene_dir("office0", root).endswith("office0/Sequence_1")
    # Framework naming on disk wins when both exist.
    shutil.copytree(
        os.path.join(root, "office_test"), os.path.join(root, "office_belgrade")
    )
    assert resolve_scene_dir("office_belgrade", root).endswith(
        "office_belgrade/Sequence_1"
    )
    with pytest.raises(FileNotFoundError):
        resolve_scene_dir("office_geneve", root)


_REAL_DATA = os.path.join(
    os.path.dirname(__file__), "..", "replica_dataset"
)


@pytest.mark.skipif(
    not any(
        os.path.isdir(os.path.join(_REAL_DATA, d, "Sequence_1"))
        for d in ("office_tokyo", "office0")
    ),
    reason="real Replica data not present in this environment",
)
def test_real_replica_integration():
    ds = ReplicaDataset("office_tokyo", image_height=240, image_width=320)
    assert ds.train.rgb.shape[1:] == (240, 320, 3)
    assert ds.train_dataset_len > 0 and ds.test_dataset_len > 0
    assert np.all(np.isfinite(ds.train.camera_pose))


def test_synthetic_scene_generation():
    train, test, scene = make_synthetic_scene(n_train=4, n_test=2, height=16, width=20)
    assert train.rgb.shape == (4, 16, 20, 3)
    assert test.rgb.shape == (2, 16, 20, 3)
    assert train.camera_pose.shape == (4, 4, 4)
    assert np.all(np.isfinite(train.rgb))
    # The scene must have actual content (not all background).
    assert train.rgb.std() > 0.01
    # Poses are valid rotations with orbit-radius translations.
    rot = train.camera_pose[0, :3, :3]
    np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-5)


def test_room_scene_splits_reference_regime(tmp_path):
    """The reference-scale room scene follows the reference's exact split
    rule (train = every `stride`th walkthrough frame, test = train + 2 —
    replica_dataset.py:42-43) and keeps the camera path clear of geometry."""
    from nerf_workspaces_explorer_tpu.data.synthetic import (
        make_room_scene_splits,
        room_grid_poses,
        walkthrough_poses,
    )

    train, test, scene = make_room_scene_splits(
        n_frames=40, stride=10, height=12, width=16,
        cache_dir=str(tmp_path), gt_samples=64,
    )
    assert train.rgb.shape == (4, 12, 16, 3)
    assert test.rgb.shape == (4, 12, 16, 3)
    all_poses = walkthrough_poses(40, half=np.asarray(scene.half))
    np.testing.assert_allclose(train.camera_pose, all_poses[[0, 10, 20, 30]])
    np.testing.assert_allclose(test.camera_pose, all_poses[[2, 12, 22, 32]])
    # Interior views with real content everywhere (not blank walls).
    assert all(train.rgb[i].std() > 0.02 for i in range(4))
    assert np.all(np.isfinite(train.rgb)) and np.all(np.isfinite(test.rgb))
    # Rotations are valid; eyes stay inside the room.
    for pose in train.camera_pose:
        rot = pose[:3, :3]
        np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-5)
        assert np.all(np.abs(pose[:3, 3]) < np.asarray(scene.half))
    # Depth never collapses to the near plane (camera inside an object).
    assert float(train.depth.min()) > 0.12
    # Cache roundtrip: a second call serves identical arrays from disk.
    train2, test2, _ = make_room_scene_splits(
        n_frames=40, stride=10, height=12, width=16,
        cache_dir=str(tmp_path), gt_samples=64,
    )
    np.testing.assert_array_equal(train.rgb, train2.rgb)
    np.testing.assert_array_equal(test.depth, test2.depth)
    # Held-out probe grid for distillation gating: inside the room, valid.
    grid = room_grid_poses(half=np.asarray(scene.half), grid=2, yaws=(0, 180))
    assert grid.shape == (8, 4, 4)
    for pose in grid:
        rot = pose[:3, :3]
        np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-5)
        assert np.all(np.abs(pose[:3, 3]) < np.asarray(scene.half))


def test_depth2rgb():
    depth = np.linspace(0.1, 10.0, 64).reshape(8, 8)
    rgb = depth2rgb(depth, min_value=0.1, max_value=10.0)
    assert rgb.shape == (8, 8, 3) and rgb.dtype == np.uint8
    assert not np.array_equal(rgb[0, 0], rgb[-1, -1])
