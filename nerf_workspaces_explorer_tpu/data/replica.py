"""Replica dataset loader.

Parity target: reference nerf/datasets/replica_dataset.py:20-161. Behaviors
preserved exactly:
  - directory layout `replica_dataset/<office>/Sequence_1/{traj_w_c.txt,
    rgb/rgb_*.png, depth/depth_*.png}` (replica_dataset.py:25-39);
  - train ids = every 5th frame, test ids = train ids + 2
    (replica_dataset.py:42-43);
  - images sorted by the integer frame index in their filename
    (replica_dataset.py:49-52);
  - RGB uint8 -> float /255; depth uint16 mm -> float meters /1000
    (replica_dataset.py:114-117);
  - bilinear resize to the configured H x W when it differs
    (replica_dataset.py:120-123);
  - poses from `loadtxt.reshape(-1, 4, 4)` (replica_dataset.py:46).

Depth is loaded but (as in the reference) never used by the photometric
loss — it exists for visualization. Decoding prefers cv2, falls back to PIL.
"""

from __future__ import annotations

import glob
import os
import re
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

DATASETS_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "replica_dataset")

# Office <-> Replica scene name mapping (reference
# application/workspaces/mapping.txt:3-6). A real Replica download drops
# directories named office0..office4; the loader accepts either naming.
OFFICE_TO_REPLICA_SCENE = {
    "office_tokyo": "office0",
    "office_new_york": "office1",
    "office_geneve": "office2",
    "office_belgrade": "office4",
}
REPLICA_SCENE_TO_OFFICE = {v: k for k, v in OFFICE_TO_REPLICA_SCENE.items()}


def resolve_scene_dir(office_name: str, datasets_path: str = DATASETS_PATH) -> str:
    """Resolve an office's `Sequence_1` directory, accepting both the
    framework naming (`office_tokyo`) and the raw Replica scene naming
    (`office0`) per the reference's mapping.txt."""
    candidates = [office_name]
    mapped = OFFICE_TO_REPLICA_SCENE.get(office_name)
    if mapped is not None:
        candidates.append(mapped)
    mapped_back = REPLICA_SCENE_TO_OFFICE.get(office_name)
    if mapped_back is not None:
        candidates.append(mapped_back)
    for cand in candidates:
        d = os.path.join(datasets_path, cand, "Sequence_1")
        if os.path.isdir(d):
            return d
    raise FileNotFoundError(
        f"no Replica sequence for {office_name!r} under {datasets_path!r} "
        f"(tried {candidates})"
    )


def _imread_rgb(path: str) -> np.ndarray:
    """Load an image as RGB float64 in [0, 1]."""
    try:
        import cv2

        bgr = cv2.imread(path)
        if bgr is None:
            raise IOError(f"cannot read {path}")
        return bgr[:, :, ::-1] / 255.0
    except ImportError:
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB")) / 255.0


def _imread_depth(path: str) -> np.ndarray:
    """Load a 16-bit depth image as float meters."""
    try:
        import cv2

        depth = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if depth is None:
            raise IOError(f"cannot read {path}")
        return depth / 1000.0
    except ImportError:
        from PIL import Image

        return np.asarray(Image.open(path), dtype=np.float64) / 1000.0


def _resize_bilinear(img: np.ndarray, width: int, height: int) -> np.ndarray:
    try:
        import cv2

        return cv2.resize(img, (width, height), interpolation=cv2.INTER_LINEAR)
    except ImportError:
        import jax.image

        if img.ndim == 2:
            return np.asarray(
                jax.image.resize(img, (height, width), method="bilinear")
            )
        return np.asarray(
            jax.image.resize(img, (height, width, img.shape[-1]), method="bilinear")
        )


@dataclass
class SceneData:
    """One split's data: [N, H, W, 3] rgb, [N, H, W] depth, [N, 4, 4] poses."""

    rgb: np.ndarray
    depth: np.ndarray
    camera_pose: np.ndarray

    def __len__(self) -> int:
        return self.rgb.shape[0]

    def as_dict(self) -> Dict[str, np.ndarray]:
        return {"rgb": self.rgb, "depth": self.depth, "camera_pose": self.camera_pose}


def _frame_index(path: str) -> int:
    match = re.search(r"_(\d+)\.\w+$", os.path.basename(path))
    if match is None:
        raise ValueError(f"unrecognized frame filename: {path}")
    return int(match.group(1))


class ReplicaDataset:
    """Train/test splits of one Replica office sequence."""

    def __init__(
        self,
        office_name: str,
        *,
        image_height: Optional[int] = None,
        image_width: Optional[int] = None,
        datasets_path: str = DATASETS_PATH,
        train_stride: int = 5,
        test_offset: int = 2,
    ) -> None:
        self._dataset_dir = resolve_scene_dir(office_name, datasets_path)
        self._img_h = image_height
        self._img_w = image_width

        traj_file = os.path.join(self._dataset_dir, "traj_w_c.txt")
        rgb_dir = os.path.join(self._dataset_dir, "rgb")
        depth_dir = os.path.join(self._dataset_dir, "depth")

        n_frames = len(os.listdir(rgb_dir))
        self._train_ids = list(range(0, n_frames, train_stride))
        self._test_ids = [i + test_offset for i in self._train_ids]

        self._camera_poses = np.loadtxt(traj_file, delimiter=" ").reshape(-1, 4, 4)
        self._rgb_images = sorted(glob.glob(rgb_dir + "/rgb*.png"), key=_frame_index)
        self._depth_images = sorted(
            glob.glob(depth_dir + "/depth*.png"), key=_frame_index
        )

        self.train = self._load_split(self._train_ids)
        self.test = self._load_split(self._test_ids)

    # Reference-compatible accessors (replica_dataset.py:66-82).
    @property
    def train_dataset(self) -> Dict[str, np.ndarray]:
        return self.train.as_dict()

    @property
    def test_dataset(self) -> Dict[str, np.ndarray]:
        return self.test.as_dict()

    @property
    def train_dataset_len(self) -> int:
        return len(self.train)

    @property
    def test_dataset_len(self) -> int:
        return len(self.test)

    def _load_frame(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        rgb = _imread_rgb(self._rgb_images[idx])
        depth = _imread_depth(self._depth_images[idx])
        if (self._img_h is not None and self._img_h != rgb.shape[0]) or (
            self._img_w is not None and self._img_w != rgb.shape[1]
        ):
            rgb = _resize_bilinear(rgb, self._img_w, self._img_h)
            depth = _resize_bilinear(depth, self._img_w, self._img_h)
        return rgb, depth

    def _load_split(self, ids: List[int]) -> SceneData:
        rgbs, depths, poses = [], [], []
        for idx in ids:
            rgb, depth = self._load_frame(idx)
            rgbs.append(rgb)
            depths.append(depth)
            poses.append(self._camera_poses[idx])
        return SceneData(
            rgb=np.asarray(rgbs, dtype=np.float32),
            depth=np.asarray(depths, dtype=np.float32),
            camera_pose=np.asarray(poses, dtype=np.float32),
        )

    def __str__(self) -> str:
        def split_str(name: str, split: SceneData) -> str:
            return (
                f"{name}: {len(split)} frames, rgb {split.rgb.shape} "
                f"{split.rgb.dtype}, depth {split.depth.shape}, "
                f"poses {split.camera_pose.shape}"
            )

        return (
            "ReplicaDataset\n"
            + split_str("train", self.train)
            + "\n"
            + split_str("test", self.test)
        )
