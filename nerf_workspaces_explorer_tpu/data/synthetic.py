"""Synthetic volumetric scenes for tests and benchmarks.

The Replica dataset is large binary data that isn't part of this repo (the
reference ships without it too — see reference .MISSING_LARGE_BLOBS). This
module builds a small analytic scene (colored Gaussian blobs in a box) and
renders ground-truth multi-view images by dense ray marching through the
*analytic* field with the same compositing math the model uses. A NeRF
trained on these images converges quickly, which gives the test suite a real
end-to-end train->render->PSNR path.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerf_workspaces_explorer_tpu.data.replica import SceneData
from nerf_workspaces_explorer_tpu.rays.raygen import create_rays
from nerf_workspaces_explorer_tpu.render.volume import composite_rays


class BlobScene(NamedTuple):
    """Colored Gaussian density blobs: centers [K,3], radii [K], colors [K,3],
    peak densities [K]."""

    centers: jnp.ndarray
    radii: jnp.ndarray
    colors: jnp.ndarray
    densities: jnp.ndarray


def default_scene(num_blobs: int = 5, seed: int = 0) -> BlobScene:
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-0.8, 0.8, size=(num_blobs, 3)).astype(np.float32)
    radii = rng.uniform(0.25, 0.5, size=(num_blobs,)).astype(np.float32)
    colors = rng.uniform(0.2, 1.0, size=(num_blobs, 3)).astype(np.float32)
    densities = rng.uniform(20.0, 60.0, size=(num_blobs,)).astype(np.float32)
    return BlobScene(
        centers=jnp.asarray(centers),
        radii=jnp.asarray(radii),
        colors=jnp.asarray(colors),
        densities=jnp.asarray(densities),
    )


def field_fn(scene: BlobScene, pts: jnp.ndarray) -> jnp.ndarray:
    """Analytic radiance field: [..., 3] points -> raw [..., 4].

    Returns pre-activation values compatible with `composite_rays` (rgb goes
    through a sigmoid there, sigma through a ReLU), so logit/identity maps
    are applied here.
    """
    d2 = jnp.sum(
        (pts[..., None, :] - scene.centers) ** 2, axis=-1
    )  # [..., K]
    blob = jnp.exp(-d2 / (2.0 * scene.radii**2))  # [..., K]
    sigma = jnp.sum(blob * scene.densities, axis=-1)  # [...]
    color_w = blob + 1e-8
    rgb = jnp.einsum("...k,kc->...c", color_w, scene.colors) / jnp.sum(
        color_w, axis=-1, keepdims=True
    )
    rgb = jnp.clip(rgb, 1e-4, 1.0 - 1e-4)
    rgb_logit = jnp.log(rgb) - jnp.log1p(-rgb)  # inverse sigmoid
    return jnp.concatenate([rgb_logit, sigma[..., None]], axis=-1)


def orbit_poses(
    n: int, radius: float = 2.5, height: float = 0.4, target=(0.0, 0.0, 0.0)
) -> np.ndarray:
    """Camera-to-world poses on a circle looking at the target.

    OpenCV convention to match ray generation (x right, y down, z forward).
    """
    target = np.asarray(target, dtype=np.float64)
    poses = []
    for k in range(n):
        angle = 2.0 * np.pi * k / n
        eye = np.array(
            [radius * np.cos(angle), height, radius * np.sin(angle)], dtype=np.float64
        )
        forward = target - eye
        forward /= np.linalg.norm(forward)
        world_up = np.array([0.0, -1.0, 0.0])  # -y so image "up" is world +y
        right = np.cross(world_up, forward)
        right /= np.linalg.norm(right)
        down = np.cross(forward, right)
        c2w = np.eye(4, dtype=np.float64)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, down, forward, eye
        poses.append(c2w)
    return np.stack(poses).astype(np.float32)


def render_ground_truth(
    scene: BlobScene,
    poses: np.ndarray,
    height: int,
    width: int,
    *,
    near: float = 0.1,
    far: float = 6.0,
    n_samples: int = 192,
    hfov_degrees: float = 90.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Dense-march the analytic field -> (rgb [N,H,W,3], depth [N,H,W])."""
    fx = width / 2.0 / np.tan(np.radians(hfov_degrees / 2.0))
    cx, cy = (width - 1.0) / 2.0, (height - 1.0) / 2.0

    @jax.jit
    def render_pose(c2w: jnp.ndarray):
        rays = create_rays(c2w[None], height, width, fx, fx, cx, cy, near, far)
        rays = rays.reshape(height * width)
        t = jnp.linspace(0.0, 1.0, n_samples, dtype=jnp.float32)
        z = rays.near * (1.0 - t) + rays.far * t
        pts = rays.origins[:, None, :] + rays.dirs[:, None, :] * z[..., None]
        raw = field_fn(scene, pts)
        out = composite_rays(raw, z, rays.dirs)
        return out.rgb.reshape(height, width, 3), out.depth.reshape(height, width)

    rgbs, depths = [], []
    for pose in poses:
        rgb, depth = render_pose(jnp.asarray(pose))
        rgbs.append(np.asarray(rgb))
        depths.append(np.asarray(depth))
    return np.stack(rgbs), np.stack(depths)


def make_synthetic_scene(
    n_train: int = 8,
    n_test: int = 2,
    height: int = 48,
    width: int = 64,
    *,
    seed: int = 0,
    near: float = 0.1,
    far: float = 6.0,
) -> Tuple[SceneData, SceneData, BlobScene]:
    """Build (train_split, test_split, scene) shaped like ReplicaDataset splits."""
    scene = default_scene(seed=seed)
    train_poses = orbit_poses(n_train)
    # Test poses interleave between train ones (rotated by half a step).
    test_all = orbit_poses(2 * max(n_test, 1) + 1, radius=2.4, height=0.6)
    test_poses = test_all[1 : 1 + n_test]

    train_rgb, train_depth = render_ground_truth(
        scene, train_poses, height, width, near=near, far=far
    )
    test_rgb, test_depth = render_ground_truth(
        scene, test_poses, height, width, near=near, far=far
    )
    train = SceneData(rgb=train_rgb, depth=train_depth, camera_pose=train_poses)
    test = SceneData(rgb=test_rgb, depth=test_depth, camera_pose=test_poses)
    return train, test, scene
