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

import os
from typing import NamedTuple, Optional, Tuple

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


class RoomScene(NamedTuple):
    """Analytic 'office room' scene at reference scale: textured walls,
    floor and ceiling around the camera plus solid furniture-like objects
    (anisotropic Gaussian blobs and soft boxes) with procedurally patterned
    colors.

    Built for the reference's training regime (round-3 VERDICT item 2): the
    reference trains on ~180 interior views of a Replica office (every 5th
    frame of a ~900-frame walkthrough, replica_dataset.py:42-43) and its
    published curves reach 23-39 dB at 200k steps. A 12-view orbit of
    free-floating blobs overfits by 5k steps; this scene is viewed from
    INSIDE with wall texture everywhere, so held-out test views measure
    generalization the way the reference's do.
    """

    half: jnp.ndarray  # [3] room half-extents (meters)
    wall_sharp: float  # wall density ramp sharpness (1/m)
    wall_density: float
    wall_freqs: jnp.ndarray  # [3, 3] per-channel texture frequencies
    wall_phases: jnp.ndarray  # [3]
    blob_centers: jnp.ndarray  # [K, 3]
    blob_inv_r2: jnp.ndarray  # [K, 3] per-axis 1/r^2 (anisotropic)
    blob_colors: jnp.ndarray  # [K, 3]
    blob_densities: jnp.ndarray  # [K]
    blob_pattern: jnp.ndarray  # [K, 3] color-modulation frequencies
    box_centers: jnp.ndarray  # [M, 3]
    box_half: jnp.ndarray  # [M, 3]
    box_colors: jnp.ndarray  # [M, 3]
    box_densities: jnp.ndarray  # [M]
    box_pattern: jnp.ndarray  # [M, 3]
    box_sharp: float


def room_scene(
    num_blobs: int = 8, num_boxes: int = 6, seed: int = 7
) -> RoomScene:
    """A 5 x 2.8 x 6 m room with `num_blobs` + `num_boxes` objects placed in
    the lower half (furniture height), textures within the band the shipped
    positional encoding resolves (10 freqs over x/10 -> up to ~51 rad/m)."""
    rng = np.random.default_rng(seed)
    half = np.array([2.5, 1.4, 3.0], dtype=np.float32)
    place = half * np.array([0.78, 0.55, 0.78], dtype=np.float32)

    centers = rng.uniform(-1.0, 1.0, size=(num_blobs, 3)).astype(np.float32) * place
    # Furniture sits ON THE FLOOR (y is DOWN: floor at +hy). The walkthrough
    # camera bobs in y ∈ [-0.24, +0.08]·hy, so centers at >= 0.5·hy with
    # radii <= 0.45 m never intersect the path (no degenerate close-ups).
    centers[:, 1] = rng.uniform(0.5, 0.82, size=num_blobs) * half[1]
    radii = rng.uniform(0.18, 0.45, size=(num_blobs, 3)).astype(np.float32)
    blob_colors = rng.uniform(0.15, 1.0, size=(num_blobs, 3)).astype(np.float32)
    blob_densities = rng.uniform(30.0, 80.0, size=(num_blobs,)).astype(np.float32)
    blob_pattern = rng.uniform(4.0, 9.0, size=(num_blobs, 3)).astype(
        np.float32
    ) * rng.choice([-1.0, 1.0], size=(num_blobs, 3)).astype(np.float32)

    box_centers = rng.uniform(-1.0, 1.0, size=(num_boxes, 3)).astype(np.float32) * place
    box_centers[:, 1] = rng.uniform(0.55, 0.85, size=num_boxes) * half[1]
    box_half = rng.uniform(0.15, 0.45, size=(num_boxes, 3)).astype(np.float32)
    box_colors = rng.uniform(0.15, 1.0, size=(num_boxes, 3)).astype(np.float32)
    box_densities = rng.uniform(40.0, 90.0, size=(num_boxes,)).astype(np.float32)
    box_pattern = rng.uniform(5.0, 11.0, size=(num_boxes, 3)).astype(
        np.float32
    ) * rng.choice([-1.0, 1.0], size=(num_boxes, 3)).astype(np.float32)

    return RoomScene(
        half=jnp.asarray(half),
        wall_sharp=24.0,
        wall_density=120.0,
        wall_freqs=jnp.asarray(
            rng.uniform(2.5, 7.5, size=(3, 3)).astype(np.float32)
            * rng.choice([-1.0, 1.0], size=(3, 3)).astype(np.float32)
        ),
        wall_phases=jnp.asarray(
            rng.uniform(0.0, 2.0 * np.pi, size=(3,)).astype(np.float32)
        ),
        blob_centers=jnp.asarray(centers),
        blob_inv_r2=jnp.asarray(1.0 / radii**2),
        blob_colors=jnp.asarray(blob_colors),
        blob_densities=jnp.asarray(blob_densities),
        blob_pattern=jnp.asarray(blob_pattern),
        box_centers=jnp.asarray(box_centers),
        box_half=jnp.asarray(box_half),
        box_colors=jnp.asarray(box_colors),
        box_densities=jnp.asarray(box_densities),
        box_pattern=jnp.asarray(box_pattern),
        box_sharp=28.0,
    )


def room_field_fn(scene: RoomScene, pts: jnp.ndarray) -> jnp.ndarray:
    """Analytic radiance field of a RoomScene: [..., 3] -> raw [..., 4]
    (rgb as logits for the compositing sigmoid, sigma pre-ReLU)."""
    p = pts

    # Walls: density ramps on smoothly past each face of the room box; the
    # three axes sum so corners/edges stay solid.
    outside = jax.nn.sigmoid((jnp.abs(p) - scene.half) * scene.wall_sharp)
    w_wall = scene.wall_density * jnp.sum(outside, axis=-1)  # [...]
    # Wall texture: smooth multi-frequency color field (per channel its own
    # 3-frequency mix), detail well inside the positional-encoding band.
    phase = jnp.einsum("...i,ci->...c", p, scene.wall_freqs) + scene.wall_phases
    wall_rgb = (
        0.52
        + 0.30 * jnp.sin(phase) * jnp.cos(0.6 * phase[..., ::-1] + 1.3)
        + 0.12 * jnp.sin(2.7 * phase + 0.7)  # fine detail band (~7-20 rad/m)
    )  # [..., 3]

    # Anisotropic Gaussian blobs.
    d2 = jnp.sum(
        (p[..., None, :] - scene.blob_centers) ** 2 * scene.blob_inv_r2,
        axis=-1,
    )  # [..., K]
    blob = jnp.exp(-0.5 * d2)
    w_blob = blob * scene.blob_densities  # [..., K]
    blob_mod = 0.78 + 0.22 * jnp.sin(
        jnp.einsum("...i,ki->...k", p, scene.blob_pattern)
    )  # [..., K]
    blob_rgb = scene.blob_colors * blob_mod[..., None]  # [..., K, 3]

    # Soft boxes (product of per-axis smooth indicators).
    inside = jax.nn.sigmoid(
        (scene.box_half - jnp.abs(p[..., None, :] - scene.box_centers))
        * scene.box_sharp
    )  # [..., M, 3]
    box = jnp.prod(inside, axis=-1)  # [..., M]
    w_box = box * scene.box_densities
    box_mod = 0.72 + 0.28 * jnp.sin(
        jnp.einsum("...i,mi->...m", p, scene.box_pattern)
    )
    box_rgb = scene.box_colors * box_mod[..., None]  # [..., M, 3]

    sigma = w_wall + jnp.sum(w_blob, axis=-1) + jnp.sum(w_box, axis=-1)
    weight_sum = w_wall + jnp.sum(w_blob, axis=-1) + jnp.sum(w_box, axis=-1) + 1e-6
    rgb = (
        w_wall[..., None] * wall_rgb
        + jnp.einsum("...k,...kc->...c", w_blob, blob_rgb)
        + jnp.einsum("...m,...mc->...c", w_box, box_rgb)
    ) / weight_sum[..., None]
    rgb = jnp.clip(rgb, 1e-4, 1.0 - 1e-4)
    rgb_logit = jnp.log(rgb) - jnp.log1p(-rgb)
    return jnp.concatenate([rgb_logit, sigma[..., None]], axis=-1)


def walkthrough_poses(
    n_frames: int, half=(2.5, 1.4, 3.0), seed: int = 0
) -> np.ndarray:
    """A ~`n_frames`-step walkthrough of the room interior (the analog of
    Replica Sequence_1's traj_w_c.txt): a figure-eight path with gentle
    height bob, gaze sweeping around the walls ahead of the camera. OpenCV
    camera convention (x right, y DOWN, z forward) to match ray generation.
    """
    hx, hy, hz = (float(h) for h in half)
    t = 2.0 * np.pi * np.arange(n_frames) / n_frames
    eye = np.stack(
        [
            0.55 * hx * np.sin(t + 0.35 * np.sin(2 * t)),
            0.16 * hy * np.sin(3 * t) - 0.08 * hy,
            0.55 * hz * np.sin(2 * t),
        ],
        axis=-1,
    )
    # Gaze target leads the camera around the walls: a point orbiting near
    # the room boundary with slow vertical drift.
    phi = t * 3.0 + 0.5
    target = np.stack(
        [
            0.85 * hx * np.cos(phi),
            # Slight downward bias so the floor furniture enters the frame.
            0.28 * hy * np.sin(1.7 * phi + 1.0) + 0.22 * hy,
            0.85 * hz * np.sin(phi),
        ],
        axis=-1,
    )
    poses = []
    for k in range(n_frames):
        forward = target[k] - eye[k]
        forward = forward / np.linalg.norm(forward)
        world_up = np.array([0.0, -1.0, 0.0])
        right = np.cross(world_up, forward)
        right /= np.linalg.norm(right)
        down = np.cross(forward, right)
        c2w = np.eye(4, dtype=np.float64)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = (
            right, down, forward, eye[k],
        )
        poses.append(c2w)
    return np.stack(poses).astype(np.float32)


def room_grid_poses(
    half=(2.5, 1.4, 3.0),
    grid: int = 3,
    yaws=(0.0, 90.0, 180.0, 270.0),
    y: float = -0.1,
    margin: float = 0.45,
) -> np.ndarray:
    """Held-out probe poses for distillation gating: a `grid` x `grid`
    lattice of positions over the floor extent crossed with fixed yaw
    headings — deliberately OFF the walkthrough trajectory (round-3 VERDICT
    item 5: gate the student on poses far from the distillation tour)."""
    hx, _, hz = (float(h) for h in half)
    xs = np.linspace(-hx * (1 - margin), hx * (1 - margin), grid)
    zs = np.linspace(-hz * (1 - margin), hz * (1 - margin), grid)
    poses = []
    for x in xs:
        for z in zs:
            for yaw in yaws:
                a = np.radians(yaw)
                forward = np.array([np.sin(a), 0.12, np.cos(a)])
                forward /= np.linalg.norm(forward)
                world_up = np.array([0.0, -1.0, 0.0])
                right = np.cross(world_up, forward)
                right /= np.linalg.norm(right)
                down = np.cross(forward, right)
                c2w = np.eye(4, dtype=np.float64)
                c2w[:3, 0], c2w[:3, 1], c2w[:3, 2] = right, down, forward
                c2w[:3, 3] = np.array([x, y, z])
                poses.append(c2w)
    return np.stack(poses).astype(np.float32)


def room_coverage_poses(half=(2.5, 1.4, 3.0)) -> np.ndarray:
    """Off-tour distillation COVERAGE views for interior scenes: a 4x4
    position lattice crossed with 45-degree-offset yaws at two camera
    heights — disjoint from the 3x3/axis-aligned probe grid the turbo gate
    holds out (`room_grid_poses`) by construction. Tour-only distillation
    collapses off-tour on interiors (student 18.84 dB vs teacher 27.84,
    reports/quality_gate_room_20k.md); adding these views plus the 50k
    budget recovers the probe-grid gate
    (reports/quality_gate_room_turbo_fix_6x192_50k.md)."""
    half = np.asarray(half, dtype=np.float32)
    return np.concatenate([
        room_grid_poses(half=half, grid=4,
                        yaws=(45.0, 135.0, 225.0, 315.0), y=-0.3),
        room_grid_poses(half=half, grid=4,
                        yaws=(45.0, 135.0, 225.0, 315.0), y=0.15),
    ])


def render_room_ground_truth(
    scene: RoomScene,
    poses: np.ndarray,
    height: int,
    width: int,
    *,
    near: float = 0.1,
    far: float = 8.0,
    n_samples: int = 320,
    hfov_degrees: float = 90.0,
    cache_dir: Optional[str] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Dense-march the analytic room field -> (rgb [N,H,W,3], depth).

    Pass `cache_dir` to memoize on disk, keyed by the pose set and every
    geometry/sampling parameter (same convention as
    `make_room_scene_splits`) — probe-grid/coverage GT is re-rendered by
    every gate run otherwise.
    """
    poses = np.asarray(poses, dtype=np.float32)
    key = None
    if cache_dir is not None:
        import hashlib

        digest = hashlib.md5()
        digest.update(
            repr((height, width, near, far, n_samples, hfov_degrees,
                  _ROOM_GT_VERSION)).encode()
        )
        digest.update(np.ascontiguousarray(poses).tobytes())
        for field in scene:
            digest.update(
                np.ascontiguousarray(np.asarray(field, np.float32)).tobytes()
            )
        key = os.path.join(
            cache_dir, f"room_gt_{digest.hexdigest()[:12]}.npz"
        )
        if os.path.exists(key):
            with np.load(key) as arrays:
                return (
                    arrays["rgb"].astype(np.float32) / 255.0,
                    arrays["depth"].astype(np.float32),
                )
    fx = width / 2.0 / np.tan(np.radians(hfov_degrees / 2.0))
    cx, cy = (width - 1.0) / 2.0, (height - 1.0) / 2.0

    @jax.jit
    def render_pose(c2w: jnp.ndarray):
        rays = create_rays(c2w[None], height, width, fx, fx, cx, cy, near, far)
        rays = rays.reshape(height * width)
        t = jnp.linspace(0.0, 1.0, n_samples, dtype=jnp.float32)
        z = rays.near * (1.0 - t) + rays.far * t
        pts = rays.origins[:, None, :] + rays.dirs[:, None, :] * z[..., None]
        raw = room_field_fn(scene, pts)
        out = composite_rays(raw, z, rays.dirs)
        return out.rgb.reshape(height, width, 3), out.depth.reshape(height, width)

    rgbs, depths = [], []
    for pose in poses:
        rgb, depth = render_pose(jnp.asarray(pose))
        rgbs.append(np.asarray(rgb))
        depths.append(np.asarray(depth))
    rgb_all, depth_all = np.stack(rgbs), np.stack(depths)
    if key is not None:
        os.makedirs(cache_dir, exist_ok=True)
        np.savez_compressed(
            key,
            rgb=np.round(np.clip(rgb_all, 0.0, 1.0) * 255.0).astype(np.uint8),
            depth=depth_all.astype(np.float16),
        )
        # Serve the quantized representation so cached and fresh callers
        # see the SAME ground truth (same rule as make_room_scene_splits).
        rgb_all = (
            np.round(np.clip(rgb_all, 0.0, 1.0) * 255.0)
            .astype(np.uint8).astype(np.float32) / 255.0
        )
        depth_all = depth_all.astype(np.float16).astype(np.float32)
    return rgb_all, depth_all


def make_room_scene_splits(
    n_frames: int = 900,
    stride: int = 5,
    height: int = 240,
    width: int = 320,
    *,
    seed: int = 7,
    near: float = 0.1,
    far: float = 8.0,
    cache_dir: Optional[str] = None,
    gt_samples: int = 320,
) -> Tuple[SceneData, SceneData, RoomScene]:
    """Reference-regime splits of the room scene: train ids = every
    `stride`th frame of the `n_frames`-step walkthrough, test ids = train
    ids + 2 (the reference's exact split rule, replica_dataset.py:42-43).
    Defaults give 180 train + 180 test views at the reference's 320x240.

    Ground-truth rendering of 360 views takes minutes; pass `cache_dir` to
    memoize the rendered splits on disk (keyed by every geometry/sampling
    parameter). The scene itself is deterministic in `seed`.
    """
    scene = room_scene(seed=seed)
    key = None
    if cache_dir is not None:
        import hashlib

        digest = hashlib.md5()
        digest.update(
            repr((n_frames, stride, height, width, seed, near, far,
                  gt_samples, _ROOM_GT_VERSION)).encode()
        )
        key = os.path.join(
            cache_dir, f"room_{digest.hexdigest()[:12]}.npz"
        )
        if os.path.exists(key):
            with np.load(key) as arrays:
                train = SceneData(
                    rgb=arrays["train_rgb"].astype(np.float32) / 255.0,
                    depth=arrays["train_depth"],
                    camera_pose=arrays["train_pose"],
                )
                test = SceneData(
                    rgb=arrays["test_rgb"].astype(np.float32) / 255.0,
                    depth=arrays["test_depth"],
                    camera_pose=arrays["test_pose"],
                )
            return train, test, scene

    all_poses = walkthrough_poses(n_frames, half=np.asarray(scene.half))
    train_ids = np.arange(0, n_frames, stride)
    test_ids = (train_ids + 2) % n_frames
    train_poses = all_poses[train_ids]
    test_poses = all_poses[test_ids]
    train_rgb, train_depth = render_room_ground_truth(
        scene, train_poses, height, width, near=near, far=far,
        n_samples=gt_samples,
    )
    test_rgb, test_depth = render_room_ground_truth(
        scene, test_poses, height, width, near=near, far=far,
        n_samples=gt_samples,
    )
    if key is not None:
        os.makedirs(cache_dir, exist_ok=True)
        np.savez_compressed(
            key,
            train_rgb=np.round(train_rgb * 255.0).astype(np.uint8),
            train_depth=train_depth.astype(np.float16),
            train_pose=train_poses,
            test_rgb=np.round(test_rgb * 255.0).astype(np.uint8),
            test_depth=test_depth.astype(np.float16),
            test_pose=test_poses,
        )
        # Reload through the cache so cached and fresh callers see the SAME
        # uint8-quantized ground truth (PSNR vs GT is measured against it).
        return make_room_scene_splits(
            n_frames, stride, height, width, seed=seed, near=near, far=far,
            cache_dir=cache_dir, gt_samples=gt_samples,
        )
    train = SceneData(rgb=train_rgb, depth=train_depth, camera_pose=train_poses)
    test = SceneData(rgb=test_rgb, depth=test_depth, camera_pose=test_poses)
    return train, test, scene


# Bump when the analytic field / trajectory definition changes so stale
# disk caches never serve old ground truth.
_ROOM_GT_VERSION = 1


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
