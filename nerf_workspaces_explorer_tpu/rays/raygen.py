"""Pinhole ray generation in world coordinates.

Parity target: reference nerf/rays/rays.py:6-71. The reference builds camera
-frame directions on a meshgrid in the OpenCV convention (x right, y down,
z forward; rays.py:35-58), rotates them into world space with the pose's
rotation block and broadcasts the origin (rays.py:61-71), then packs a flat
per-ray record ``[o(3), d(3), near, far, viewdir(3)]`` of 11 floats
(rays.py:26-31).

TPU-native differences: rays live in a structure-of-arrays `RayBundle`
(origins / dirs / near / far / viewdirs as separate arrays) instead of an
11-float packed record — XLA keeps each field in a layout it can tile, and
the Pallas kernel consumes fields directly. `pack_rays`/`unpack_rays` provide
the reference's flat layout for checkpoints-of-rays parity and tests.
Everything here is jit-traceable with static shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class RayBundle(NamedTuple):
    """Structure-of-arrays ray batch. Leading dims are arbitrary batch dims."""

    origins: jnp.ndarray  # [..., 3]
    dirs: jnp.ndarray  # [..., 3] (unnormalized; z=1 in camera frame)
    near: jnp.ndarray  # [..., 1]
    far: jnp.ndarray  # [..., 1]
    viewdirs: jnp.ndarray  # [..., 3] (unit-norm dirs)

    @property
    def batch_shape(self):
        return self.origins.shape[:-1]

    def reshape(self, *shape) -> "RayBundle":
        return RayBundle(
            origins=self.origins.reshape(*shape, 3),
            dirs=self.dirs.reshape(*shape, 3),
            near=self.near.reshape(*shape, 1),
            far=self.far.reshape(*shape, 1),
            viewdirs=self.viewdirs.reshape(*shape, 3),
        )

    def __getitem__(self, idx) -> "RayBundle":  # type: ignore[override]
        return RayBundle(*(field[idx] for field in self))


def camera_ray_dirs(
    height: int, width: int, fx: float, fy: float, cx: float, cy: float
) -> jnp.ndarray:
    """Camera-frame ray directions [H, W, 3], OpenCV convention.

    Matches reference nerf/rays/rays.py:35-58: x = (i - cx)/fx over the width
    axis, y = (j - cy)/fy over the height axis, z = 1.
    """
    i = jnp.arange(width, dtype=jnp.float32)[None, :]  # [1, W]
    j = jnp.arange(height, dtype=jnp.float32)[:, None]  # [H, 1]
    x = jnp.broadcast_to((i - cx) / fx, (height, width))
    y = jnp.broadcast_to((j - cy) / fy, (height, width))
    z = jnp.ones((height, width), dtype=jnp.float32)
    return jnp.stack([x, y, z], axis=-1)


def create_rays(
    c2w: jnp.ndarray,
    height: int,
    width: int,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    near: float,
    far: float,
) -> RayBundle:
    """World-space rays for a batch of poses.

    Matches reference nerf/rays/rays.py:6-32 semantics: dirs_world =
    R_wc @ dir_cam, origins broadcast from the pose translation, viewdirs =
    normalized dirs, constant near/far planes.

    Args:
      c2w: [N, 4, 4] camera-to-world matrices.
    Returns:
      RayBundle with batch shape [N, H*W].
    """
    c2w = jnp.asarray(c2w, dtype=jnp.float32)
    if c2w.ndim == 2:
        c2w = c2w[None]
    n = c2w.shape[0]

    dirs_cam = camera_ray_dirs(height, width, fx, fy, cx, cy).reshape(-1, 3)  # [HW, 3]
    rot = c2w[:, :3, :3]  # [N, 3, 3]
    # dirs_world[n, p, :] = rot[n] @ dirs_cam[p]
    dirs_world = jnp.einsum("nij,pj->npi", rot, dirs_cam)  # [N, HW, 3]
    origins = jnp.broadcast_to(c2w[:, None, :3, 3], dirs_world.shape)

    viewdirs = dirs_world / jnp.linalg.norm(dirs_world, axis=-1, keepdims=True)

    shape = (n, height * width, 1)
    near_arr = jnp.full(shape, near, dtype=jnp.float32)
    far_arr = jnp.full(shape, far, dtype=jnp.float32)

    return RayBundle(
        origins=origins,
        dirs=dirs_world,
        near=near_arr,
        far=far_arr,
        viewdirs=viewdirs,
    )


def pack_rays(rays: RayBundle) -> jnp.ndarray:
    """Flatten to the reference's 11-float record layout
    (reference nerf/rays/rays.py:26-31)."""
    return jnp.concatenate(
        [rays.origins, rays.dirs, rays.near, rays.far, rays.viewdirs], axis=-1
    )


def unpack_rays(flat: jnp.ndarray) -> RayBundle:
    """Inverse of `pack_rays` for reference-layout [..., 11] records."""
    return RayBundle(
        origins=flat[..., 0:3],
        dirs=flat[..., 3:6],
        near=flat[..., 6:7],
        far=flat[..., 7:8],
        viewdirs=flat[..., 8:11],
    )
