"""Time the fused Pallas importance+merge kernel at frame scale on the real
TPU, across ray tiles. Companion to profile_importance.py (the XLA stage).

Usage: python scripts/profile_imp_kernel.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from nerf_workspaces_explorer_tpu.ops.pallas_sampling import importance_merge_pallas

R, S, I = 640 * 480, 64, 128


def timed(name, fn, *args, n=10):
    out = jax.block_until_ready(fn(*args))  # compile
    start = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(out)  # drain the in-order queue (CLAUDE.md timing note)
    print(f"{name:38s} {(time.perf_counter() - start) / n * 1000.0:8.2f} ms",
          flush=True)
    return out


def main() -> None:
    key = jax.random.PRNGKey(0)
    z = jnp.sort(jax.random.uniform(key, (S, R), minval=0.1, maxval=10.0), axis=0)
    centre = jax.random.uniform(jax.random.PRNGKey(1), (1, R), minval=1.0, maxval=9.0)
    w = jnp.exp(-0.5 * ((z - centre) / 0.5) ** 2) + 1e-4

    for tile in (256, 512, 1024, 2048):
        fn = jax.jit(
            lambda wt, zt, t=tile: importance_merge_pallas(
                wt, zt, I, ray_tile=t
            ).sum()
        )
        timed(f"importance+merge fused tile={tile}", fn, w, z)


if __name__ == "__main__":
    main()
