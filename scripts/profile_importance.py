"""Split the importance-sampling stage cost: inverse-CDF (sample_pdf) vs
the merge sort, on the real TPU at frame scale (pure XLA, no Pallas
compiles — runs in seconds)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from nerf_workspaces_explorer_tpu.rays.sampling import (
    coarse_z_vals,
    merge_sorted_z,
    sample_pdf,
)

R, S, I = 640 * 480, 64, 128


def timed(name, fn, *args, n=10):
    out = jax.block_until_ready(fn(*args))
    start = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    print(f"{name:38s} {(time.perf_counter() - start) / n * 1000.0:8.2f} ms")
    return out


def main() -> None:
    key = jax.random.PRNGKey(0)
    near = jnp.full((R, 1), 0.1)
    far = jnp.full((R, 1), 10.0)
    z = coarse_z_vals(near, far, S)  # [R, S]
    weights = jax.random.uniform(key, (R, S))
    z_mid = 0.5 * (z[..., 1:] + z[..., :-1])

    pdf_fn = jax.jit(
        lambda w: sample_pdf(z_mid, w[..., 1:-1], I, deterministic=True)
    )
    merge_fn = jax.jit(lambda zs: merge_sorted_z(z, zs).T)
    both = jax.jit(lambda w: merge_sorted_z(z, pdf_fn(w)).T)

    zs = timed("sample_pdf [307k, 62] -> 128", pdf_fn, weights)
    timed("merge_sorted_z (sort concat 192)", merge_fn, zs)
    timed("combined", both, weights)

    # Variant: sorted-input merge via concatenate+sort is what the XLA path
    # does; compare a pure sort of presorted data as the lower bound.
    cat = jnp.concatenate([z, jnp.sort(zs, axis=-1)], axis=-1)
    timed("jnp.sort [307k, 192] alone", jax.jit(lambda c: jnp.sort(c, axis=-1).T), cat)


if __name__ == "__main__":
    main()
