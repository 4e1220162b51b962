"""Attribute the fine-pass kernel's per-sample fixed cost by ablation.

Motivation (round 3): the 4x128@8f int8 fine pass times ~44 ms at
640x480x48s while its trunk matmul stages account for only ~10 ms
(removing a whole layer saves 2.6 ms) — and the tiny 2x64 proposal
DENSITY pass costs 29 ms for 64 samples. Most of the time is per-sample
work that does not scale with the net: encoding, heads, the compositing
epilogue, or Mosaic per-op issue overhead. This script times variant
kernels that surgically remove one stage at a time (timing-only — the
ablated numerics are wrong on purpose) on the SAME grid/tile structure:

  full        the real nerf_render_pallas (reference number)
  no-enc      feat = cached int8 features from sample 0 (no per-sample
              FMA/sin/quantize chain; trunk/heads/epilogue intact)
  no-heads    trunk only; sigma := row 0 of h (skips fa/view/rgb dots
              and their requants; epilogue intact)
  no-epilogue rgb/sigma computed but folded with plain adds (no
              exp/sigmoid/alpha/trans chain, no per-sample weight math)
  trunk-only  no-enc + no-heads + no-epilogue

Run on the TPU, serialized with nothing else:
    python scripts/profile_fine_ablation.py [--sidecar PATH] [--samples 48]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_workspaces_explorer_tpu.ops.pallas_render import (
    DEFAULT_RAY_TILE,
    _dists_from_z,
    _encode_step,
    _pad_rays_axis,
    _trunk,
    encode_viewdirs_kernel_order,
    nerf_render_pallas,
    prepare_kernel_params,
    ray_phase_vectors,
)


def _ablation_kernel(
    o_ph_ref, d_ph_ref, zd_ref, venc_ref, *refs,
    kp, n_samples, samples_per_step, ablate,
):
    """Timing-only variant of ops/pallas_render._render_kernel (full pass,
    int8 heads) with one stage removed per `ablate` flag set."""
    n_layers = len(kp.w_layers)
    n_skips = len(kp.w_skip_enc)
    idx = 0
    w_layers = [refs[idx + i][:] for i in range(n_layers)]
    idx += n_layers
    w_skip_enc = [refs[idx + i][:] for i in range(n_skips)]
    idx += n_skips
    b_layers = [refs[idx + i][:] for i in range(n_layers)]
    idx += n_layers
    w_fa, b_fa = refs[idx][:], refs[idx + 1][:]
    w_view_h, w_view_enc, b_view = refs[idx + 2][:], refs[idx + 3][:], refs[idx + 4][:]
    w_rgb, b_rgb = refs[idx + 5][:], refs[idx + 6][:]
    idx += 7
    out_ref = refs[idx]
    acc_ref = refs[idx + 1]
    hv_enc_ref = refs[idx + 2]

    g = pl.program_id(1)
    n_groups = n_samples // samples_per_step
    width = kp.width

    @pl.when(g == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        acc_ref[5:6, :] = jnp.ones_like(acc_ref[5:6, :])
        venc = venc_ref[:].astype(jnp.bfloat16)
        enc = jnp.dot(w_view_enc, venc, preferred_element_type=jnp.float32)
        q = jnp.round((enc + b_view) * kp.inv_s_view).astype(jnp.int32)
        if kp.k_hv > 0:
            q = q + (1 << (kp.k_hv - 1))
        hv_enc_ref[:] = q

    zd = zd_ref[0]
    o_ph = o_ph_ref[:]
    d_ph = d_ph_ref[:]
    hv_enc = hv_enc_ref[:]
    trans = acc_ref[5:6, :]
    rgb_acc = acc_ref[0:3, :]
    feat0 = None
    duo_cache = None
    if "enc-duo" in ablate:
        # Hoisted pair operands: both samples' base rows share one
        # 8-sublane block (rows 0-2 = even sample, 3-5 = odd).
        o_pair = jnp.concatenate([o_ph[0:3], o_ph[0:3]], axis=0)
        d_pair = jnp.concatenate([d_ph[0:3], d_ph[0:3]], axis=0)
    for k in range(samples_per_step):
        z_row = zd[2 * k : 2 * k + 1, :]
        dist_row = zd[2 * k + 1 : 2 * k + 2, :]
        if "enc" in ablate:
            # One real encode (sample 0), reused: removes the per-sample
            # FMA/sin/round chain but keeps operand shapes identical.
            if feat0 is None:
                feat0 = _encode_step(
                    o_ph, d_ph, z_row, kp.pts_freqs, jnp.bfloat16,
                    kp.feat_qscale,
                )
            feat = feat0
        elif "enc-direct" in ablate:
            # The pre-recurrence full-block transcendental (numerics match;
            # timing comparison point for the octave-doubling encode).
            phases = o_ph[:] + z_row * d_ph[:]
            row = jax.lax.broadcasted_iota(jnp.int32, phases.shape, 0)
            live = 3 + 6 * kp.pts_freqs
            ft = jnp.where(
                row < 3, phases, jnp.where(row < live, jnp.sin(phases), 0.0)
            )
            feat = jnp.clip(
                jnp.round(ft * kp.feat_qscale), -127, 127
            ).astype(jnp.int8)
        elif "enc-nobase" in ablate:
            # Recurrence encode with the two [3, R] transcendentals replaced
            # by cheap muls (timing-only): isolates the base sin/cos cost.
            p = o_ph[0:3] + z_row * d_ph[0:3]
            s, c = p * 0.11, p * 0.12
            rows = [p]
            sin_rows, cos_rows = [s], [c]
            for _ in range(kp.pts_freqs - 1):
                s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
                sin_rows.append(s)
                cos_rows.append(c)
            rows += sin_rows + cos_rows
            live = 3 + 6 * kp.pts_freqs
            enc_dim = o_ph.shape[0]
            if enc_dim > live:
                rows.append(jnp.zeros((enc_dim - live,) + p.shape[1:], p.dtype))
            ft = jnp.concatenate(rows, axis=0)
            feat = jnp.clip(
                jnp.round(ft * kp.feat_qscale), -127, 127
            ).astype(jnp.int8)
        elif "enc-postq" in ablate:
            # The pre-2026-08-19 ordering: concat the 17 f32 pieces first,
            # quantize the [enc, R] block after (numerics identical to the
            # shipped piecewise-quantize form; timing comparison point).
            from nerf_workspaces_explorer_tpu.ops.pallas_render import (
                _enc_dim, _sincos_poly,
            )

            p = o_ph[0:3] + z_row * d_ph[0:3]
            s, c = _sincos_poly(p)
            sin_rows, cos_rows = [s], [c]
            for _ in range(kp.pts_freqs - 1):
                s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
                sin_rows.append(s)
                cos_rows.append(c)
            rows = [p] + sin_rows + cos_rows
            live = 3 + 6 * kp.pts_freqs
            enc_dim = _enc_dim(kp.pts_freqs)
            if enc_dim > live:
                rows.append(jnp.zeros((enc_dim - live,) + p.shape[1:], p.dtype))
            ft = jnp.concatenate(rows, axis=0)
            feat = jnp.clip(
                jnp.round(ft * kp.feat_qscale), -127, 127
            ).astype(jnp.int8)
        elif "enc-duo" in ablate:
            # Pack TWO samples' 3 base rows into one 8-sublane block so the
            # poly base + octave recurrence run at 6/8 vreg utilization
            # (half the vector ops per sample); each sample's features are
            # then sliced back out piecewise for its own trunk pass.
            from nerf_workspaces_explorer_tpu.ops.pallas_render import (
                _enc_dim, _sincos_poly,
            )

            if k % 2 == 0:
                z0 = zd[2 * k : 2 * k + 1, :]
                z1 = zd[2 * k + 2 : 2 * k + 3, :]
                z_pair = jnp.concatenate(
                    [
                        jnp.broadcast_to(z0, (3,) + z0.shape[1:]),
                        jnp.broadcast_to(z1, (3,) + z1.shape[1:]),
                    ],
                    axis=0,
                )
                p2 = o_pair + z_pair * d_pair  # [6, R]
                s, c = _sincos_poly(p2)
                pieces = [p2]
                sin_rows, cos_rows = [s], [c]
                for _ in range(kp.pts_freqs - 1):
                    s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
                    sin_rows.append(s)
                    cos_rows.append(c)
                pieces += sin_rows + cos_rows
                enc_dim = _enc_dim(kp.pts_freqs)
                pad = [
                    jnp.zeros(
                        (enc_dim - 3 * len(pieces),) + p2.shape[1:], jnp.int8
                    )
                ]

                def q3(r):
                    return jnp.clip(
                        jnp.round(r * kp.feat_qscale), -127, 127
                    ).astype(jnp.int8)

                feat = jnp.concatenate([q3(r[0:3]) for r in pieces] + pad, 0)
                duo_cache = jnp.concatenate(
                    [q3(r[3:6]) for r in pieces] + pad, 0
                )
            else:
                feat = duo_cache
        elif "enc-stack" in ablate:
            # Assemble the 17 pieces with stack+reshape instead of concat
            # (Mosaic may lower the [17, 3, R] -> [51, R] merge as one
            # relayout; numerics identical to the shipped form).
            from nerf_workspaces_explorer_tpu.ops.pallas_render import (
                _enc_dim, _sincos_poly,
            )

            p = o_ph[0:3] + z_row * d_ph[0:3]
            s, c = _sincos_poly(p)
            sin_rows, cos_rows = [s], [c]
            for _ in range(kp.pts_freqs - 1):
                s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
                sin_rows.append(s)
                cos_rows.append(c)
            rows = [p] + sin_rows + cos_rows
            q = [
                jnp.clip(jnp.round(r * kp.feat_qscale), -127, 127).astype(
                    jnp.int8
                )
                for r in rows
            ]
            live = jnp.stack(q, axis=0).reshape(len(q) * 3, p.shape[-1])
            enc_dim = _enc_dim(kp.pts_freqs)
            feat = jnp.concatenate(
                [live, jnp.zeros((enc_dim - live.shape[0], p.shape[-1]), jnp.int8)],
                axis=0,
            )
        elif "enc-noconcat" in ablate:
            # Recurrence chain kept live via a cheap piece-sum, but the trunk
            # consumes a cached feat: isolates the 3-row concat/relayout cost
            # (timing-only).
            p = o_ph[0:3] + z_row * d_ph[0:3]
            s, c = jnp.sin(p), jnp.cos(p)
            acc = p + s + c
            for _ in range(kp.pts_freqs - 1):
                s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
                acc = acc + s + c
            accq = jnp.clip(jnp.round(acc * kp.feat_qscale), -127, 127)
            if feat0 is None:
                feat0 = _encode_step(
                    o_ph, d_ph, z_row, kp.pts_freqs, jnp.bfloat16,
                    kp.feat_qscale,
                )
            # Mosaic has no i8 vector add; fold the live piece-sum in i32
            # (timing-only: one extra widen/narrow pair per sample).
            feat = (
                feat0.astype(jnp.int32) + accq.astype(jnp.int32)[0:1]
            ).astype(jnp.int8)
        else:
            feat = _encode_step(
                o_ph, d_ph, z_row, kp.pts_freqs, jnp.bfloat16, kp.feat_qscale
            )
        h = _trunk(
            feat, w_layers, w_skip_enc, b_layers, kp.skips, jnp.bfloat16,
            kp.shift_layers, kp.skip_shift, True,
        )
        if "heads" in ablate:
            sigma = h[:1].astype(jnp.float32)
            rgb = h[1:4].astype(jnp.float32)
        else:
            fa = jnp.dot(w_fa, h, preferred_element_type=jnp.int32) + b_fa
            feature = jnp.clip(fa[:width] >> kp.k_feat, -127, 127).astype(
                jnp.int8
            )
            sigma = fa[width : width + 1].astype(jnp.float32) * kp.s_alpha
            acc_v = jnp.dot(w_view_h, feature, preferred_element_type=jnp.int32)
            hv = jnp.clip((acc_v + hv_enc) >> kp.k_hv, 0, 127).astype(jnp.int8)
            rgb_i = jnp.dot(w_rgb, hv, preferred_element_type=jnp.int32)
            if "epilogue" in ablate:
                rgb = rgb_i[:3].astype(jnp.float32)
            else:
                rgb = jax.nn.sigmoid(
                    rgb_i[:3].astype(jnp.float32) * kp.s_rgb + b_rgb[:3]
                )
        if "epilogue" in ablate:
            # Plain adds keep every operand live without the per-sample
            # exp/alpha/transmittance chain.
            rgb_acc = rgb_acc + rgb + sigma
        else:
            alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dist_row)
            weight = alpha * trans
            rgb_acc = rgb_acc + weight * rgb
            trans = trans * (1.0 - alpha + 1e-10)
    acc_ref[0:3, :] = rgb_acc
    acc_ref[5:6, :] = trans

    @pl.when(g == n_groups - 1)
    def _finish():
        out_ref[:] = acc_ref[:]


def run_ablation(kp, o_ph, d_ph, z_vals, dists, venc, ablate,
                 samples_per_step=32, ray_tile=DEFAULT_RAY_TILE):
    n_rays = o_ph.shape[-1]
    n_samples = z_vals.shape[0]
    n_tiles = -(-n_rays // ray_tile)
    padded = n_tiles * ray_tile
    while n_samples % samples_per_step:
        samples_per_step //= 2
    n_groups = n_samples // samples_per_step
    zd_rows = max(8, 2 * samples_per_step)
    o_ph = _pad_rays_axis(o_ph, padded)
    d_ph = _pad_rays_axis(d_ph, padded)
    z_g = _pad_rays_axis(z_vals, padded).reshape(n_groups, samples_per_step, padded)
    d_g = _pad_rays_axis(dists, padded).reshape(n_groups, samples_per_step, padded)
    zd = jnp.stack([z_g, d_g], axis=2).reshape(n_groups, 2 * samples_per_step, padded)
    if 2 * samples_per_step < zd_rows:
        zd = jnp.pad(zd, ((0, 0), (0, zd_rows - 2 * samples_per_step), (0, 0)))
    venc = _pad_rays_axis(venc, padded)

    def wide(b):
        return jnp.broadcast_to(b, (b.shape[0], ray_tile))

    weights = (
        list(kp.w_layers) + list(kp.w_skip_enc)
        + [wide(b) for b in kp.b_layers]
        + [kp.w_fa, wide(kp.b_fa), kp.w_view_h, kp.w_view_enc,
           wide(kp.b_view), kp.w_rgb, wide(kp.b_rgb)]
    )
    scratch = [
        pltpu.VMEM((8, ray_tile), jnp.float32),
        pltpu.VMEM((kp.width // 2, ray_tile), jnp.int32),
    ]

    def per_ray_spec(rows):
        return pl.BlockSpec((rows, ray_tile), lambda i, s: (0, i),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _ablation_kernel, kp=kp, n_samples=n_samples,
        samples_per_step=samples_per_step, ablate=ablate,
    )
    return pl.pallas_call(
        lambda *a: kernel(*a),
        grid=(n_tiles, n_groups),
        in_specs=[
            per_ray_spec(o_ph.shape[0]),
            per_ray_spec(d_ph.shape[0]),
            pl.BlockSpec((1, zd_rows, ray_tile), lambda i, s: (s, 0, i),
                         memory_space=pltpu.VMEM),
            per_ray_spec(venc.shape[0]),
        ] + [
            pl.BlockSpec(w.shape, lambda i, s: (0, 0), memory_space=pltpu.VMEM)
            for w in weights
        ],
        out_specs=pl.BlockSpec((8, ray_tile), lambda i, s: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, padded), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(o_ph, d_ph, zd, venc, *weights)


def timed(name, fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))
    start = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(out)  # drain the in-order queue (axon acks enqueue only)
    ms = (time.perf_counter() - start) / n * 1000.0
    print(f"{name:44s} {ms:8.1f} ms", flush=True)
    return ms


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sidecar", type=str,
        default=os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", "assets",
            "bench", "synth_proposal.turbo.npz",
        ),
    )
    ap.add_argument("--samples", type=int, default=48)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--sps", type=int, default=32)
    args = ap.parse_args()
    while args.samples % args.sps:
        args.sps //= 2

    from nerf_workspaces_explorer_tpu.ops.quantize import calibrate_model_quant
    from nerf_workspaces_explorer_tpu.rays import create_rays
    from nerf_workspaces_explorer_tpu.rays.sampling import coarse_z_vals
    from nerf_workspaces_explorer_tpu.train.distill import (
        load_turbo_checkpoint,
        read_turbo_metadata,
        student_spec_from_meta,
    )

    print(f"backend: {jax.devices()[0].platform}", flush=True)
    params, _ = load_turbo_checkpoint(args.sidecar)
    spec, _ = student_spec_from_meta(read_turbo_metadata(args.sidecar))
    quant = calibrate_model_quant(params, spec)
    kp = prepare_kernel_params(params["fine"], spec, quant=quant["fine"])

    h, w = args.height, args.width
    rays = create_rays(
        jnp.eye(4)[None], h, w, 320.0, 320.0, w / 2 - 0.5, h / 2 - 0.5,
        0.1, 6.0,
    ).reshape(h * w)
    origins = rays.origins.astype(jnp.float32)
    dirs = rays.dirs.astype(jnp.float32)
    dir_norm = jnp.linalg.norm(dirs, axis=-1)[None, :]
    venc = encode_viewdirs_kernel_order(
        rays.viewdirs.astype(jnp.float32), num_freqs=kp.view_freqs
    )
    o_ph, d_ph = ray_phase_vectors(origins, dirs, kp.pts_freqs)
    z = coarse_z_vals(rays.near.astype(jnp.float32),
                      rays.far.astype(jnp.float32), args.samples).T
    dists = _dists_from_z(z, dir_norm)

    def full(z_):
        return nerf_render_pallas(
            kp, o_ph, d_ph, z_, _dists_from_z(z_, dir_norm), venc,
            early_stop_eps=0.0, samples_per_step=args.sps,
        ).sum()

    timed(f"full {args.samples}s sps={args.sps}", jax.jit(full), z)
    for ablate in (
        ("enc",), ("enc-direct",), ("enc-nobase",), ("enc-noconcat",),
        ("enc-postq",), ("enc-stack",), ("enc-duo",),
    ):
        tag = "+".join(ablate)

        def run(z_, d_, ablate=ablate):
            return run_ablation(
                kp, o_ph, d_ph, z_, d_, venc, frozenset(ablate),
                samples_per_step=args.sps,
            ).sum()

        timed(f"ablate {tag}", jax.jit(run), z, dists)


if __name__ == "__main__":
    main()
