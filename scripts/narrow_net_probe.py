"""Work-reduction probe: narrow fine net (4x128) frame time + quality.

Round-2 VERDICT item 7: the int8 fine pass sits at ~70% of the MXU
roofline, so only *work reduction* moves the frame time; int4 is blocked
by a trace-time RecursionError in this jax version (re-probed 2026-08-17,
jax 0.9.0 — /tmp/int4_probe.log), leaving a narrower fine net as the
round-4 candidate for <100 ms single-chip. This script produces the
measured ms/PSNR datapoint that decides it:

  1. trains a proposal-mode model whose fine net is 4x128 (vs the shipped
     8x256) on the synthetic scene at the office sample config,
  2. reports test PSNR for both widths (fused kernel, int8 and bf16),
  3. times the 640x480 fast-preset serving frame for both widths.

A 4x128 trunk is ~8x fewer fine-pass MACs than 8x256; if quality holds
within ~1 dB on trained scenes, distilling the shipped checkpoints into
narrow students becomes the production path.

Run on the TPU: python scripts/narrow_net_probe.py [--steps 3000]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

WIDTH, HEIGHT = 640, 480


def train_model(name, cfg, steps, train, test):
    from nerf_workspaces_explorer_tpu.train import Trainer

    trainer = Trainer(
        f"narrow_probe_{name}", cfg, train_data=train, test_data=test,
        save_dir=f"/tmp/narrow_probe/{name}", enable_tensorboard=False,
        use_proposal=True,
    )
    trainer.setup()
    t0 = time.time()
    for i in range(steps):
        m = trainer.step(i)
        if i % 1000 == 0:
            print(f"[{name}] step {i}: loss {float(m['total_loss']):.4f} "
                  f"psnr_fine {float(m['psnr_fine']):.2f}", flush=True)
    print(f"[{name}] {steps} steps in {time.time()-t0:.0f}s", flush=True)
    return trainer


def eval_quality(name, trainer, test, h, w):
    from nerf_workspaces_explorer_tpu.ops.pallas_render import render_rays_fused
    from nerf_workspaces_explorer_tpu.ops.quantize import calibrate_model_quant
    from nerf_workspaces_explorer_tpu.rays.raygen import RayBundle
    from nerf_workspaces_explorer_tpu.utils.metrics import ssim

    eval_settings = trainer._settings.for_eval()
    quant = calibrate_model_quant(trainer.params, trainer._spec, box=6.0)
    rows = {}
    for tag, q in (("bf16", None), ("int8", quant)):
        psnrs, ssims = [], []
        for i in range(len(test)):
            rays = RayBundle(*(f[i] for f in trainer.rays_test))
            rgb = np.asarray(
                render_rays_fused(
                    trainer.params, rays, eval_settings,
                    spec=trainer._spec, quant=q,
                )
            ).reshape(h, w, 3)
            mse = float(np.mean((rgb - test.rgb[i]) ** 2))
            psnrs.append(-10 * np.log10(mse))
            ssims.append(ssim(rgb, test.rgb[i]))
        rows[tag] = (float(np.mean(psnrs)), float(np.mean(ssims)))
        print(f"[{name}] {tag}: test PSNR {rows[tag][0]:.2f} dB, "
              f"SSIM {rows[tag][1]:.4f}", flush=True)
    return rows, quant


def time_frame(name, trainer, quant, n_importance=96):
    """640x480 fast-preset serving frame (importance-only fine pass)."""
    import jax
    import jax.numpy as jnp

    from nerf_workspaces_explorer_tpu.ops.pallas_render import render_rays_fused
    from nerf_workspaces_explorer_tpu.rays import create_rays

    fx = WIDTH / 2.0
    cx, cy = (WIDTH - 1.0) / 2.0, (HEIGHT - 1.0) / 2.0
    rays = create_rays(
        jnp.eye(4)[None], HEIGHT, WIDTH, fx, fx, cx, cy, 0.1, 6.0
    ).reshape(HEIGHT * WIDTH)
    settings = trainer._settings.for_eval()._replace(
        n_importance=n_importance, merge_coarse=False
    )
    spec = trainer._spec

    @jax.jit
    def frame(params, rays):
        rgb = render_rays_fused(
            params, rays, settings, spec=spec, quant=quant,
            early_stop_eps=1e-3,
        )
        return jnp.sum(rgb)  # scalar fetch drains the queue (axon timing)

    out = frame(trainer.params, rays)
    float(out)  # compile + settle
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        out = frame(trainer.params, rays)
    float(out)
    ms = (time.perf_counter() - t0) / n * 1000.0
    print(f"[{name}] 640x480 fast-preset int8 kernel: {ms:.1f} ms/frame",
          flush=True)
    return ms


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--skip-wide", action="store_true",
                        help="only run the narrow net (reuse known wide numbers)")
    args = parser.parse_args()

    from nerf_workspaces_explorer_tpu.core.config import (
        ExperimentConfig,
        FrameworkConfig,
        LoggingConfig,
        ModelConfig,
        RenderingConfig,
    )
    from nerf_workspaces_explorer_tpu.data import make_synthetic_scene

    h, w = 96, 128
    silent = LoggingConfig(
        step_log_print=0, step_log_tensorboard=2**31 - 1, step_save_ckpt=0,
        step_render_test=0, step_render_train=0,
    )
    base = FrameworkConfig(
        experiment=ExperimentConfig(image_width=w, image_height=h),
        rendering=RenderingConfig(depth_range=(0.1, 6.0)),
        logging=silent,
    )
    narrow_model = ModelConfig(net_depth=4, net_width=128,
                               net_depth_fine=4, net_width_fine=128)
    narrow = dataclasses.replace(base, model=narrow_model)
    # num_freqs_3d=10 (the shipped config) catastrophically overfits a
    # 4x128 net: measured train 30.9 / test 15.5 dB, vs test 28.9 dB at
    # num_freqs_3d=8 — high-frequency encoding features let a small net
    # memorize train views. 8 freqs also shrink the encode 63 -> 51 dims.
    narrow_f8 = dataclasses.replace(
        base,
        model=narrow_model,
        rendering=RenderingConfig(depth_range=(0.1, 6.0), num_freqs_3d=8),
    )
    train, test, _ = make_synthetic_scene(n_train=12, n_test=3, height=h, width=w)

    # 6x192 holds the shipped 10-freq encoding without the 4x128 overfit
    # cliff (measured test 29.4 dB vs wide 30.2 at 3k steps).
    mid = dataclasses.replace(
        base, model=ModelConfig(net_depth=6, net_width=192,
                                net_depth_fine=6, net_width_fine=192),
    )
    results = {}
    configs = [
        ("narrow-4x128-f8", narrow_f8),
        ("narrow-4x128", narrow),
        ("mid-6x192", mid),
    ]
    if not args.skip_wide:
        configs.append(("wide-8x256", base))
    for name, cfg in configs:
        trainer = train_model(name, cfg, args.steps, train, test)
        quality, quant = eval_quality(name, trainer, test, h, w)
        ms = time_frame(name, trainer, quant)
        results[name] = {"quality": quality, "ms_frame": ms}

    print("\n=== narrow-net probe summary ===")
    for name, r in results.items():
        psnr8 = r["quality"]["int8"][0]
        print(f"{name}: {r['ms_frame']:.1f} ms/frame (fast-preset int8 "
              f"kernel), int8 test PSNR {psnr8:.2f} dB")
    if "wide-8x256" in results:
        ww = results["wide-8x256"]
        for name, nn in results.items():
            if name == "wide-8x256":
                continue
            print(f"{name} vs wide: speedup {ww['ms_frame']/nn['ms_frame']:.2f}x, "
                  f"PSNR delta "
                  f"{nn['quality']['int8'][0]-ww['quality']['int8'][0]:+.2f} dB")


if __name__ == "__main__":
    main()
