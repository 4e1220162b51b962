"""Product-resolution (320x240) render parity vs the reference's own code.

Round-2 VERDICT item 4: the BASELINE.md fidelity north star is >= 99% SSIM
vs the reference render at the PRODUCT config (320x240,
/root/reference/nerf/configs/office_tokyo_config.yaml:2-3), but the
per-commit parity tests run at 24x32 for CPU tractability
(tests/test_parity_fullframe.py). This script produces the product-scale
evidence: it runs the reference's actual `NeRFReplicaInferenceHandler`
(torch, CPU-monkeypatched — /root/reference/nerf/inference/
nerf_replica_inference_handler.py:166-277) at the full 320x240 config on
exported weights, renders the same pose through our parity, fused-kernel
(interpret on CPU / compiled on TPU) and int8 paths, and writes SSIM +
per-pixel stats to reports/reference_parity_320x240.md.

Weights: the trained synthetic hier fixture (assets/bench/synth_hier.npz)
when present — realistic free space for early termination — else the
boosted-random weights the 24x32 tests use. Either way both systems render
from the SAME exported checkpoint through the reference's own loader.

Run: `python scripts/reference_parity_320x240.py` — the reference leg is
always torch-CPU (~30 min, cached in /tmp across runs); our legs run on
the default backend (TPU when available: compiled kernels, minutes).
`--platform cpu` forces everything onto CPU (fused legs drop to interpret
mode — slow). NOTE: the axon sitecustomize overrides JAX_PLATFORMS at
interpreter start via jax.config, so the env var alone does NOT work —
use the flag (it re-applies jax.config.update like tests/conftest.py).
"""

import math
import os
import sys
import time
import types

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

REFERENCE_ROOT = "/root/reference"

import numpy as np


def patch_torch_cpu():
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.cuda.empty_cache = lambda: None
    _orig_load = torch.load
    torch.load = lambda f, *a, **k: _orig_load(f, map_location="cpu")
    return torch


def load_params():
    """Trained hier fixture if present, else boosted-random (24x32-test
    weights). Returns (spec, params, depth_range, kind)."""
    import jax

    from nerf_workspaces_explorer_tpu.infer.checkpoint import load_checkpoint
    from nerf_workspaces_explorer_tpu.models import NerfMLPSpec, init_nerf_params

    spec = NerfMLPSpec()
    fixture = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "assets", "bench",
        "synth_hier.npz",
    )
    if os.path.exists(fixture):
        params, _, _, meta = load_checkpoint(fixture)
        if "coarse" in params and "fine" in params:
            rng = tuple(meta.get("depth_range", (0.1, 6.0)))
            return spec, params, rng, "trained-synthetic"
    k1, k2 = jax.random.split(jax.random.PRNGKey(42))
    params = {
        "coarse": init_nerf_params(k1, spec),
        "fine": init_nerf_params(k2, spec),
    }
    for p in params.values():
        p["alpha"]["b"] = p["alpha"]["b"] + 2.0
        p["rgb"]["w"] = p["rgb"]["w"] * 8.0
    return spec, params, None, "boosted-random"


def save_reference_ckpt(torch, params, path):
    from nerf_workspaces_explorer_tpu.infer.checkpoint import (
        params_to_torch_state_dict,
    )

    to_torch = lambda p: {
        k: torch.tensor(np.asarray(v))
        for k, v in params_to_torch_state_dict(p, underscore=False).items()
    }
    torch.save(
        {
            "global_step": 0,
            "network_coarse_state_dict": to_torch(params["coarse"]),
            "network_fine_state_dict": to_torch(params["fine"]),
            "optimizer_state_dict": {},
        },
        path,
    )


def main():
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--office", default="office_tokyo")
    parser.add_argument(
        "--out", default=os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", "reports",
            "reference_parity_320x240.md",
        )
    )
    parser.add_argument(
        "--platform", default="auto", choices=("auto", "cpu"),
        help="force our render legs onto CPU (see module docstring)",
    )
    parser.add_argument(
        "--ref-only", action="store_true",
        help="render + cache the torch-CPU reference leg, then exit "
        "(pre-warm the /tmp cache while the TPU is busy elsewhere)",
    )
    args = parser.parse_args()

    if args.platform == "cpu":
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, REFERENCE_ROOT)
    sys.modules.setdefault(
        "imgviz", types.SimpleNamespace(depth2rgb=lambda *a, **k: None)
    )
    torch = patch_torch_cpu()
    torch.set_num_threads(os.cpu_count() or 4)

    import dataclasses

    import jax
    import jax.numpy as jnp

    from nerf_workspaces_explorer_tpu.camera import poses_from_coordinates
    from nerf_workspaces_explorer_tpu.core import COORD
    from nerf_workspaces_explorer_tpu.core.config import load_config
    from nerf_workspaces_explorer_tpu.infer import NeRFRenderer
    from nerf_workspaces_explorer_tpu.ops.quantize import calibrate_model_quant
    from nerf_workspaces_explorer_tpu.rays import create_rays
    from nerf_workspaces_explorer_tpu.ops.pallas_render import render_rays_fused
    from nerf_workspaces_explorer_tpu.render import RenderSettings
    from nerf_workspaces_explorer_tpu.utils.metrics import ssim

    spec, params, depth_override, weights_kind = load_params()

    from nerf.inference.nerf_replica_inference_handler import (
        NeRFReplicaInferenceHandler,
    )

    ckpt = "/tmp/parity320_model.ckpt"
    save_reference_ckpt(torch, params, ckpt)

    office_short = args.office.replace("office_", "")
    handler = NeRFReplicaInferenceHandler(args.office, ckpt)
    if depth_override is not None:
        handler._depth_close_bound, handler._depth_far_bound = depth_override
    handler.initialize_models()
    H, W = handler._img_h, handler._img_w
    assert (H, W) == (240, 320), f"product config is 320x240, got {W}x{H}"

    INIT = COORD(x=1.0, y=-0.5, z=0.5, pitch=-90.0)
    VIEW = COORD(yaw=-30.0)

    # The torch-CPU reference render takes ~30 min; it depends only on the
    # weights + pose, so cache it across iterations on our own paths.
    # (hashlib, NOT hash(): str hashing is salted per process, which would
    # silently miss the cache on every new run.)
    import hashlib

    digest = hashlib.md5()
    digest.update(args.office.encode())
    digest.update(weights_kind.encode())
    digest.update(np.asarray(params["fine"]["alpha"]["b"]).tobytes())
    digest.update(np.asarray(params["fine"]["pts"][0]["w"]).tobytes())
    digest.update(repr((INIT, VIEW)).encode())
    cache = f"/tmp/parity320_ref_{digest.hexdigest()[:12]}.npy"
    if os.path.exists(cache):
        ref_img = np.load(cache)
        t_ref = 0.0
        print(f"[reference] using cached render {cache}", flush=True)
    else:
        print(f"[reference] rendering {W}x{H} on torch-CPU ({weights_kind})...",
              flush=True)
        t0 = time.time()
        ref_img = handler.render_coordinates(INIT, VIEW)
        t_ref = time.time() - t0
        print(f"[reference] {t_ref:.1f} s", flush=True)
        np.save(cache, ref_img)
    assert ref_img.std() > 0, "reference frame is blank"
    if args.ref_only:
        print(f"reference leg cached -> {cache}")
        return

    cfg = load_config(office_name=office_short)
    if depth_override is not None:
        cfg = dataclasses.replace(
            cfg,
            rendering=dataclasses.replace(
                cfg.rendering, depth_range=depth_override
            ),
        )

    rows = []

    def compare(name, img, secs):
        diff = np.abs(ref_img.astype(int) - img.astype(int))
        s = ssim(
            ref_img.astype(np.float32) / 255.0, img.astype(np.float32) / 255.0
        )
        rows.append(
            (name, s, float(diff.mean()), float(np.percentile(diff, 99)),
             int(diff.max()), secs)
        )
        print(
            f"[{name}] SSIM {s:.5f}  mean|d| {diff.mean():.4f}  "
            f"p99 {np.percentile(diff, 99):.1f}  max {diff.max()}  "
            f"({secs:.1f} s)",
            flush=True,
        )
        return s

    # 1) parity mode (fp32 jnp pipeline — the strict reference twin).
    r = NeRFRenderer(
        office_short, config=cfg, precision="parity", use_pallas=False
    )
    r.set_params(params)
    t0 = time.time()
    img_parity = r.render_coordinates(INIT, VIEW)
    compare("parity-fp32", img_parity, time.time() - t0)

    # 2) fused Pallas kernel (production TPU path; interpret-mode on CPU).
    on_cpu = jax.devices()[0].platform == "cpu"
    pose = poses_from_coordinates(INIT, [VIEW])
    near, far = cfg.rendering.depth_range
    rays = create_rays(
        jnp.asarray(pose), H, W, cfg.fx, cfg.fy, cfg.cx, cfg.cy, near, far
    ).reshape(H * W)
    t0 = time.time()
    rgb = render_rays_fused(
        params, rays, RenderSettings(), spec=spec, ray_tile=256,
        interpret=on_cpu,
    )
    img_fused = (
        (255.0 * np.clip(np.asarray(rgb), 0, 1)).astype(np.uint8)
        .reshape(H, W, 3)
    )
    compare("fused-bf16" if not on_cpu else "fused-interpret", img_fused,
            time.time() - t0)

    # 3) int8 fused (the benchmarked serving precision). Compiled kernels
    # need the TPU; in interpret mode the int8 emulation is exact enough
    # for fidelity measurement but ~100x slower, so only run when cheap.
    quant = calibrate_model_quant(params, spec=spec, box=6.0)
    t0 = time.time()
    rgb8 = render_rays_fused(
        params, rays, RenderSettings(), spec=spec, ray_tile=256,
        interpret=on_cpu, quant=quant,
    )
    img_int8 = (
        (255.0 * np.clip(np.asarray(rgb8), 0, 1)).astype(np.uint8)
        .reshape(H, W, 3)
    )
    compare("int8-fused" + ("-interpret" if on_cpu else ""), img_int8,
            time.time() - t0)

    # 4) trunk-only int8 (heads stay bf16): the heads carry only ~20% of the
    # fine-pass MACs, so this recovers most of the int8 speedup while the
    # rgb-producing epilogue keeps full precision — the candidate serving
    # tier when full int8 misses the 0.99 gate (round-3 VERDICT item 1).
    quant_trunk = calibrate_model_quant(params, spec=spec, box=6.0, heads=False)
    t0 = time.time()
    rgb8t = render_rays_fused(
        params, rays, RenderSettings(), spec=spec, ray_tile=256,
        interpret=on_cpu, quant=quant_trunk,
    )
    img_int8t = (
        (255.0 * np.clip(np.asarray(rgb8t), 0, 1)).astype(np.uint8)
        .reshape(H, W, 3)
    )
    compare("int8-trunk-fused" + ("-interpret" if on_cpu else ""), img_int8t,
            time.time() - t0)

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        f.write(
            "# Product-resolution reference parity (320x240)\n\n"
            f"Reference: `nerf.inference.NeRFReplicaInferenceHandler."
            f"render_coordinates` at the shipped {args.office} config "
            f"(320x240, 64+128 samples), torch-CPU, {t_ref:.1f} s/frame.\n"
            f"Weights: {weights_kind}, exported through our converter and "
            f"loaded by the reference's own `transform_state_dict` path.\n"
            f"Pose: INIT(x=1,y=-0.5,z=0.5,pitch=-90), VIEW(yaw=-30).\n"
            f"Backend for our paths: "
            f"{jax.devices()[0].platform}.\n\n"
            "| mode | SSIM | mean abs diff (uint8) | p99 | max | seconds |\n"
            "|---|---|---|---|---|---|\n"
        )
        for name, s, mean_d, p99, mx, secs in rows:
            f.write(
                f"| {name} | {s:.5f} | {mean_d:.4f} | {p99:.1f} | {mx} "
                f"| {secs:.1f} |\n"
            )
        f.write(
            "\nGate (BASELINE.md north star): SSIM >= 0.99 for every mode.\n\n"
            "Workspace coverage: the four reference office configs are "
            "value-identical (md5-equal modulo a trailing newline; "
            "`nerf/configs/office_*_config.yaml`), so one office's "
            "product-resolution render parity covers all four — the only "
            "per-office behavior is the workspace COORD->pose calibration, "
            "which `tests/test_app.py` checks against the reference's own "
            "workspace classes for every office.\n\n"
        )
        passed = [(n, s) for n, s, *_ in rows if s >= 0.99]
        failed = [(n, s) for n, s, *_ in rows if s < 0.99]
        f.write(
            "Outcome: "
            + ", ".join(f"{n} PASSES ({s:.5f})" for n, s in passed)
            + (
                "; " + ", ".join(
                    f"{n} MISSES by {0.99 - s:.3f} ({s:.5f})"
                    for n, s in failed
                ) + " — it remains an opt-in speed mode (ROADMAP.md)"
                if failed
                else ""
            )
            + ".\n"
        )
    worst = min(s for _, s, *_ in rows)
    print(f"worst SSIM {worst:.5f}; report -> {args.out}")
    if worst < 0.99:
        print("PRODUCT-PARITY GATE FAILED")
        sys.exit(1)
    print("PRODUCT-PARITY OK")


if __name__ == "__main__":
    main()
