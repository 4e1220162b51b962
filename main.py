"""Workspaces Explorer application entry point.

Parity target: reference main.py:1-11 (QApplication + LandingPage). Backend
selection: PyQt5 when installed (pixel-parity with the reference), tkinter
otherwise. `--backend` forces one.
"""

from __future__ import annotations

import argparse


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--backend", choices=("auto", "qt", "tk"), default="auto",
        help="GUI toolkit (auto: PyQt5 if installed, else tkinter)",
    )
    parser.add_argument(
        "--precision", choices=("parity", "fast", "int8", "int8-trunk"),
        default="fast",
        help="render precision: parity (fp32, reference-identical), fast "
        "(bf16 MXU; 320x240 reference-parity SSIM 0.995), int8-trunk "
        "(int8 trunk matmuls, bf16 heads; SSIM 0.992), int8 (full-int8 "
        "fused kernels — fastest; SSIM 0.992, passing the >=0.99 gate "
        "since the polynomial sin/cos encode: "
        "reports/reference_parity_320x240.md). int8* modes are TPU only",
    )
    parser.add_argument(
        "--preset", choices=("reference", "fast", "turbo"), default="reference",
        help="fine-pass sample placement: reference (merged 64+128 samples, "
        "identical to the reference renderer), fast (importance-only "
        "fine pass — ~2x fewer fine MLP evals, quality-gated by "
        "scripts/validate_quality.py --fast-preset), or turbo (distilled "
        "narrow student from the checkpoint's .turbo.npz sidecar — "
        "python -m nerf_workspaces_explorer_tpu.cli.distill)",
    )
    parser.add_argument(
        "--random-init", action="store_true",
        help="run with random weights when no checkpoints exist (demo mode)",
    )
    args = parser.parse_args()

    from nerf_workspaces_explorer_tpu.app.workspace import make_workspaces

    workspaces = make_workspaces(precision=args.precision, preset=args.preset)
    if args.random_init:
        for workspace in workspaces:
            original = workspace.initialize_models
            workspace.initialize_models = (  # type: ignore[method-assign]
                lambda o=original: o(allow_random_init=True)
            )

    backend = args.backend
    if backend == "auto":
        try:
            import PyQt5  # noqa: F401

            backend = "qt"
        except ImportError:
            backend = "tk"

    if backend == "qt":
        from nerf_workspaces_explorer_tpu.app import gui_qt

        gui_qt.run(workspaces)
    else:
        from nerf_workspaces_explorer_tpu.app import gui_tk

        gui_tk.run(workspaces)


if __name__ == "__main__":
    main()
