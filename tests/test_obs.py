"""Tests for observability: TB writer, timers, results export."""

import os

import numpy as np

from nerf_workspaces_explorer_tpu.obs import StepTimer, TensorboardWriter
from nerf_workspaces_explorer_tpu.obs.export import (
    PUBLISHED_CHARTS,
    export_training_curves,
)
from nerf_workspaces_explorer_tpu.obs.tb import _NullSummaryWriter


def test_step_timer_phases():
    timer = StepTimer()
    with timer.phase("a"):
        pass
    with timer.phase("a"):
        pass
    with timer.phase("b"):
        pass
    assert timer.counts["a"] == 2
    assert timer.mean("a") >= 0.0
    assert set(timer.summary()) == {"a", "b"}
    timer.reset()
    assert not timer.totals


def test_tensorboard_writer_roundtrip(tmp_path):
    writer = TensorboardWriter(str(tmp_path), {"a": 1}, log_interval=100)
    writer.write_scalars(0, [1.0, 2.0], ["x", "y"])
    writer.write_scalars(10, [3.0], ["x"])
    writer.write_histogram(0, np.ones(8), "h")
    writer.write_image("img", np.zeros((1, 4, 4, 3)), 0)
    writer.flush()
    assert os.path.isdir(str(tmp_path / "tensorboard_logs"))


def test_null_writer_records_scalars():
    writer = _NullSummaryWriter("/tmp/none")
    writer.add_scalar("Train/Loss/total_loss", 0.5, 0)
    writer.add_scalar("Train/Loss/total_loss", 0.25, 100)
    assert writer.scalars["Train/Loss/total_loss"] == [(0, 0.5), (100, 0.25)]


def test_export_training_curves(tmp_path):
    scalars = {
        tag: [(0, 1.0), (500, 0.5), (1000, 0.25)] for tag in PUBLISHED_CHARTS.values()
    }
    written = export_training_curves(scalars, str(tmp_path / "results"))
    assert len(written) == 9  # the reference's nine published charts
    names = {os.path.basename(p) for p in written}
    assert "Test_Metric_batch_PSNR.svg" in names
    content = open(written[0]).read()
    assert content.startswith("<svg") and "polyline" in content


def test_export_skips_missing_tags(tmp_path):
    written = export_training_curves(
        {"Train/Loss/total_loss": [(0, 1.0)]}, str(tmp_path)
    )
    assert len(written) == 1


def test_trace_context_writes_trace(tmp_path):
    import jax.numpy as jnp

    from nerf_workspaces_explorer_tpu.obs import trace_context

    with trace_context(str(tmp_path / "trace")):
        float(jnp.ones(8).sum())
    # jax writes plugins/profile/<ts>/*; just check something appeared.
    assert any((tmp_path / "trace").rglob("*")), "no trace files written"


def test_trace_context_noop_without_dir():
    from nerf_workspaces_explorer_tpu.obs import trace_context

    with trace_context(None):
        pass


def test_renderer_nan_debug_scan(capsys):
    """The reference scans every rendered output for NaN/Inf and prints
    (…inference_handler.py:273-276); our renderer wires the same scan behind
    the nan_debug flag (VERDICT r1 missing #4)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from nerf_workspaces_explorer_tpu.core import COORD
    from nerf_workspaces_explorer_tpu.core.config import load_config
    from nerf_workspaces_explorer_tpu.infer import NeRFRenderer
    from nerf_workspaces_explorer_tpu.models import init_nerf_params

    cfg = load_config(office_name="tokyo")
    cfg = dataclasses.replace(
        cfg,
        experiment=dataclasses.replace(
            cfg.experiment, image_height=4, image_width=4
        ),
        rendering=dataclasses.replace(
            cfg.rendering, n_samples=4, n_importance=4
        ),
    )

    def make_renderer(nan_debug):
        r = NeRFRenderer(
            "tokyo", config=cfg, precision="parity", use_pallas=False,
            nan_debug=nan_debug,
        )
        r.initialize_models(allow_random_init=True)
        # Poison the rgb head so the rendered frame contains NaN.
        r.params["fine"]["rgb"]["w"] = (
            r.params["fine"]["rgb"]["w"] * jnp.nan
        )
        return r

    init, view = COORD(x=1.0, y=-0.5, z=0.5, pitch=-90.0), COORD()
    make_renderer(nan_debug=True).render_coordinates(init, view)
    assert "[Numerical Error] rgb_fine contains NaN or inf." in capsys.readouterr().out

    make_renderer(nan_debug=False).render_coordinates(init, view)
    assert "[Numerical Error]" not in capsys.readouterr().out
